package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import graft.engine.LruCache
import org.scalatest.funsuite.AnyFunSuite

/** Unit gates for the executor-local sidecar machinery (probe caches,
  * bloom/key-run state) that the crawl hot path leans on.
  */
class EngineSidecarSpec extends AnyFunSuite {

  test("LruCache: hot entries survive overflow, size stays bounded") {
    val cache = new LruCache[Int, Int](100)
    (0 until 100).foreach(k => cache.get(k)(identity))
    // keep 0..9 hot while inserting 200 colder keys
    (100 until 300).foreach { k =>
      (0 until 10).foreach(h => cache.get(h)(identity))
      cache.get(k)(identity)
    }
    assert(cache.size <= 100, s"cache grew past capacity: ${cache.size}")
    (0 until 10).foreach { h =>
      assert(cache.peek(h).contains(h), s"hot key $h was evicted")
    }
    // the freshest cold keys should also still be resident
    assert(cache.peek(299).contains(299))
  }

  test("LruCache: concurrent misses on one key load once; eviction under " +
    "concurrency never deadlocks or unbounds the map") {
    val loads = new AtomicInteger(0)
    val cache = new LruCache[Int, Int](64)
    val pool = Executors.newFixedThreadPool(16)
    val start = new CountDownLatch(1)
    // phase 1: 16 threads race one cold key — computeIfAbsent must load once
    val racers = (0 until 16).map { _ =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          cache.get(7) { k => loads.incrementAndGet(); k * 2 }: Unit
        }
      })
    }
    start.countDown()
    racers.foreach(_.get(30, TimeUnit.SECONDS))
    assert(loads.get() == 1, s"racing threads loaded ${loads.get()} times")
    assert(cache.peek(7).contains(14))
    // phase 2: hammer 16 threads over a 10x-capacity key space
    val jobs = (0 until 16).map { t =>
      pool.submit(new Runnable {
        def run(): Unit =
          (0 until 2000).foreach(i => cache.get((t * 31 + i) % 640)(identity): Unit)
      })
    }
    jobs.foreach(_.get(60, TimeUnit.SECONDS))
    pool.shutdown()
    assert(cache.size <= 64, s"cache unbounded under concurrency: ${cache.size}")
  }
}
