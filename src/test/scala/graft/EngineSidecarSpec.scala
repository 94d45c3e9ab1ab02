package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import graft.core._
import graft.engine.{Bloom, CrawlEngine, Fs, LruCache, NioLocalFileSystem}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Unit gates for the executor-local sidecar machinery (probe caches,
  * bloom/key-run state) that the crawl hot path leans on.
  */
class EngineSidecarSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("engine-sidecar-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.hadoop.fs.file.impl", graft.engine.NioLocalFs.ImplClass)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bloom rebuild at major compaction un-learns TTL-dead keys (judge r3 #3)") {
    // long TTL-churn crawl: stamps die every ttl rounds and many re-stamp;
    // the merged-forward filter chain only accretes, so without the rebuild
    // every dead key would still pass the prefilter forever (fpp -> 1 over
    // a long crawl). After the 16-delta major compaction rebuilds per-bucket
    // filters from LIVE stamps only, keys whose stamps were already dead at
    // compaction must pass at ~fpp — while every live stamp still passes
    // (a false negative would drop URLs: correctness, not just cost).
    val spec = CorpusSpec(numHosts = 4, pagesPerHost = 30, failures = false)
    val cfg = CrawlConfig(maxResults = Long.MaxValue, maxRounds = 20,
      numBuckets = 8, ttlRounds = 3)
    val seeds = spec.defaultSeeds(2)
    val oracle = RefOracle.crawl(spec, seeds, cfg)
    val out = java.nio.file.Files.createTempDirectory("bloom-churn").toString
    val res = CrawlEngine.run(spark, spec, seeds, cfg, out)
    assert(res.schedule(spark).select("round", "canonUrl").collect()
      .map(r => (r.getInt(0), r.getString(1))).toVector == oracle.order)

    val compactDir = res.manifest.seenDirs.head
    assert(compactDir.contains("compact-r"), s"no compaction ran: $compactDir")
    val compactR = compactDir.split("compact-r").last.toInt
    val rFinal = res.manifest.round

    // per-key newest stamp from the queryable seen log (keeps every key)
    import org.apache.spark.sql.functions._
    val stamps = res.seen(spark)
      .groupBy("urlHash", "hostBucket").agg(max("seenRound").as("sr"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val deadAtCompact = stamps.filter(_._3 <= compactR - cfg.ttlRounds)
    val liveNow = stamps.filter(_._3 > rFinal - cfg.ttlRounds)
    assert(deadAtCompact.length >= 20,
      s"churn produced only ${deadAtCompact.length} dead-at-compaction keys — vacuous")
    assert(liveNow.nonEmpty)

    def bloomPass(bucket: Int, h: Long): Boolean = {
      val p = Bloom.bucketPath(res.manifest.bloomDir, bucket)
      !Fs.exists(p) || Bloom.deserialize(Fs.readAllBytes(p)).mightContainLong(h)
    }
    liveNow.foreach { case (h, b, _) =>
      assert(bloomPass(b, h), s"LIVE key $h absent from rebuilt filter")
    }
    val deadPass = deadAtCompact.count { case (h, b, _) => bloomPass(b, h) }
    val rate = deadPass.toDouble / deadAtCompact.length
    info(f"dead-key prefilter pass-rate after rebuild: $rate%.3f " +
      f"(${deadAtCompact.length} dead keys, fpp=${cfg.bloomFpp})")
    assert(rate <= 0.25,
      f"rebuilt filter still passes $rate%.2f of TTL-dead keys (want ~fpp)")
  }

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

  test("file:// binds to NioLocalFileSystem and permission ops use java.nio " +
    "(no chmod fork per create)") {
    import java.nio.file.attribute.PosixFilePermission._
    val dir = java.nio.file.Files.createTempDirectory("niofs").toString
    val p = s"$dir/x.bin"
    Fs.writeAtomic(p, Array[Byte](1, 2, 3))
    assert(Fs.readAllBytes(p).toSeq == Seq[Byte](1, 2, 3))
    // the JVM-wide cached file:// FileSystem must be the no-fork class —
    // if a stock LocalFileSystem won the cache race, every parquet part,
    // .crc, key-run and bloom file would fork a `chmod` (no native-hadoop
    // in this container), which is the r4 kernel-storm regression
    val fs = Fs.fs(p)
    assert(fs.isInstanceOf[NioLocalFileSystem],
      s"file:// resolved to ${fs.getClass.getName}")
    fs.setPermission(new org.apache.hadoop.fs.Path(p),
      new org.apache.hadoop.fs.permission.FsPermission("600"))
    val perms = java.nio.file.Files.getPosixFilePermissions(
      java.nio.file.Paths.get(p))
    assert(perms == java.util.EnumSet.of(OWNER_READ, OWNER_WRITE),
      s"expected rw------- via java.nio, got $perms")
    Fs.delete(dir)
  }
}
