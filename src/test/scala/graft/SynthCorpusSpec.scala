package graft

import graft.core.{Canon, CorpusSpec, CrawlConfig, RefOracle, SynthCorpus}
import org.scalatest.funsuite.AnyFunSuite
import javax.imageio.ImageIO
import java.io.ByteArrayInputStream

class SynthCorpusSpec extends AnyFunSuite {

  val spec = CorpusSpec(numHosts = 6, pagesPerHost = 40)
  val url = spec.pageUrl(1, 7)

  test("fetch is deterministic: same URL → byte-identical payload") {
    val a = SynthCorpus.fetch(spec, Canon.canonicalize(url), attempt = 99).get
    val b = SynthCorpus.fetch(spec, Canon.canonicalize(url), attempt = 99).get
    assert(java.util.Arrays.equals(a.bytes, b.bytes))
    assert(a.caption == b.caption && a.phash == b.phash)
  }

  test("messy URL variants canonicalize to the same page → same content") {
    val c1 = Canon.canonicalize(s"HTTP://HOST-1.EXAMPLE.ORG/page/7#frag3")
    val c2 = Canon.canonicalize(s"http://host-1.example.org:80/./page/../page/7")
    assert(c1 == Canon.canonicalize(url) && c2 == c1)
  }

  test("decoded image matches the source raster: PSNR ≥ 40 dB (lossy), exact (png)") {
    // Invariant from BASELINE.json input_hint. Scan enough pages to cover
    // both formats.
    var sawJpeg = false; var sawPng = false
    (0 until 30).foreach { p =>
      val canon = Canon.canonicalize(spec.pageUrl(2, p))
      val (bytes, w, h, fmt) = SynthCorpus.imageBytes(spec, canon)
      val decoded = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(decoded.getWidth == w && decoded.getHeight == h)
      val (rw, rh, px) = SynthCorpus.raster(spec, canon)
      val ref = new java.awt.image.BufferedImage(rw, rh, java.awt.image.BufferedImage.TYPE_INT_RGB)
      ref.setRGB(0, 0, rw, rh, px, 0, rw)
      val psnr = SynthCorpus.psnr(ref, decoded)
      if (fmt == "jpeg") { sawJpeg = true; assert(psnr >= 40.0, s"jpeg psnr=$psnr at $canon") }
      else { sawPng = true; assert(psnr.isPosInfinity, s"png not lossless at $canon") }
    }
    assert(sawJpeg && sawPng)
  }

  test("outlinks are deterministic and include dedup-able messy variants") {
    val canon = Canon.canonicalize(url)
    val l1 = SynthCorpus.outlinks(spec, canon)
    val l2 = SynthCorpus.outlinks(spec, canon)
    assert(l1 == l2 && l1.nonEmpty)
    // across the corpus, some outlinks differ raw but collapse canonically
    val all = (0 until spec.numHosts).flatMap { h =>
      (0 until 40).flatMap(p => SynthCorpus.outlinks(spec, Canon.canonicalize(spec.pageUrl(h, p))))
    }
    val rawDistinct = all.distinct.size
    val canonDistinct = all.map(Canon.canonicalize).distinct.size
    assert(canonDistinct < rawDistinct, "corpus should contain messy duplicate URLs")
    assert(all.exists(_.contains("/private/")), "corpus should contain robots-blocked links")
  }

  test("oracle crawl is deterministic, budget-bounded, duplicate-free") {
    val cfg = CrawlConfig(maxResults = 120, maxRounds = 30)
    val r1 = RefOracle.crawl(spec, spec.defaultSeeds(3), cfg)
    val r2 = RefOracle.crawl(spec, spec.defaultSeeds(3), cfg)
    assert(r1.order == r2.order)
    assert(r1.order.size <= 120)
    // no URL scheduled twice in the same round; retries allowed across rounds
    val perRound = r1.order.groupBy(_._1).values
    perRound.foreach(o => assert(o.size == o.distinct.size))
    // fetched ⊆ seen, captions carry the canonical url
    r1.fetched.foreach { img =>
      assert(r1.seen.contains(Canon.xxhash64(img.image_id)))
      assert(img.caption.endsWith(s"[${img.image_id}]"))
    }
    // rounds make progress and expansion happened
    assert(r1.order.map(_._1).distinct.size > 3)
    assert(r1.fetched.size > 50)
    // lineage: every fetched URL has a path rooted at its seed
    r1.lineage.values.foreach { case (seedId, _) => assert(seedId.startsWith("seed-")) }
  }

  test("retry/backoff: a transiently failing URL is rescheduled in a later round") {
    val cfg = CrawlConfig(maxResults = 400, maxRounds = 40)
    val r = RefOracle.crawl(spec, spec.defaultSeeds(3), cfg)
    val byUrl = r.order.groupBy(_._2).filter(_._2.size > 1)
    // deterministic corpus has ~13% transient failures → some URL retried
    assert(byUrl.nonEmpty, "expected at least one retried URL")
    byUrl.foreach { case (_, occ) =>
      val rounds = occ.map(_._1)
      assert(rounds == rounds.sorted && rounds.distinct.size == rounds.size)
    }
  }

  test("robots: no /private URL is ever scheduled") {
    val cfg = CrawlConfig(maxResults = 400, maxRounds = 40)
    val r = RefOracle.crawl(spec, spec.defaultSeeds(3), cfg)
    assert(!r.order.exists(_._2.contains("/private/")))
  }
}
