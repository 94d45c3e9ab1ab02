package graft.core

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.util.SplittableRandom
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Deterministic synthetic web corpus: a link graph of image+caption pages.
  *
  * Stands in for the reference's two live APIs (PubMed/CT.gov search + fetch,
  * medcrawler/pubmed.py:99-129, medcrawler/clinical_trials.py:48-82) — no
  * network exists in this sandbox, so every per-URL observable (image bytes,
  * caption, outlinks, transient-failure schedule) is a pure function of
  * (corpus seed, xxhash64(canonical URL)). The Spark engine's executor-side
  * fetcher and the single-threaded [[RefOracle]] call the same functions,
  * which makes "exact crawl-order + URL-seen + payload match" testable.
  *
  * Images are smooth integer gradients (not noise) so that lossy JPEG
  * round-trips stay above the PSNR ≥ 40 dB invariant from
  * /root/repo/BASELINE.json input_hint.
  *
  * @param seed         corpus master seed
  * @param numHosts     number of distinct hosts (aggregate throughput scales
  *                     with this — reference throughput is politeness-bound
  *                     per host, medcrawler/config.py:37,75-80)
  * @param pagesPerHost nominal pages per host
  * @param skewHost0    if true, host-0 has 9× the pages (host-skew stressor)
  * @param maxOutlinks  max outlinks per page
  * @param failures     if true, inject deterministic transient/permanent
  *                     fetch failures (exercises retry/backoff,
  *                     medcrawler/base.py:136-154)
  * @param imgBase      minimum image edge length in px
  * @param imgVar       image edge length varies in [imgBase, imgBase+imgVar)
  *                     (benchmarks use larger payloads than tests)
  * @param quotaBoost   multiplies every host's per-round quota (benchmark
  *                     knob: models longer scheduling rounds — quota =
  *                     roundMs/minInterval scales linearly with round length)
  * @param hubFanIn     if true, EVERY page also links to one hub URL (page
  *                     index pagesPerHost of host-0, outside the seed
  *                     enumeration) — an in-degree-skew stressor for the
  *                     OPIC cash aggregation (one child key receives a
  *                     contribution from every fetched page)
  * @param rateLimitEvery 0 = off; k > 0 ⇒ a host responds 429-style
  *                     rate-limited for a whole round when
  *                     mix(seed, hash(host:round)) % k == 0 (429-analog of
  *                     medcrawler RateLimitError + Retry-After,
  *                     /root/reference/medcrawler/base.py:296-301)
  */
case class CorpusSpec(
    seed: Long = 42L,
    numHosts: Int = 20,
    pagesPerHost: Int = 500,
    skewHost0: Boolean = false,
    maxOutlinks: Int = 8,
    failures: Boolean = true,
    imgBase: Int = 16,
    imgVar: Int = 17,
    quotaBoost: Int = 1,
    hubFanIn: Boolean = false,
    rateLimitEvery: Int = 0) {

  def hostName(i: Int): String = s"host-$i.example.org"

  def pagesOf(hostIdx: Int): Int =
    if (skewHost0 && hostIdx == 0) pagesPerHost * 9 else pagesPerHost

  def pageUrl(hostIdx: Int, page: Int): String =
    s"http://${hostName(hostIdx)}/page/$page"

  /** Per-host politeness + robots dimension. Interval/quota values mirror the
    * reference budgets: 340 ms ≈ unkeyed PubMed (quota cap 3/batch,
    * medcrawler/pubmed.py:299), 100 ms ≈ keyed/CT.gov (cap 5/batch,
    * medcrawler/clinical_trials.py:242).
    */
  def hostPolicies: Seq[HostPolicy] = (0 until numHosts).map { i =>
    val rng = new SplittableRandom(SynthCorpus.mix(seed, Canon.xxhash64("policy:" + hostName(i))))
    val fast = rng.nextInt(2) == 0
    val (interval, cap) = if (fast) (100, 5) else (340, 3)
    // token-bucket quota per nominal 1000 ms round: floor(round/interval),
    // capped by the reference's hard batch cap (3 or 5)
    val quota = math.min(1000 / interval, cap) * quotaBoost
    HostPolicy(hostName(i), interval, quota, Seq("/private"))
  }

  /** Default seed list: one seed per ~5 hosts, equal initial OPIC cash. */
  def defaultSeeds(n: Int = 4): Seq[Seed] = {
    val k = math.min(n, numHosts)
    (0 until k).map { i =>
      Seed(s"seed-$i", pageUrl(i * (numHosts / k), 0), 1.0 / k)
    }
  }

  /** Every URL of the corpus as a seed — builds a full-width frontier for
    * single-round scheduling-throughput benchmarks (the north metric is
    * URLs scheduled+fetched/sec over an N-entry frontier).
    */
  def allSeeds: Seq[Seed] = {
    val total = (0 until numHosts).map(pagesOf).sum.toDouble
    (0 until numHosts).flatMap { h =>
      (0 until pagesOf(h)).map(p => Seed(s"seed-$h-$p", pageUrl(h, p), 1.0 / total))
    }
  }
}

object SynthCorpus {

  // ImageIO defaults to disk-backed stream caches (a temp FILE per encode/
  // decode) — pure overhead + contention with 32 executor threads hammering
  // the codec. In-memory caching is strictly better at our image sizes.
  ImageIO.setUseCache(false)

  /** splitmix64 finalizer-style mix of two longs — stable across JVMs. */
  def mix(a: Long, b: Long): Long = {
    var z = a ^ (b + 0x9e3779b97f4a7c15L)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val words = Vector(
    "axon", "basil", "cairn", "delta", "ember", "fjord", "glyph", "helix",
    "iris", "joule", "krill", "lumen", "mesa", "nadir", "onyx", "prism",
    "quark", "rune", "sable", "tarn", "umbra", "vale", "wisp", "xenon",
    "yarrow", "zephyr")

  /** failAttempts values at or above this mark a URL as PERMANENTLY failing
    * (404-analog): the fetcher reports kind "permanent" and the crawler drops
    * it immediately without burning retries (ref: non-retryable APIError vs
    * retryable RateLimitError, /root/reference/medcrawler/exceptions.py:36-66).
    */
  val PermanentFail = 99

  /** Number of initially-failing fetch attempts for a URL (0 = succeeds
    * immediately; ≥ PermanentFail = permanently failing). Deterministic.
    */
  def failAttempts(spec: CorpusSpec, canonUrl: String): Int = {
    if (!spec.failures) return 0
    val rng = new SplittableRandom(mix(spec.seed, mix(0xfa11L, Canon.xxhash64(canonUrl))))
    val d = rng.nextInt(100)
    if (d < 85) 0 else if (d < 93) 1 else if (d < 98) 2 else PermanentFail
  }

  /** 429-analog: number of rounds the WHOLE host must be deferred when it is
    * rate-limited in `round` (0 = not limited). Deterministic per
    * (host, round); every fetch against a limited host fails that round with
    * kind "ratelimited" and does NOT consume a retry attempt — the ref honors
    * Retry-After instead of retry-burning (medcrawler/base.py:296-301).
    */
  def rateLimitDefer(spec: CorpusSpec, host: String, round: Int): Int = {
    if (spec.rateLimitEvery <= 0) return 0
    val h = mix(spec.seed, mix(0x429L, Canon.xxhash64(s"$host:$round")))
    if (math.floorMod(h, spec.rateLimitEvery.toLong) == 0L)
      1 + math.floorMod(h >>> 8, 2L).toInt
    else 0
  }

  /** Outlinks of a page, including deliberately messy duplicate variants
    * (unsorted query params, uppercase host, fragments) that must collapse
    * under canonicalization, and robots-disallowed /private links.
    */
  def outlinks(spec: CorpusSpec, canonUrl: String): Seq[String] = {
    val host = Canon.hostOf(canonUrl)
    val hostIdx = hostIndex(spec, host)
    if (hostIdx < 0) return Seq.empty
    val rng = new SplittableRandom(mix(spec.seed, mix(0x11c8L, Canon.xxhash64(canonUrl))))
    val n = 2 + rng.nextInt(math.max(1, spec.maxOutlinks - 1))
    val base = (0 until n).map { _ =>
      val d = rng.nextInt(100)
      if (d < 65) { // same-host clean link
        spec.pageUrl(hostIdx, rng.nextInt(spec.pagesOf(hostIdx)))
      } else if (d < 85) { // cross-host clean link
        val h = rng.nextInt(spec.numHosts)
        spec.pageUrl(h, rng.nextInt(spec.pagesOf(h)))
      } else if (d < 90) { // robots-disallowed
        s"http://${spec.hostName(hostIdx)}/private/${rng.nextInt(100)}"
      } else { // messy duplicate variant of a clean link
        val h = rng.nextInt(spec.numHosts)
        val p = rng.nextInt(spec.pagesOf(h))
        rng.nextInt(3) match {
          case 0 => s"HTTP://${spec.hostName(h).toUpperCase}/page/$p#frag${rng.nextInt(10)}"
          case 1 => s"http://${spec.hostName(h)}:80/page/$p?b=${rng.nextInt(5)}&a=1"
          case _ => s"http://${spec.hostName(h)}/./page/../page/$p"
        }
      }
    }
    if (spec.hubFanIn) base :+ spec.pageUrl(0, spec.pagesPerHost) else base
  }

  private def hostIndex(spec: CorpusSpec, host: String): Int = {
    if (!host.endsWith(".example.org") || !host.startsWith("host-")) return -1
    val mid = host.stripPrefix("host-").stripSuffix(".example.org")
    try {
      val i = mid.toInt
      if (i >= 0 && i < spec.numHosts) i else -1
    } catch { case _: NumberFormatException => -1 }
  }

  /** Deterministic publication date of a page in [1995-01-01, 1998-01-01)
    * — the corpus analog of PubMed publication dates, which drive the
    * reference's `--recent` now−90d window (medcrawler/demo.py:183-192).
    */
  def pubDate(spec: CorpusSpec, canonUrl: String): java.sql.Date = {
    val rng = new SplittableRandom(mix(spec.seed, mix(0xda7eL, Canon.xxhash64(canonUrl))))
    java.sql.Date.valueOf(java.time.LocalDate.of(1995, 1, 1).plusDays(rng.nextInt(1096).toLong))
  }

  def caption(spec: CorpusSpec, canonUrl: String): String = {
    val rng = new SplittableRandom(mix(spec.seed, mix(0xcabL, Canon.xxhash64(canonUrl))))
    val n = 4 + rng.nextInt(5)
    val ws = (0 until n).map(_ => words(rng.nextInt(words.length)))
    s"${ws.mkString(" ")} [$canonUrl]"
  }

  /** Deterministic smooth RGB raster for a URL (integer gradients). */
  def raster(spec: CorpusSpec, canonUrl: String): (Int, Int, Array[Int]) = {
    val rng = new SplittableRandom(mix(spec.seed, mix(0x1a6eL, Canon.xxhash64(canonUrl))))
    val w = spec.imgBase + rng.nextInt(spec.imgVar)
    val h = spec.imgBase + rng.nextInt(spec.imgVar)
    // non-wrapping clamped linear gradients: smooth fields survive JPEG
    // (wrap-around sawtooths would crater PSNR below the 40 dB invariant)
    val ar = rng.nextInt(3); val br = rng.nextInt(3); val cr = rng.nextInt(64)
    val ag = rng.nextInt(3); val bg = rng.nextInt(3); val cg = rng.nextInt(64)
    val ab = rng.nextInt(3); val bb = rng.nextInt(3); val cb = rng.nextInt(64)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = math.min(255, ar * x + br * y + cr)
        val g = math.min(255, ag * x + bg * y + cg)
        val b = math.min(255, ab * x + bb * y + cb)
        px(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    (w, h, px)
  }

  def fmtOf(spec: CorpusSpec, canonUrl: String): String = {
    val rng = new SplittableRandom(mix(spec.seed, mix(0xf07L, Canon.xxhash64(canonUrl))))
    if (rng.nextInt(10) < 3) "jpeg" else "png"
  }

  /** Encoded image bytes + dims + fmt for a URL. Renders the SAME pixels as
    * [[raster]] directly into the image's backing buffer (one allocation —
    * executor threads are allocation-rate-bound at high parallelism).
    */
  def imageBytes(spec: CorpusSpec, canonUrl: String): (Array[Byte], Int, Int, String) = {
    val rng = new SplittableRandom(mix(spec.seed, mix(0x1a6eL, Canon.xxhash64(canonUrl))))
    val w = spec.imgBase + rng.nextInt(spec.imgVar)
    val h = spec.imgBase + rng.nextInt(spec.imgVar)
    val ar = rng.nextInt(3); val br = rng.nextInt(3); val cr = rng.nextInt(64)
    val ag = rng.nextInt(3); val bg = rng.nextInt(3); val cg = rng.nextInt(64)
    val ab = rng.nextInt(3); val bb = rng.nextInt(3); val cb = rng.nextInt(64)
    val fmt = fmtOf(spec, canonUrl)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val buf = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = math.min(255, ar * x + br * y + cr)
        val g = math.min(255, ag * x + bg * y + cg)
        val b = math.min(255, ab * x + bb * y + cb)
        buf(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    if (fmt == "jpeg") {
      val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(0.95f)
      val ios = new MemoryCacheImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
    } else {
      ImageIO.write(img, "png", bos)
    }
    (bos.toByteArray, w, h, fmt)
  }

  /** 64-bit average-hash (aHash) over an 8×8 grayscale downsample of the
    * DECODED image — the phash column of the input_hint schema. Computed from
    * the decoded pixels so near-identical images (e.g. png vs jpeg of the
    * same raster) land in the same hamming ball.
    */
  def phash64(bytes: Array[Byte]): Long = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) return 0L
    phashOf(img)
  }

  def phashOf(img: BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val cell = new Array[Long](64)
    val cnt = new Array[Long](64)
    var y = 0
    while (y < h) {
      val gy = math.min(7, y * 8 / h)
      var x = 0
      while (x < w) {
        val gx = math.min(7, x * 8 / w)
        val rgb = img.getRGB(x, y)
        val gray = ((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L
        cell(gy * 8 + gx) += gray
        cnt(gy * 8 + gx) += 1
        x += 1
      }
      y += 1
    }
    val means = (0 until 64).map(i => if (cnt(i) == 0) 0.0 else cell(i).toDouble / cnt(i))
    val avg = means.sum / 64.0
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (means(i) > avg) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Full fetch of one URL at a given attempt. Returns None when the fetch
    * fails at this attempt (transient or permanent — caller decides via
    * [[failAttempts]] and its retry budget).
    */
  def fetch(spec: CorpusSpec, canonUrl: String, attempt: Int): Option[CrawledImage] = {
    if (attempt < failAttempts(spec, canonUrl)) None
    else {
      val (bytes, w, h, fmt) = imageBytes(spec, canonUrl)
      Some(CrawledImage(canonUrl, bytes, w, h, fmt, caption(spec, canonUrl), phash64(bytes)))
    }
  }

  /** PSNR in dB between two same-size decoded images (Double.PositiveInfinity
    * when identical). Test-only invariant helper.
    */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight, "size mismatch")
    var se = 0.0
    var n = 0
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        val pa = a.getRGB(x, y); val pb = b.getRGB(x, y)
        var c = 0
        while (c < 3) {
          val d = ((pa >> (8 * c)) & 0xff) - ((pb >> (8 * c)) & 0xff)
          se += d.toDouble * d
          n += 1
          c += 1
        }
        x += 1
      }
      y += 1
    }
    if (se == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / (se / n))
  }
}
