package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.ImageIO

import graft.core.SynthCorpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal operators beyond images: audio (RIFF/WAVE PCM) and video
  * (frame-container) payloads as opaque `binary` columns with typed
  * metadata — the same discipline as [[ImageOps]] (reference analog:
  * medcrawler treats every fetched payload as bytes + typed fields).
  *
  * The container lacks real codec natives (ffmpeg etc.), so the corpus is
  * synthesized — but nothing here is a stub: the WAV bytes are a real RIFF
  * file parsed back by a real chunk-walking parser, and the video frames
  * are real PNGs decoded by the real JDK codec. A production pipeline
  * swaps `parseWav`/`ImageIO` for its codec; every Spark-side decision
  * (schema, batch shape, where bytes live, what shuffles) is exercised here.
  *
  * Scale notes (100 TB design point):
  *  - payload bytes are born, parsed and REDUCED TO SCALARS inside one
  *    narrow stage — no shuffle ever carries a binary column. `explain`
  *    on both queries shows a single WholeStageCodegen over the scan with
  *    zero Exchange operators (the final sort is the oracle's, not the
  *    operator's).
  *  - features are per-row, so the work partitions perfectly: 10^10 audio
  *    rows = 10^10 independent parses, bounded memory per task (one
  *    payload at a time; frame explode inflates a row by ≤ n_frames
  *    before the decode projection collapses it back to 5 scalars).
  *  - the frame sampler reads ONLY the sampled frames' byte ranges from
  *    the container (length-prefix skip), the analog of range-reads on a
  *    real object store: decode cost scales with frames KEPT, not stored.
  */
object MediaOps {

  ImageIO.setUseCache(false)

  // ---------------------------------------------------------------- audio

  /** Deterministic PCM sample stream; MUST stay expressible in ANSI SQL
    * (the DuckDB oracle recomputes it): all operands non-negative, `%` on
    * non-negative longs is identical in Scala and SQL.
    */
  private[graft] def sampleAt(docId: Long, t: Long): Int =
    (((docId * 40503L + t * 12345L + 2531011L) % 65536L) - 32768L).toInt

  private[graft] def nSamplesOf(docId: Long): Int =
    (240 + (docId % 32) * 8).toInt

  val SampleRate = 8000

  /** A REAL canonical 44-byte RIFF/WAVE file: PCM (format 1), mono,
    * 16-bit little-endian.
    */
  private[graft] def synthWav(docId: Long): Array[Byte] = {
    val n = nSamplesOf(docId)
    val dataLen = n * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1.toShort)            // PCM
    bb.putShort(1.toShort)            // mono
    bb.putInt(SampleRate)
    bb.putInt(SampleRate * 2)         // byte rate
    bb.putShort(2.toShort)            // block align
    bb.putShort(16.toShort)           // bits/sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var t = 0
    while (t < n) { bb.putShort(sampleAt(docId, t).toShort); t += 1 }
    bb.array()
  }

  /** Real chunk-walking RIFF parser (not a fixed-offset peek: tolerates
    * extra chunks before `data`, validates magic/format/width). Returns
    * (sampleRate, samples) or null — failures are data, never exceptions.
    */
  private[graft] def parseWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    if (bytes == null || bytes.length < 44) return null
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    bb.get(magic)
    if (new String(magic, "US-ASCII") != "RIFF") return null
    bb.getInt // riff size
    bb.get(magic)
    if (new String(magic, "US-ASCII") != "WAVE") return null
    var rate = -1
    var ok = false
    while (bb.remaining >= 8) {
      bb.get(magic)
      val id = new String(magic, "US-ASCII")
      val len = bb.getInt
      if (len < 0 || len > bb.remaining) return null
      // RIFF pads odd-length chunks with one byte the chunk size does not
      // count — skip len + (len & 1), clamped at EOF (a final odd chunk has
      // no pad to skip)
      def skip(from: Int): Unit =
        bb.position(math.min(from + len + (len & 1), bb.limit()))
      if (id == "fmt ") {
        if (len < 16) return null
        val p = bb.position()
        val fmt = bb.getShort; val ch = bb.getShort
        rate = bb.getInt
        if (fmt != 1 || ch != 1) return null          // PCM mono only
        bb.position(p + 14)                           // skip byteRate/align
        if (bb.getShort != 16) return null            // 16-bit only
        skip(p)
        ok = true
      } else if (id == "data") {
        if (!ok) return null
        val out = new Array[Short](len / 2)
        var i = 0
        while (i < out.length) { out(i) = bb.getShort; i += 1 }
        return (rate, out)
      } else skip(bb.position())                      // skip foreign chunk
    }
    null
  }

  /** binary WAV → (n_samples, sample_rate, peak, zero_crossings, sum_sq,
    * ok). One pass over the samples; all-integer so the DuckDB twin
    * hash-matches bit-for-bit.
    */
  val audioFeats = udf { (bytes: Array[Byte]) =>
    parseWav(bytes) match {
      case null => (0, 0, 0, 0, 0L, false)
      case (rate, s) =>
        var peak = 0; var zc = 0; var sq = 0L
        var i = 0
        while (i < s.length) {
          val v = s(i).toInt
          val a = math.abs(v)
          if (a > peak) peak = a
          if (i >= 1 && ((v >= 0) != (s(i - 1) >= 0))) zc += 1
          sq += v.toLong * v
          i += 1
        }
        (s.length, rate, peak, zc, sq, true)
    }
  }

  private val wavOf = udf { (docId: Long) => synthWav(docId) }

  /** Oracled query: synthesize a real WAV per document, parse it back,
    * reduce to integer features. Zero shuffles — scan → project → sort
    * (sort is the oracle contract, not the operator).
    */
  def audioFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", audioFeats(wavOf($"doc_id")).as("f"))
      .select($"doc_id", $"f._1".as("n_samples"), $"f._2".as("sample_rate"),
        $"f._3".as("peak"), $"f._4".as("zero_crossings"), $"f._5".as("sum_sq"))
      .orderBy($"doc_id")
  }

  /** DuckDB twin: regenerate the PCM stream arithmetically (this version's
    * generate_series can't take lateral column bounds, so generate to the
    * max length and filter).
    */
  val audioFeaturesSql: String =
    """WITH f AS (SELECT doc_id, 240 + (doc_id % 32) * 8 AS n FROM documents),
      |s AS (
      |  SELECT doc_id, n, g.t AS t,
      |         ((doc_id * 40503 + g.t * 12345 + 2531011) % 65536) - 32768 AS v,
      |         CASE WHEN g.t >= 1 THEN
      |           ((doc_id * 40503 + (g.t - 1) * 12345 + 2531011) % 65536) - 32768
      |         END AS pv
      |  FROM f, generate_series(0, 487) AS g(t) WHERE g.t < n)
      |SELECT doc_id,
      |       CAST(max(n) AS INTEGER) AS n_samples,
      |       CAST(8000 AS INTEGER) AS sample_rate,
      |       CAST(max(abs(v)) AS INTEGER) AS peak,
      |       CAST(sum(CASE WHEN t >= 1 AND ((v >= 0) <> (pv >= 0))
      |                THEN 1 ELSE 0 END) AS INTEGER) AS zero_crossings,
      |       CAST(sum(v * v) AS BIGINT) AS sum_sq
      |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- video

  /** Container: magic "GVC1" + frame count + per frame
    * [len:int][phash:long][png bytes]. Length-prefixed so a sampler can
    * SKIP unsampled frames without decoding them (the object-store
    * range-read analog).
    */
  private val VideoMagic = 0x47564331

  private[graft] def frameDims(docId: Long, k: Long): (Int, Int) =
    ((16 + ((docId * 7 + k * 13) % 17)).toInt,
      (16 + ((docId * 11 + k * 5) % 23)).toInt)

  private[graft] def nFramesOf(docId: Long): Int = (4 + docId % 5).toInt

  /** One frame: a deterministic RGB gradient at the oracle-known dims,
    * PNG-encoded (lossless, so the stored phash is exactly recomputable
    * from the decoded pixels).
    */
  private[graft] def synthFrame(docId: Long, k: Int): (Array[Byte], Long) = {
    val (w, h) = frameDims(docId, k)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val buf = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x * 3 + y * 5 + docId * 7 + k * 11) % 256).toInt
        val g = ((x * 5 + y * 3 + docId * 13 + k * 17) % 256).toInt
        val b = ((x * 7 + y * 11 + docId * 3 + k * 19) % 256).toInt
        buf(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    (bos.toByteArray, SynthCorpus.phashOf(img))
  }

  private[graft] def synthVideo(docId: Long): Array[Byte] = {
    val n = nFramesOf(docId)
    val frames = (0 until n).map(k => synthFrame(docId, k))
    val total = 8 + frames.map(12 + _._1.length).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(VideoMagic).putInt(n)
    frames.foreach { case (f, ph) => bb.putInt(f.length).putLong(ph).put(f) }
    bb.array()
  }

  /** Parse + sample every `stride`-th frame. Unsampled frames are skipped
    * by their length prefix — their bytes are never materialized.
    * Returns (n_frames, frames[(idx, storedPhash, bytes)]); null on a
    * corrupt container.
    */
  private[graft] def sampleFrames(
      bytes: Array[Byte], stride: Int): (Int, Seq[(Int, Long, Array[Byte])]) = {
    if (bytes == null || bytes.length < 8) return null
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    if (bb.getInt != VideoMagic) return null
    val n = bb.getInt
    if (n < 0) return null
    val out = Seq.newBuilder[(Int, Long, Array[Byte])]
    var k = 0
    while (k < n) {
      if (bb.remaining < 12) return null
      val len = bb.getInt
      if (len < 0 || len > bb.remaining - 8) return null
      val ph = bb.getLong
      if (k % stride == 0) {
        val f = new Array[Byte](len)
        bb.get(f)
        out += ((k, ph, f))
      } else bb.position(bb.position() + len)
      k += 1
    }
    (n, out.result())
  }

  private val videoOf = udf { (docId: Long) => synthVideo(docId) }

  private val sampledUdf = udf { (bytes: Array[Byte], stride: Int) =>
    sampleFrames(bytes, stride) match {
      case null    => null
      case (n, fs) => fs.map { case (k, ph, f) => (n, k, ph, f) }
    }
  }

  /** Oracled query: build a container per document, sample every 2nd
    * frame, REALLY decode each sampled frame (dims come from the decoded
    * pixels, not the metadata) and recompute its phash. The DuckDB twin
    * knows the expected dims arithmetically — a hash match proves the
    * container walk + JDK decode returned the right pixels for every
    * sampled frame.
    */
  def videoFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Parallelism floor (guide §2.5 "input skew: one huge unsplittable
    // file → repartition immediately after the read"): this operator is
    // GENERATOR/DECODE-bound — milliseconds of codec work per row — so its
    // parallelism must not be capped by the SCAN's split count (a single
    // small parquet file = one task doing every synth+decode while the
    // other cores idle; measured wall ≈ cpu ≈ 2.9 s at sf0.1/32c). The
    // repartition shuffles only the 8-byte doc_id column, bounded by
    // corpus row count, and is skipped when the scan already yields
    // enough splits (any real-scale input).
    val src = ScanOps.parallelismFloor(
      spark.read.parquet(s"$dir/documents.parquet").select($"doc_id"))
    src
      .select($"doc_id", explode(sampledUdf(videoOf($"doc_id"), lit(2))).as("fr"))
      // ONE decode per sampled frame (ImageOps.decodePhash) where the
      // previous plan ran decodeDims AND phashOfBytes side by side — two
      // full PNG decodes per frame for identical outputs
      .select($"doc_id", $"fr._2".as("frame_idx"),
        ImageOps.decodePhash($"fr._4").as("dec"),
        $"fr._1".as("n_frames"), $"fr._3".as("sph"))
      .select($"doc_id", $"frame_idx", $"dec._1".as("w"), $"dec._2".as("h"),
        $"n_frames", $"dec._3".as("decode_ok"),
        ($"dec._4" === $"sph").as("phash_ok"))
      .orderBy($"doc_id", $"frame_idx")
  }

  val videoFramesSql: String =
    """WITH f AS (SELECT doc_id, 4 + doc_id % 5 AS n FROM documents),
      |fr AS (SELECT doc_id, n, g.t AS t
      |       FROM f, generate_series(0, 8) AS g(t) WHERE g.t < n)
      |SELECT doc_id, CAST(t AS INTEGER) AS frame_idx,
      |       CAST(16 + ((doc_id * 7 + t * 13) % 17) AS INTEGER) AS w,
      |       CAST(16 + ((doc_id * 11 + t * 5) % 23) AS INTEGER) AS h,
      |       CAST(n AS INTEGER) AS n_frames,
      |       TRUE AS decode_ok, TRUE AS phash_ok
      |FROM fr WHERE t % 2 = 0 ORDER BY doc_id, frame_idx""".stripMargin
}
