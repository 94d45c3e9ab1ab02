package graft.engine

import java.nio.file.Paths

import graft.core._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Spark-native crawl engine: URL frontier + fetch scheduler.
  *
  * Reimplements the reference crawl core (frontier generator + seen-set +
  * politeness scheduler + retrying fetcher, medcrawler/base.py,
  * medcrawler/pubmed.py, medcrawler/clinical_trials.py) as driver-looped
  * Catalyst rounds over snapshot tables. One round is one declarative
  * pipeline (physical plan target in SURVEY.md §4):
  *
  *   frontier ──bloom prefilter──▶ anti-join seen shards (authoritative)
  *     ──broadcast policy join──▶ robots filter ──window rank per host──▶
  *     per-host quota ──(rare) global budget──▶ schedule
  *     ──salted repartition──▶ mapPartitions synthetic fetch
  *     ──explode outlinks──▶ OPIC cash aggregation ──▶ next frontier
  *
  * Determinism contract (SURVEY.md §7.3, mirrored by [[graft.core.RefOracle]]):
  * schedule order = (round ASC, priority DESC, host ASC, urlHash ASC); all
  * floating-point priority sums are folded in pinned (parentHash ASC) order,
  * so results are independent of partitioning/parallelism — which is what
  * makes the N-vs-4N-core scaling equivalence testable.
  *
  * Scale notes (100 TB / 10^10-frontier design):
  *  - scheduling rounds never touch image `bytes` (they live only in the
  *    fetched table; Parquet column pruning keeps scans narrow);
  *  - the seen table is append-only deltas partitioned by hostBucket — the
  *    round-start anti-join is bucket-co-partitioned and Bloom-prefiltered,
  *    so only probable duplicates shuffle;
  *  - the global-budget sort runs ONLY when the remaining budget is smaller
  *    than the round (last round) — steady-state rounds have no global
  *    ordering bottleneck;
  *  - fetch tasks are salted-range-repartitioned on (host, salt) so one
  *    mega-host cannot serialize a partition (AQE skew join also on).
  */
object CrawlEngine {

  /** Narrow row shipped to the fetcher — no payload columns. */
  case class FetchTask(
      canonUrl: String,
      urlHash: Long,
      host: String,
      hostBucket: Int,
      depth: Int,
      priority: Double,
      seedId: String,
      path: Seq[String],
      attempt: Int)

  case class CrawlResult(
      outDir: String,
      rounds: Int,
      totalScheduled: Long,
      manifest: Snapshot.Manifest) {

    /** Schedule in the pinned crawl order. */
    def schedule(spark: SparkSession): DataFrame =
      if (manifest.scheduleDirs.isEmpty) emptySchedule(spark)
      else
        spark.read.parquet(manifest.scheduleDirs: _*)
          .orderBy(col("round").asc, col("priority").desc, col("host").asc,
            col("urlHash").asc)

    def fetched(spark: SparkSession): DataFrame =
      if (manifest.fetchedDirs.isEmpty)
        spark.emptyDataFrame
      else spark.read.parquet(manifest.fetchedDirs: _*)

    def seen(spark: SparkSession): DataFrame =
      if (manifest.seenDirs.isEmpty) spark.emptyDataFrame
      else CrawlEngine.readSeen(spark, manifest.seenDirs)

    def metrics(spark: SparkSession): DataFrame =
      if (manifest.metricsDirs.isEmpty) spark.emptyDataFrame
      else spark.read.parquet(manifest.metricsDirs: _*)

    private def emptySchedule(spark: SparkSession): DataFrame =
      spark.emptyDataFrame
  }

  /** Union of seen delta dirs. Each delta is hostBucket-partitioned; its own
    * basePath keeps the partition column while avoiding conflicting-root
    * partition inference. (At 10^10 scale, deltas would be periodically
    * compacted per bucket; the manifest already supports swapping dirs.)
    */
  private[engine] def readSeen(spark: SparkSession, dirs: Seq[String]): DataFrame =
    dirs.map(d => spark.read.option("basePath", d).parquet(d))
      .reduce(_ unionByName _)

  // ---- UDFs pinned to graft.core.Canon (same code as the oracle) ----
  private val canonUdf = udf((s: String) => Canon.canonicalize(s))
  private val hostUdf = udf((s: String) => Canon.hostOf(s))
  private val pathUdf = udf((s: String) => Canon.pathOf(s))

  /** Start a fresh crawl: initialize the snapshot log from the seed list and
    * loop rounds until budget/frontier/round exhaustion.
    */
  def run(
      spark: SparkSession,
      spec: CorpusSpec,
      seeds: Seq[Seed],
      cfg: CrawlConfig,
      outDir: String): CrawlResult = {
    import spark.implicits._

    // a fresh run must not mix with a prior snapshot chain: stale manifests
    // would poison expiry/resume (commit ids restart at v0)
    require(Snapshot.latest(outDir).isEmpty,
      s"$outDir already contains a committed crawl snapshot; " +
        "resume it or use a fresh directory")

    // seed frontier with dedup (max priority, tie → min seedId per URL)
    val seedDf = spark.createDataset(seeds)
      .withColumn("canonUrl", canonUdf($"url"))
      .withColumn("urlHash", xxhash64($"canonUrl"))
      .withColumn("host", hostUdf($"canonUrl"))
      .withColumn("hostBucket", pmod(xxhash64($"host"), lit(cfg.numBuckets)).cast("int"))
    val w = Window.partitionBy($"urlHash")
      .orderBy($"priority".desc, $"seedId".asc)
    val frontier0 = seedDf
      .withColumn("rk", row_number().over(w)).where($"rk" === 1)
      .select($"url", $"canonUrl", $"urlHash", $"host", $"hostBucket",
        lit(0).as("depth"), $"priority", $"seedId",
        typedLit(Seq.empty[String]).as("path"), lit(0).as("attempt"),
        lit(0).as("notBeforeRound"))
      .as[FrontierEntry]

    val fDir = s"$outDir/frontier/r0"
    frontier0.write.mode("overwrite").parquet(fDir)
    val fCount = spark.read.parquet(fDir).count()
    val bloomFile = s"$outDir/bloom/r0.bin"
    Bloom.save(Paths.get(bloomFile), Map.empty)
    val m0 = Snapshot.Manifest(0, -1, -1, 0L, fDir, Vector.empty, Vector.empty,
      Vector.empty, Vector.empty, bloomFile, fCount, 0L, 0L, done = fCount == 0)
    Snapshot.commit(outDir, m0)
    loop(spark, spec, cfg, outDir, m0)
  }

  /** Exact resume from the latest committed snapshot. */
  def resume(
      spark: SparkSession,
      spec: CorpusSpec,
      cfg: CrawlConfig,
      outDir: String): CrawlResult = {
    val m = Snapshot.latest(outDir).getOrElse(
      sys.error(s"no committed snapshot under $outDir"))
    loop(spark, spec, cfg, outDir, m)
  }

  private def loop(
      spark: SparkSession,
      spec: CorpusSpec,
      cfg: CrawlConfig,
      outDir: String,
      start: Snapshot.Manifest): CrawlResult = {
    var m = start
    while (!m.done && m.round + 1 < cfg.maxRounds) {
      m = round(spark, spec, cfg, outDir, m)
      Snapshot.commit(outDir, m)
      Snapshot.expire(outDir, retain = 3)
    }
    CrawlResult(outDir, m.round + 1, m.totalScheduled, m)
  }

  /** One scheduling round: the Catalyst pipeline described in the class doc.
    * Reads only committed state from `m`, writes the next snapshot's files,
    * and returns the manifest for the driver to commit.
    */
  def round(
      spark: SparkSession,
      spec: CorpusSpec,
      cfg: CrawlConfig,
      outDir: String,
      m: Snapshot.Manifest): Snapshot.Manifest = {
    import spark.implicits._
    val r = m.round + 1

    val frontier = spark.read.parquet(m.frontierDir).as[FrontierEntry]
    val eligible = frontier.where($"notBeforeRound" <= r).toDF()
    val timeDeferred = frontier.where($"notBeforeRound" > r)

    // ---- seen exclusion: Bloom prefilter + authoritative anti-join ----
    // (P5 analog: `if pmid not in old_item_ids`, medcrawler/pubmed.py:185-187)
    val blooms = Bloom.load(Paths.get(m.bloomFile))
    val unseen: DataFrame =
      if (m.seenDirs.isEmpty) eligible
      else {
        val mc = Bloom.mightContainCol(spark, blooms)($"hostBucket", $"urlHash")
        val tagged = eligible.withColumn("maybeSeen", mc)
        val clean = tagged.where(!$"maybeSeen").drop("maybeSeen")
        val seenDf = readSeen(spark, m.seenDirs)
        val checked = tagged.where($"maybeSeen").drop("maybeSeen")
          .join(seenDf, Seq("urlHash", "hostBucket"), "left_anti")
        clean.unionByName(checked)
      }

    // ---- robots + politeness dimension (J2: broadcast hash join) ----
    val policyDf = spark.createDataset(spec.hostPolicies).toDF()
    val joined = unseen
      .join(broadcast(policyDf), Seq("host"), "left")
      .withColumn("minIntervalMs", coalesce($"minIntervalMs", lit(340)))
      .withColumn("quotaPerRound", coalesce($"quotaPerRound", lit(3)))
      .withColumn("robotsDisallow",
        coalesce($"robotsDisallow", array(lit("/private"))))
      .withColumn("urlPath", pathUdf($"canonUrl"))
      .withColumn("blocked",
        exists($"robotsDisallow", p => $"urlPath".startsWith(p)))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val blockedDf = joined.where($"blocked")

    // ---- per-host fetch quota (§2.5 window rank; ref batch caps 3/5) ----
    val wq = Window.partitionBy($"host")
      .orderBy($"priority".desc, $"urlHash".asc)
    val ranked = joined.where(!$"blocked")
      .withColumn("rk", row_number().over(wq))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val quotaKept = ranked.where($"rk" <= $"quotaPerRound")
    val quotaRejected = ranked.where($"rk" > $"quotaPerRound")

    // ---- global budget (L1) — global sort ONLY on the final short round --
    val remaining = math.max(0L, cfg.maxResults - m.totalScheduled)
    val keptCount = quotaKept.count()
    val (sched, budgetRejected) =
      if (keptCount <= remaining) (quotaKept, spark.emptyDataFrame)
      else {
        val s = quotaKept
          .orderBy($"priority".desc, $"host".asc, $"urlHash".asc)
          .limit(remaining.toInt)
          .persist(StorageLevel.MEMORY_AND_DISK)
        (s.toDF(), quotaKept.join(s.select("urlHash"), Seq("urlHash"), "left_anti"))
      }
    val schedCount = math.min(keptCount, remaining)

    // persist the schedule delta (crawl-order evidence; order = sort keys)
    val scheduleDir = s"$outDir/schedule/r$r"
    sched.select($"urlHash", $"canonUrl", $"host", $"hostBucket", $"priority",
      $"depth", $"attempt", lit(r).as("round"))
      .write.mode("overwrite").parquet(scheduleDir)

    // ---- fetch (S1): salted range partition kills host skew, then
    // executor-side synthetic fetch in mapPartitions ----
    val results = sched
      .select($"canonUrl", $"urlHash", $"host", $"hostBucket", $"depth",
        $"priority", $"seedId", $"path", $"attempt")
      .as[FetchTask]
      .repartitionByRange($"host", pmod($"urlHash", lit(16)))
      .mapPartitions { it => it.map(t => Fetcher.fetchOne(spec, t, r)) }
      .persist(StorageLevel.MEMORY_AND_DISK)

    val okRes = results.where($"ok")
    val failRes = results.where(!$"ok")

    // fetched table (input_hint schema + lineage)
    val fetchedDir = s"$outDir/fetched/r$r"
    okRes.select($"canonUrl".as("image_id"), $"bytes", $"w", $"h", $"fmt",
      $"caption", $"phash", $"seedId".as("seed_id"), $"path",
      $"depth", $"priority", $"round")
      .write.mode("overwrite").parquet(fetchedDir)

    // ---- seen delta: fetched ok ∪ retry-exhausted ∪ robots-blocked ----
    val exhausted = failRes.where($"attempt" + 1 >= cfg.maxRetries)
    val seenDelta = okRes.select($"urlHash", $"hostBucket")
      .unionByName(exhausted.select($"urlHash", $"hostBucket"))
      .unionByName(blockedDf.select($"urlHash", $"hostBucket"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seenDir = s"$outDir/seen/r$r"
    seenDelta.write.mode("overwrite").partitionBy("hostBucket").parquet(seenDir)

    // retry re-enqueue with exponential backoff (ref wait_chain,
    // medcrawler/base.py:136-154)
    val retries = failRes.where($"attempt" + 1 < cfg.maxRetries)
      .select($"canonUrl".as("url"), $"canonUrl", $"urlHash", $"host",
        $"hostBucket", $"depth", $"priority", $"seedId", $"path",
        ($"attempt" + 1).as("attempt"),
        (lit(r) + least(pow(lit(2.0), ($"attempt" + 1).cast("double")), lit(8.0)))
          .cast("int").as("notBeforeRound"))

    // ---- OPIC outlink expansion (UDTF analog: explode; A4 seen growth) ----
    val links = okRes
      .select($"urlHash".as("parentHash"), $"priority".as("pPriority"),
        $"depth".as("pDepth"), $"path".as("pPath"), $"seedId".as("pSeed"),
        $"canonUrl".as("parentCanon"), size($"outlinks").as("nRaw"),
        explode($"outlinks").as("rawLink"))
      .withColumn("cash", $"pPriority" * lit(cfg.gamma) / $"nRaw")
      .withColumn("childCanon", canonUdf($"rawLink"))
      .withColumn("childHash", xxhash64($"childCanon"))

    val perPair = links.groupBy($"childHash", $"parentHash").agg(
      first($"childCanon").as("childCanon"),
      (first($"cash") * count(lit(1))).as("subtotal"),
      first($"pDepth").as("pDepth"),
      first($"pPath").as("pPath"),
      first($"pSeed").as("pSeed"),
      first($"parentCanon").as("parentCanon"))

    // priority = fold of per-parent subtotals in parentHash ASC order —
    // pinned FP summation order, independent of partitioning
    val perChild = perPair.groupBy($"childHash").agg(
      aggregate(
        sort_array(collect_list(struct($"parentHash".as("ph"), $"subtotal".as("sub")))),
        lit(0.0),
        (acc, x) => acc + x.getField("sub")).as("priority"),
      min(struct(negate($"subtotal").as("negSub"), $"parentHash".as("ph"),
        $"pDepth".as("pDepth"), $"pSeed".as("pSeed"), $"pPath".as("pPath"),
        $"parentCanon".as("parentCanon"))).as("rep"),
      min($"childCanon").as("canonUrl"))

    val newEntries = perChild
      .withColumn("host", hostUdf($"canonUrl"))
      .select(
        $"canonUrl".as("url"), $"canonUrl", $"childHash".as("urlHash"),
        $"host",
        pmod(xxhash64($"host"), lit(cfg.numBuckets)).cast("int").as("hostBucket"),
        ($"rep.pDepth" + 1).as("depth"), $"priority", $"rep.pSeed".as("seedId"),
        concat($"rep.pPath", array($"rep.parentCanon")).as("path"),
        lit(0).as("attempt"), lit(r + 1).as("notBeforeRound"))

    // pending = everything staying in / returning to the frontier
    val pending = timeDeferred.toDF()
      .unionByName(toFrontierCols(quotaRejected))
      .unionByName(
        if (budgetRejected.isEmpty) emptyFrontier(spark)
        else toFrontierCols(budgetRejected))
      .unionByName(retries)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // new URLs: not seen (incl. this round's delta) and not pending
    val seenAll =
      if (m.seenDirs.isEmpty) seenDelta
      else readSeen(spark, m.seenDirs).select("urlHash", "hostBucket")
        .unionByName(seenDelta.select("urlHash", "hostBucket"))
    val fresh = newEntries
      .join(seenAll, Seq("urlHash", "hostBucket"), "left_anti")
      .join(pending.select("urlHash"), Seq("urlHash"), "left_anti")

    val nextFrontier = pending.unionByName(fresh)
    val nextFrontierDir = s"$outDir/frontier/r${r + 1}"
    nextFrontier.write.mode("overwrite").parquet(nextFrontierDir)
    val nextFrontierCount = spark.read.parquet(nextFrontierDir).count()

    // ---- metrics (A2 analog + north-rule politeness-wait) ----
    val metricsDir = s"$outDir/metrics/r$r"
    writeMetrics(spark, r, eligible, blockedDf, sched, okRes.toDF(),
      failRes.toDF(), policyDf, metricsDir)

    // ---- bloom merge + snapshot commit ----
    val expectedItems =
      if (cfg.bloomExpectedItems > 0) cfg.bloomExpectedItems
      else math.max(1024L, schedCount * 4)
    val deltaBlooms = Bloom.buildPerBucket(seenDelta, expectedItems, cfg.bloomFpp)
    val merged = Bloom.merge(blooms, deltaBlooms)
    val bloomFile = s"$outDir/bloom/r$r.bin"
    Bloom.save(Paths.get(bloomFile), merged)

    val seenDeltaCount = seenDelta.count()
    val fetchedOkCount = okRes.count()

    joined.unpersist(); ranked.unpersist(); results.unpersist()
    seenDelta.unpersist(); pending.unpersist()

    val totalScheduled = m.totalScheduled + schedCount
    Snapshot.Manifest(
      snapshotId = m.snapshotId + 1,
      parentId = m.snapshotId,
      round = r,
      totalScheduled = totalScheduled,
      frontierDir = nextFrontierDir,
      seenDirs = m.seenDirs :+ seenDir,
      fetchedDirs = if (fetchedOkCount > 0) m.fetchedDirs :+ fetchedDir else m.fetchedDirs,
      scheduleDirs = if (schedCount > 0) m.scheduleDirs :+ scheduleDir else m.scheduleDirs,
      metricsDirs = m.metricsDirs :+ metricsDir,
      bloomFile = bloomFile,
      frontierCount = nextFrontierCount,
      seenCount = m.seenCount + seenDeltaCount,
      fetchedCount = m.fetchedCount + fetchedOkCount,
      done = totalScheduled >= cfg.maxResults || nextFrontierCount == 0L)
  }

  private def toFrontierCols(df: DataFrame): DataFrame =
    df.select("url", "canonUrl", "urlHash", "host", "hostBucket", "depth",
      "priority", "seedId", "path", "attempt", "notBeforeRound")

  private def emptyFrontier(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[FrontierEntry].toDF()
  }

  private def writeMetrics(
      spark: SparkSession,
      r: Int,
      eligible: DataFrame,
      blocked: DataFrame,
      sched: DataFrame,
      ok: DataFrame,
      fail: DataFrame,
      policyDf: DataFrame,
      dir: String): Unit = {
    import spark.implicits._
    def cnt(df: DataFrame, name: String): DataFrame =
      df.groupBy($"host").agg(count(lit(1)).as(name))
    val joinedM = cnt(eligible, "candidates")
      .join(cnt(blocked, "robotsBlocked"), Seq("host"), "full_outer")
      .join(cnt(sched, "scheduled"), Seq("host"), "full_outer")
      .join(cnt(ok, "fetchedOk"), Seq("host"), "full_outer")
      .join(cnt(fail, "failed"), Seq("host"), "full_outer")
      .join(broadcast(policyDf.select($"host", $"minIntervalMs")),
        Seq("host"), "left")
      .na.fill(0L, Seq("candidates", "robotsBlocked", "scheduled", "fetchedOk", "failed"))
      .withColumn("minIntervalMs", coalesce($"minIntervalMs", lit(340)))
      .withColumn("round", lit(r))
      .withColumn("seenDropped", lit(0L))
      .withColumn("deferred", $"candidates" - $"robotsBlocked" - $"scheduled")
      .withColumn("politenessWaitMs", $"deferred" * $"minIntervalMs")
      .select("round", "host", "candidates", "seenDropped", "robotsBlocked",
        "scheduled", "fetchedOk", "failed", "deferred", "politenessWaitMs")
    joinedM.write.mode("overwrite").parquet(dir)
  }
}

/** Executor-side synthetic fetcher (S1 analog: `_make_request`,
  * medcrawler/base.py:256-341). The one non-Catalyst step of a round — pure
  * side-effect-free deterministic I/O stand-in; failures are data, not
  * exceptions (ref: gather(return_exceptions=True), medcrawler/base.py:408).
  */
object Fetcher {
  def fetchOne(spec: CorpusSpec, t: CrawlEngine.FetchTask, round: Int): FetchResult =
    SynthCorpus.fetch(spec, t.canonUrl, t.attempt) match {
      case Some(img) =>
        FetchResult(t.canonUrl, t.canonUrl, t.urlHash, t.host, t.hostBucket,
          t.depth, t.priority, t.seedId, t.path, t.attempt, round, ok = true,
          img.bytes, img.w, img.h, img.fmt, img.caption, img.phash,
          SynthCorpus.outlinks(spec, t.canonUrl))
      case None =>
        FetchResult(t.canonUrl, t.canonUrl, t.urlHash, t.host, t.hostBucket,
          t.depth, t.priority, t.seedId, t.path, t.attempt, round, ok = false,
          Array.emptyByteArray, 0, 0, "", "", 0L, Seq.empty)
    }
}
