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
  *   frontier ──broadcast policy join──▶ robots filter ──window rank per
  *     host──▶ per-host quota ──(rare) global budget──▶ schedule
  *     ──salted repartition──▶ mapPartitions synthetic fetch
  *     ──explode outlinks──▶ OPIC cash aggregation
  *     ──executor-local seen probe (bloom + exact KeyLog runs)──▶
  *     next frontier
  *
  * Determinism contract (SURVEY.md §7.3, mirrored by [[graft.core.RefOracle]]):
  * schedule order = (round ASC, priority DESC, host ASC, urlHash ASC); OPIC
  * priority sums run in integer fixed point ([[graft.core.Opic]]) so they are
  * exact and order-independent — results are independent of partitioning and
  * parallelism, which is what makes the N-vs-4N-core scaling equivalence
  * testable.
  *
  * Scale notes (100 TB / 10^10-frontier design):
  *  - scheduling rounds never touch image `bytes` (they live only in the
  *    fetched table; Parquet column pruning keeps scans narrow);
  *  - the seen table is NEVER scanned or shuffled by a round: membership is
  *    an executor-local probe (per-bucket Bloom prefilter + exact sorted
  *    [[KeyLog]] runs, LSM-compacted); the queryable parquet deltas exist
  *    for consumers and compaction only. There is no round-start seen check
  *    at all — frontier ∩ live-seen = ∅ is an engine invariant shared with
  *    the oracle;
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

    /** Schedule in the pinned crawl order (narrow projection of the
      * attempts log; `bytes` pruned at the parquet scan).
      */
    def schedule(spark: SparkSession): DataFrame =
      if (manifest.scheduleDirs.isEmpty) emptySchedule(spark)
      else
        CrawlEngine.readAttempts(spark, manifest.scheduleDirs)
          .select(col("round"), col("canonUrl"), col("urlHash"), col("host"),
            col("hostBucket"), col("priority"), col("depth"), col("attempt"))
          .orderBy(col("round").asc, col("priority").desc, col("host").asc,
            col("urlHash").asc)

    /** Fetched rows in the input_hint schema + lineage (ok attempts only;
      * the ok=true predicate prunes to the ok partition of each round's
      * attempts log — failed rows are never scanned).
      */
    def fetched(spark: SparkSession): DataFrame =
      if (manifest.fetchedDirs.isEmpty)
        spark.emptyDataFrame
      else CrawlEngine.readAttempts(spark, manifest.fetchedDirs)
        .where(col("ok"))
        .select(col("canonUrl").as("image_id"), col("bytes"), col("w"),
          col("h"), col("fmt"), col("caption"), col("phash"),
          col("seedId").as("seed_id"), col("path"), col("depth"),
          col("priority"), col("round"))

    def seen(spark: SparkSession): DataFrame =
      if (manifest.seenDirs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          CrawlEngine.seenSchema)
      else CrawlEngine.readSeen(spark, manifest.seenDirs)

    def metrics(spark: SparkSession): DataFrame =
      if (manifest.metricsDirs.isEmpty) spark.emptyDataFrame
      else spark.read.parquet(manifest.metricsDirs: _*)

    private def emptySchedule(spark: SparkSession): DataFrame =
      spark.emptyDataFrame
  }

  /** Union of seen delta dirs. Each delta is hostBucket-partitioned; its own
    * basePath keeps the partition column while avoiding conflicting-root
    * partition inference. The schema is pinned explicitly: no per-round
    * footer-inference job, and a delta that is EMPTY (e.g. a round where
    * every fetch was rate-limited) reads back as an empty frame instead of
    * failing schema inference. (At 10^10 scale, deltas would be periodically
    * compacted per bucket; the manifest already supports swapping dirs.)
    */
  private val seenSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("urlHash",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("seenRound",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("hostBucket",
      org.apache.spark.sql.types.IntegerType, nullable = false)))

  private[engine] def readSeen(spark: SparkSession, dirs: Seq[String]): DataFrame =
    dirs.map(d => spark.read.schema(seenSchema).option("basePath", d).parquet(d))
      .reduce(_ unionByName _)

  /** Union of per-round attempts dirs. Each is partitioned by `ok`, so every
    * dir needs its own basePath (multiple partitioned roots cannot share one
    * scan's partition inference). The schema is PINNED to the FetchResult
    * encoder schema: no footer-inference job per dir, the `ok` partition
    * column comes back boolean directly (still partition-prunable), and a
    * round that scheduled ZERO URLs (e.g. every frontier entry time-deferred
    * by 429 backoff) — whose partitionBy write leaves only _SUCCESS with no
    * data files — reads back as an empty frame instead of throwing
    * UNABLE_TO_INFER_SCHEMA mid-crawl.
    */
  private val attemptsSchema =
    org.apache.spark.sql.Encoders.product[FetchResult].schema

  private[engine] def readAttempts(spark: SparkSession, dirs: Seq[String]): DataFrame =
    dirs.map(d =>
      spark.read.schema(attemptsSchema).option("basePath", d).parquet(d))
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
    // the manifest's hand-rolled JSON field scanner cannot round-trip paths
    // containing quote/comma/bracket characters — reject them up front
    require(!outDir.exists(c => c == '"' || c == ',' || c == ']' || c == '\\'),
      s"outDir must not contain \" , ] or \\ characters: $outDir")

    // seed frontier with dedup (max priority, tie → min seedId per URL):
    // a min(struct) aggregate, not a window — partial aggregation combines
    // map-side, so the dedup is one shuffle of combined groups with no
    // per-partition sort
    val seedDf = spark.createDataset(seeds)
      .withColumn("canonUrl", canonUdf($"url"))
      .withColumn("urlHash", xxhash64($"canonUrl"))
    val frontier0 = seedDf
      .groupBy($"urlHash")
      .agg(min(struct(negate($"priority").as("negPriority"), $"seedId",
        $"url", $"canonUrl")).as("top"))
      .withColumn("host", hostUdf($"top.canonUrl"))
      .select($"top.url".as("url"), $"top.canonUrl".as("canonUrl"), $"urlHash",
        $"host",
        pmod(xxhash64($"host"), lit(cfg.numBuckets)).cast("int").as("hostBucket"),
        lit(0).as("depth"), negate($"top.negPriority").as("priority"),
        $"top.seedId".as("seedId"),
        typedLit(Seq.empty[String]).as("path"), lit(0).as("attempt"),
        lit(0).as("notBeforeRound"))
      .as[FrontierEntry]

    val t0 = System.nanoTime()
    val fDir = s"$outDir/frontier/r0"
    frontier0.write.mode("overwrite").parquet(fDir)
    if (sys.env.contains("GRAFT_VERBOSE"))
      println(f"[init] seed frontier write: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    val fCount = parquetRowCount(spark, fDir)
    val bloomDir = s"$outDir/bloom/r0"
    Bloom.init(bloomDir)
    val m0 = Snapshot.Manifest(0, -1, -1, 0L, fDir, Vector.empty, Vector.empty,
      Vector.empty, Vector.empty, Vector.empty, bloomDir, fCount, 0L, 0L,
      done = fCount == 0)
    Snapshot.commit(outDir, m0)
    loop(spark, spec, cfg, outDir, m0)
  }

  /** Time-travel: open the crawl as of an older committed snapshot id —
    * every state pointer (frontier, seen, fetched, schedule, metrics, bloom)
    * is the one that was current at that commit (Iceberg snapshot-read
    * analog; ref analog: the TTL cache serving an older consistent view,
    * medcrawler/base.py:52-93).
    */
  def atSnapshot(outDir: String, snapshotId: Int): CrawlResult = {
    val m = Snapshot.read(outDir, snapshotId)
    CrawlResult(outDir, m.round + 1, m.totalScheduled, m)
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
    val verbose = sys.env.contains("GRAFT_VERBOSE")
    def ph[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val v = f
      if (verbose)
        println(f"[round $r] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      v
    }

    val frontier = spark.read.parquet(m.frontierDir).as[FrontierEntry]
    val eligible = frontier.where($"notBeforeRound" <= r).toDF()
    val timeDeferred = frontier.where($"notBeforeRound" > r)

    // NO round-start seen check: frontier ∩ live-seen = ∅ is an engine
    // INVARIANT (the oracle has none either, RefOracle.scala round loop).
    // Every URL enters the frontier through an exclusion point — seed init
    // of a fresh dir, or the expansion-time probe below — and leaves it the
    // round it is scheduled/blocked, which is exactly when it can enter
    // seen; a TTL-dead stamp can never come back to life (r only grows).
    // The seen set is therefore NEVER scanned or shuffled in a round
    // (the round-2 scale-killer): seen exclusion runs ONCE, at expansion,
    // as an executor-local Bloom + exact KeyLog probe (P5 analog:
    // `if pmid not in old_item_ids`, medcrawler/pubmed.py:185-187).

    // ---- robots + politeness dimension (J2: broadcast hash join) ----
    val policyDf = spark.createDataset(spec.hostPolicies).toDF()
    val joined = eligible
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
    // Salted two-phase top-k: rank within (host, urlHash%S) and keep the
    // per-salt top-quota, then re-rank the survivors per host. A true
    // per-host top-quota row is always within its salt's top-quota, so the
    // result is IDENTICAL to a single per-host window — but no task ever
    // sorts more than 1/S of a mega-host (phase 1) or S×quota rows
    // (phase 2). A 10^8-candidate host would serialize one window task
    // under the naive plan; here it is bounded.
    val quotaSalt = 16
    val w1 = Window.partitionBy($"host", pmod($"urlHash", lit(quotaSalt)))
      .orderBy($"priority".desc, $"urlHash".asc)
    val wq = Window.partitionBy($"host")
      .orderBy($"priority".desc, $"urlHash".asc)
    val candidates = joined.where(!$"blocked")
      .withColumn("rk1", row_number().over(w1))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ranked = candidates.where($"rk1" <= $"quotaPerRound")
      .withColumn("rk", row_number().over(wq))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val quotaKept = ranked.where($"rk" <= $"quotaPerRound")
    val quotaRejected = candidates.where($"rk1" > $"quotaPerRound").drop("rk1")
      .unionByName(ranked.where($"rk" > $"quotaPerRound").drop("rk1", "rk"))

    // ---- global budget (L1): steady-state rounds skip the counting job
    // entirely — when the remaining budget covers the WHOLE frontier
    // (manifest row-count statistic, no job), truncation is impossible and
    // the scheduled count comes from the attempts-log parquet footers after
    // the fetch. Only rounds near budget exhaustion pay for the scalar
    // two-level aggregate (O(1) driver memory; the round-1 design collected
    // O(hosts) rows).
    val remaining = math.max(0L, cfg.maxResults - m.totalScheduled)
    val keptCount =
      if (remaining >= m.frontierCount) -1L // sentinel: cannot truncate
      else ph("keptCount")(
        joined.where(!$"blocked")
          .groupBy($"host", $"quotaPerRound").agg(count(lit(1)).as("n"))
          .agg(coalesce(sum(least($"quotaPerRound".cast("long"), $"n")), lit(0L)))
          .as[Long].head())
    var truncatedSched: Option[DataFrame] = None
    val (sched, budgetRejected) =
      if (keptCount < 0L || keptCount <= remaining) (quotaKept, spark.emptyDataFrame)
      else {
        val s = quotaKept
          .orderBy($"priority".desc, $"host".asc, $"urlHash".asc)
          .limit(math.min(remaining, Int.MaxValue.toLong).toInt)
          .persist(StorageLevel.MEMORY_AND_DISK)
        truncatedSched = Some(s.toDF())
        (s.toDF(), quotaKept.join(s.select("urlHash"), Seq("urlHash"), "left_anti"))
      }

    // ---- fetch (S1): salted hash repartition kills host skew (a mega-host
    // spreads over 16 salt values; no RangePartitioner sampling pass), then
    // the executor-side synthetic fetch runs in mapPartitions and lands in
    // ONE per-round attempts table — the fetch log: schedule + outcome +
    // payload. Everything downstream reads it back with `bytes` pruned away
    // by parquet column pruning, so the payload is serialized exactly once.
    // EXPLICIT partition count: the task rows are tiny (no payload yet), so
    // AQE would coalesce this exchange to ~1 partition and serialize the
    // expensive per-URL fetch — cost lives in the work, not the bytes.
    // An explicit repartition(N, cols) opts out of AQE coalescing.
    // 2x over-partitioning: per-URL fetch cost varies (png vs jpeg, size),
    // so 1-task-per-core makes the slowest task bound the stage; finer
    // granularity lets the scheduler level the load (same reason real
    // clusters run 2-4x tasks per slot)
    val fetchParallelism = spark.sessionState.conf.numShufflePartitions * 2
    val attemptsDir = s"$outDir/attempts/r$r"
    // uncompressed: the payload column dominates the bytes and is already
    // PNG/JPEG-entropy-coded — snappy costs compress CPU in every fetch
    // task (plus decompress in the three pruned re-reads) for ~5% size.
    // partitionBy(ok): ok/fail row counts then come FREE from parquet
    // footers (no outcome-count job), and every downstream reader (seen
    // delta, retries, outlink expansion, fetched()) partition-prunes to
    // the half it needs.
    ph("fetchAndWrite")(sched
      .select($"canonUrl", $"urlHash", $"host", $"hostBucket", $"depth",
        $"priority", $"seedId", $"path", $"attempt")
      .as[FetchTask]
      .repartition(fetchParallelism, $"host", pmod($"urlHash", lit(16)))
      .mapPartitions { it => it.map(t => Fetcher.fetchOne(spec, t, r)) }
      .write.mode("overwrite").option("compression", "uncompressed")
      .partitionBy("ok").parquet(attemptsDir))

    // every scheduled row lands in the attempts log exactly once, so the
    // footer row counts ARE the scheduled / fetched-ok counts (no job)
    val fetchedOkCount = parquetRowCount(spark, s"$attemptsDir/ok=true")
    val schedCount = fetchedOkCount + parquetRowCount(spark, s"$attemptsDir/ok=false")
    val results = readAttempts(spark, Seq(attemptsDir))
    val okRes = results.where($"ok")
    val failRes = results.where(!$"ok")

    // ---- seen delta: fetched ok ∪ permanently-failed ∪ robots-blocked ----
    // "permanent" (404-analog) drops immediately; "transient" drops only
    // after maxRetries attempts; "ratelimited" NEVER drops here (no attempt
    // consumed — ref honors Retry-After instead of retry-burning,
    // medcrawler/base.py:296-301)
    val exhausted = failRes.where(
      $"failKind" === "permanent" ||
        ($"failKind" === "transient" && $"attempt" + 1 >= cfg.maxRetries))
    val seenDelta = okRes.select($"urlHash", $"hostBucket")
      .unionByName(exhausted.select($"urlHash", $"hostBucket"))
      .unionByName(blockedDf.select($"urlHash", $"hostBucket"))
      .withColumn("seenRound", lit(r))
    val seenDir = s"$outDir/seen/r$r"

    // retry re-enqueue with exponential backoff (ref wait_chain,
    // medcrawler/base.py:136-154)
    val retries = failRes
      .where($"failKind" === "transient" && $"attempt" + 1 < cfg.maxRetries)
      .select($"canonUrl".as("url"), $"canonUrl", $"urlHash", $"host",
        $"hostBucket", $"depth", $"priority", $"seedId", $"path",
        ($"attempt" + 1).as("attempt"),
        (lit(r) + least(pow(lit(2.0), ($"attempt" + 1).cast("double")), lit(8.0)))
          .cast("int").as("notBeforeRound"))

    // 429-analog re-enqueue: attempt counter UNCHANGED, deferred by the
    // server-provided Retry-After analog
    val rateLimited = failRes.where($"failKind" === "ratelimited")
      .select($"canonUrl".as("url"), $"canonUrl", $"urlHash", $"host",
        $"hostBucket", $"depth", $"priority", $"seedId", $"path",
        $"attempt", (lit(r) + $"retryAfter").as("notBeforeRound"))

    // ---- OPIC outlink expansion (UDTF analog: explode; A4 seen growth) ----
    // Cash is truncated to integer fixed-point BEFORE aggregation
    // ([[graft.core.Opic]]): `sum(long)` is exact, order-independent and
    // map-side-combinable, so a 10^6-in-link hub URL costs one partial-agg
    // counter per task — no per-child array buffer, no in-degree skew hazard
    val links = okRes
      .select($"urlHash".as("parentHash"), $"priority".as("pPriority"),
        $"depth".as("pDepth"), $"path".as("pPath"), $"seedId".as("pSeed"),
        $"canonUrl".as("parentCanon"), size($"outlinks").as("nRaw"),
        explode($"outlinks").as("rawLink"))
      .withColumn("cashFp",
        ($"pPriority" * lit(cfg.gamma) / $"nRaw" * lit(Opic.Scale)).cast("long"))
      .withColumn("childCanon", canonUdf($"rawLink"))
      .withColumn("childHash", xxhash64($"childCanon"))

    // ONE link-level aggregation: priority = sum of per-link cash (equals
    // the per-parent-subtotal sum — link cash from one parent is constant);
    // representative parent (depth/path/seed donor) = max per-link cash,
    // tie → min parentHash. Both are map-side-combinable, so the expansion
    // costs one shuffle instead of two.
    val perChild = links.groupBy($"childHash").agg(
      sum($"cashFp").as("priorityFp"),
      min(struct(negate($"cashFp").as("negCash"), $"parentHash".as("ph"),
        $"pDepth".as("pDepth"), $"pSeed".as("pSeed"), $"pPath".as("pPath"),
        $"parentCanon".as("parentCanon"))).as("rep"),
      min($"childCanon").as("canonUrl"))

    val newEntries = perChild
      .withColumn("host", hostUdf($"canonUrl"))
      .select(
        $"canonUrl".as("url"), $"canonUrl", $"childHash".as("urlHash"),
        $"host",
        pmod(xxhash64($"host"), lit(cfg.numBuckets)).cast("int").as("hostBucket"),
        ($"rep.pDepth" + 1).as("depth"),
        ($"priorityFp".cast("double") / lit(Opic.Scale)).as("priority"),
        $"rep.pSeed".as("seedId"),
        concat($"rep.pPath", array($"rep.parentCanon")).as("path"),
        lit(0).as("attempt"), lit(r + 1).as("notBeforeRound"))

    // pending = everything staying in / returning to the frontier
    val pending = timeDeferred.toDF()
      .unionByName(toFrontierCols(quotaRejected))
      .unionByName(
        if (budgetRejected.isEmpty) emptyFrontier(spark)
        else toFrontierCols(budgetRejected))
      .unionByName(retries)
      .unionByName(rateLimited)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // new URLs: not seen (incl. this round's delta) and not pending.
    // The COMMITTED seen state is probed executor-locally (Bloom prefilter
    // + exact KeyLog runs, liveness pinned at the CURRENT round r — the
    // oracle's isSeen(h, round)); the seen table itself is never scanned or
    // shuffled. The remaining anti-join covers this round's seen delta
    // (O(round)) and the pending frontier entries.
    val notSeen =
      !KeyLog.seenLiveCol(m.bloomDir, m.seenKeyDirs, r, cfg.ttlRounds)(
        $"hostBucket", $"urlHash")
    val excluded = seenDelta.select("urlHash", "hostBucket")
      .unionByName(pending.select("urlHash", "hostBucket"))
    val fresh = newEntries
      .where(notSeen)
      .join(excluded, Seq("urlHash", "hostBucket"), "left_anti")

    // 429-analog WHOLE-HOST deferral: every frontier entry of a host that
    // was rate-limited this round is pushed past its Retry-After horizon
    // (tiny dimension → broadcast; one distinct (host, retryAfter) per
    // limited host per round). Skipped entirely when the corpus has no
    // rate limiting so the steady-state round plan stays minimal.
    val nextFrontierBase = pending.unionByName(fresh)
    val nextFrontier =
      if (spec.rateLimitEvery <= 0) nextFrontierBase
      else {
        val rlHosts = failRes.where($"failKind" === "ratelimited")
          .select($"host", (lit(r) + $"retryAfter").as("hostNotBefore"))
          .distinct()
        nextFrontierBase
          .join(broadcast(rlHosts), Seq("host"), "left")
          .withColumn("notBeforeRound",
            greatest($"notBeforeRound", coalesce($"hostNotBefore", lit(0))))
          .drop("hostNotBefore")
          .select(nextFrontierBase.columns.map(col).toSeq: _*)
      }
    val nextFrontierDir = s"$outDir/frontier/r${r + 1}"

    // ---- round tail: four INDEPENDENT output jobs (seen delta, next
    // frontier, metrics, bloom merge) run as concurrent Spark actions —
    // they share the materialized caches (joined/candidates/ranked) and
    // the attempts parquet, so overlapping them collapses their wall time
    // to the slowest one. This near-constant tail is what limits N→4N
    // scaling on a single box (the fetch stage itself scales).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration

    val expectedItems =
      if (cfg.bloomExpectedItems > 0) cfg.bloomExpectedItems else 1L << 16
    val bloomDirNew = s"$outDir/bloom/r$r"

    val seenF = Future(ph("writeSeen") {
      // one task per bucket -> one file per partition dir (aligned with the
      // key-run bucketing; avoids numBuckets x numPartitions files)
      seenDelta.repartition(cfg.numBuckets, $"hostBucket")
        .write.mode("overwrite").partitionBy("hostBucket").parquet(seenDir)
      parquetRowCount(spark, seenDir)
    })
    // exact-probe sidecar of the same delta: per-bucket sorted key runs
    // (the LSM side of the URL-seen test; O(round) write)
    val seenKeyDir = s"$outDir/seen_keys/r$r"
    val seenKeysF = Future(ph("writeSeenKeys")(
      KeyLog.write(seenDelta.select($"hostBucket", $"urlHash",
        $"seenRound".as("aux")), seenKeyDir, cfg.numBuckets)))
    val frontierF = Future(ph("writeFrontier") {
      nextFrontier.write.mode("overwrite").parquet(nextFrontierDir)
      // row counts come from parquet footers (driver-side metadata read, no
      // Spark job) -- the same statistics an Iceberg manifest would carry
      parquetRowCount(spark, nextFrontierDir)
    })
    // metrics (A2 analog + north-rule politeness-wait): fully distributed —
    // a per-host aggregate over the cached candidates joined with a per-host
    // fetch-outcome aggregate, written without ever materializing O(hosts)
    // rows on the driver (web scale: 10^7+ hosts). Fetch-outcome hosts are
    // always a subset of eligible hosts, so a left join is exact.
    val metricsDir = s"$outDir/metrics/r$r"
    val metricsF = Future(ph("metrics") {
      val candStats = joined.groupBy($"host").agg(
        count(lit(1)).as("candidates"),
        sum(when($"blocked", 1L).otherwise(0L)).as("robotsBlocked"),
        first($"minIntervalMs").as("minIntervalMs"))
      val outcome = results.groupBy($"host").agg(
        sum(when($"ok", 1L).otherwise(0L)).as("okN"),
        sum(when(!$"ok", 1L).otherwise(0L)).as("flN"))
      candStats.join(outcome, Seq("host"), "left")
        .select(lit(r).as("round"), $"host", $"candidates", $"minIntervalMs",
          lit(0L).as("seenDropped"), $"robotsBlocked",
          (coalesce($"okN", lit(0L)) + coalesce($"flN", lit(0L))).as("scheduled"),
          coalesce($"okN", lit(0L)).as("fetchedOk"),
          coalesce($"flN", lit(0L)).as("failed"))
        .withColumn("deferred",
          $"candidates" - $"robotsBlocked" - $"scheduled")
        .withColumn("politenessWaitMs",
          $"deferred" * $"minIntervalMs".cast("long"))
        .drop("minIntervalMs")
        .write.mode("overwrite").parquet(metricsDir)
    })
    // bloom merge: expectedItems must be CONSTANT across rounds (sketch
    // bloom filters only merge at identical bit size). Sized for the crawl
    // horizon per bucket; saturation degrades the prefilter's fpp, never
    // correctness (the anti-join is authoritative). The merge is
    // distributed and partition-local: delta filters merge into per-bucket
    // FILES on the executors; the driver never holds filter bytes. An
    // empty delta just hard-links every bucket forward.
    val bloomF = Future(ph("bloomMerge")(
      Bloom.mergeAndSave(seenDelta, Some(m.bloomDir), bloomDirNew,
        expectedItems, cfg.bloomFpp)))

    val seenDeltaCount = Await.result(seenF, Duration.Inf)
    val nextFrontierCount = Await.result(frontierF, Duration.Inf)
    Await.result(metricsF, Duration.Inf)
    Await.result(bloomF, Duration.Inf)
    Await.result(seenKeysF, Duration.Inf): Unit
    val bloomDir = bloomDirNew

    joined.unpersist(); candidates.unpersist(); ranked.unpersist()
    pending.unpersist(); truncatedSched.foreach(_.unpersist())

    // compact seen deltas periodically: linear delta growth would make the
    // per-round union (and its file listing) quadratic over a long crawl --
    // the Iceberg-compaction analog; the manifest swaps N delta dirs for one.
    // Empty deltas (fully rate-limited round) never enter the manifest.
    val (newSeenDirs, newSeenKeyDirs, newSeenCount) =
      if (seenDeltaCount == 0L) (m.seenDirs, m.seenKeyDirs, m.seenCount)
      else if (m.seenDirs.size + 1 >= 16) {
        val compactDir = s"$outDir/seen/compact-r$r"
        // keep the NEWEST stamp per key: with a TTL a refetched URL may
        // appear in several deltas, and only the latest drives liveness
        readSeen(spark, m.seenDirs :+ seenDir)
          .groupBy($"urlHash", $"hostBucket")
          .agg(max($"seenRound").as("seenRound"))
          .repartition(cfg.numBuckets, $"hostBucket")
          .write.mode("overwrite").partitionBy("hostBucket").parquet(compactDir)
        // rebuild the exact-probe runs from the compacted parquet so probes
        // touch ONE run per bucket again (LSM major compaction)
        val compactKeyDir = s"$outDir/seen_keys/compact-r$r"
        KeyLog.write(
          spark.read.schema(seenSchema).option("basePath", compactDir)
            .parquet(compactDir)
            .select($"hostBucket", $"urlHash", $"seenRound".as("aux")),
          compactKeyDir, cfg.numBuckets)
        // seenCount between compactions is a cumulative STAMP count (with a
        // TTL a refetched URL stamps several deltas); compaction collapses
        // duplicates, so re-baseline from the compacted footers — exact
        // distinct-key count, no job
        (Vector(compactDir), Vector(compactKeyDir), parquetRowCount(spark, compactDir))
      } else (m.seenDirs :+ seenDir, m.seenKeyDirs :+ seenKeyDir,
        m.seenCount + seenDeltaCount)

    val totalScheduled = m.totalScheduled + schedCount
    Snapshot.Manifest(
      snapshotId = m.snapshotId + 1,
      parentId = m.snapshotId,
      round = r,
      totalScheduled = totalScheduled,
      frontierDir = nextFrontierDir,
      seenDirs = newSeenDirs,
      seenKeyDirs = newSeenKeyDirs,
      fetchedDirs = if (fetchedOkCount > 0) m.fetchedDirs :+ attemptsDir else m.fetchedDirs,
      scheduleDirs = if (schedCount > 0) m.scheduleDirs :+ attemptsDir else m.scheduleDirs,
      metricsDirs = m.metricsDirs :+ metricsDir,
      bloomDir = bloomDir,
      frontierCount = nextFrontierCount,
      seenCount = newSeenCount,
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

  /** Total row count of a parquet dir from file footers -- driver-side
    * metadata only, no Spark job (Iceberg-manifest-style statistics).
    */
  private def parquetRowCount(spark: SparkSession, dir: String): Long = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    if (!fs.exists(new Path(dir))) return 0L
    val it = fs.listFiles(new Path(dir), true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        val rd = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try n += rd.getRecordCount finally rd.close()
      }
    }
    n
  }
}

/** Executor-side synthetic fetcher (S1 analog: `_make_request`,
  * medcrawler/base.py:256-341). The one non-Catalyst step of a round — pure
  * side-effect-free deterministic I/O stand-in; failures are data, not
  * exceptions (ref: gather(return_exceptions=True), medcrawler/base.py:408).
  */
object Fetcher {
  def fetchOne(spec: CorpusSpec, t: CrawlEngine.FetchTask, round: Int): FetchResult = {
    def fail(kind: String, retryAfter: Int) =
      FetchResult(t.canonUrl, t.canonUrl, t.urlHash, t.host, t.hostBucket,
        t.depth, t.priority, t.seedId, t.path, t.attempt, round, ok = false,
        kind, retryAfter, Array.emptyByteArray, 0, 0, "", "", 0L, Seq.empty)
    // 429-analog checked FIRST: a rate-limited server rejects the request
    // before the URL's own status is observable (no retry-attempt burn)
    val rl = SynthCorpus.rateLimitDefer(spec, t.host, round)
    if (rl > 0) fail("ratelimited", rl)
    else SynthCorpus.fetch(spec, t.canonUrl, t.attempt) match {
      case Some(img) =>
        FetchResult(t.canonUrl, t.canonUrl, t.urlHash, t.host, t.hostBucket,
          t.depth, t.priority, t.seedId, t.path, t.attempt, round, ok = true,
          "", 0, img.bytes, img.w, img.h, img.fmt, img.caption, img.phash,
          SynthCorpus.outlinks(spec, t.canonUrl))
      case None =>
        val kind =
          if (SynthCorpus.failAttempts(spec, t.canonUrl) >= SynthCorpus.PermanentFail)
            "permanent"
          else "transient"
        fail(kind, 0)
    }
  }
}
