package graft.operators

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` table, driven to
  * completion on static input (file source → memory sink →
  * `processAllAvailable`) so they fit the driver's batch query contract and
  * can be checked against the same DuckDB oracles as their batch twins.
  *
  * Context: the crawl engine itself is deliberately NOT Structured
  * Streaming — each round's input depends on the previous round's output
  * (seen-set feedback), which SS forbids; the reference's own page loop is
  * the same driver-looped micro-batch shape (SURVEY.md §2.9). These
  * operators cover the streaming surface a training-data pipeline needs:
  * event-time windowed aggregation with a watermark, and custom keyed state
  * via flatMapGroupsWithState (sessionization).
  */
object StreamingOps {

  private val nameSeq = new AtomicInteger(0)

  /** File-source stream over the events table. basePath must be the parent
    * DIRECTORY (the table is a single parquet file); the parquet timestamp
    * infers as TIMESTAMP_NTZ, which watermarks reject — cast to session-TZ
    * timestamp (UTC, so values are unchanged).
    */
  private def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // the file streaming source wants a directory or a glob, not a bare
    // file path — a glob that matches exactly the events table works
    spark.readStream.schema(schema).parquet(s"$dir/events.parque[t]")
      .withColumn("ts", col("ts").cast("timestamp"))
  }

  private def runToTable(df: DataFrame, mode: OutputMode): DataFrame = {
    val spark = df.sparkSession
    val name = s"graft_stream_${nameSeq.incrementAndGet()}"
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }

  /** Event-time tumbling window aggregation (watermarked). Result is
    * identical to the batch `q_event_window` (same oracle SQL):
    * window(1h).start == date_trunc('hour', ts).
    */
  def streamEventWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stream = eventStream(spark, dir)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour").as("win"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(round($"value" * 100).cast("bigint")).as("value_cents"))
    // cast back to NTZ so the written schema matches the batch tables
    // (UTC session ⇒ values unchanged)
    runToTable(agg, OutputMode.Complete())
      .select($"win.start".cast("timestamp_ntz").as("hour"), $"event_type",
        $"n", $"value_cents")
      .orderBy($"hour", $"event_type")
  }

  val streamEventWindowSql: String = RelationalOps.qEventWindowSql

  // NOT private: Catalyst's generated projections must access these
  case class Ev(user_id: Long, ts: Timestamp, event_id: Long)
  case class Session(
      user_id: Long,
      session_id: Long,
      n_events: Long,
      session_start: Timestamp,
      session_end: Timestamp)

  /** Stateful streaming sessionization: per-user sessions split on >30 min
    * idle gaps, via flatMapGroupsWithState (custom keyed state). On static
    * input every event arrives in one micro-batch, so all sessions finalize
    * immediately; the state plumbing (GroupState) is still exercised. Events
    * inside a group are sorted by (ts, event_id) — the pinned order the SQL
    * oracle's window functions use.
    */
  def streamSessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sessions = eventStream(spark, dir)
      .select($"user_id", $"ts", $"event_id")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        sessionFn)
    runToTable(sessions.toDF(), OutputMode.Append())
      .select($"user_id", $"session_id", $"n_events",
        $"session_start".cast("timestamp_ntz").as("session_start"),
        $"session_end".cast("timestamp_ntz").as("session_end"))
      .orderBy($"user_id", $"session_id")
  }

  private def sessionFn(
      userId: Long,
      events: Iterator[Ev],
      state: GroupState[Long]): Iterator[Session] = {
    val sorted = events.toVector.sortBy(e => (e.ts.getTime, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    val gapMs = 30L * 60 * 1000
    val out = Vector.newBuilder[Session]
    var sid = state.getOption.getOrElse(0L)
    var start = sorted.head.ts
    var last = sorted.head.ts
    var n = 1L
    sorted.tail.foreach { e =>
      if (e.ts.getTime - last.getTime > gapMs) {
        out += Session(userId, sid, n, start, last)
        sid += 1; start = e.ts; n = 0L
      }
      n += 1
      last = e.ts
    }
    out += Session(userId, sid, n, start, last)
    state.update(sid + 1)
    out.result().iterator
  }

  /** Stream–static enrichment join: the streaming side (events) joins a
    * STATIC dimension (customer ⨝ nation → per-user nation name) that Spark
    * re-plans per micro-batch — the standard "enrich at ingest" shape
    * (attach host policy / source metadata to a crawl stream, user
    * attributes to a click stream). The dimension is explicitly
    * `broadcast()`: a stream-static join must never shuffle the unbounded
    * side on a dimension key. Aggregation then mirrors q_event_window's
    * exact-integer cents discipline so the DuckDB twin is bit-exact.
    */
  def streamEnrich(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val agg = enrichAgg(eventStream(spark, dir), enrichDim(spark, dir))
    runToTable(agg, OutputMode.Complete())
      .select($"n_name", $"event_type", $"n", $"value_cents")
      .orderBy($"n_name", $"event_type")
  }

  /** The static dimension of [[streamEnrich]] — shared with its spec so the
    * test's batch/stream twins exercise the operator's actual expressions.
    */
  private[graft] def enrichDim(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/customer.parquet")
      .join(spark.read.parquet(s"$dir/nation.parquet"),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name")
  }

  /** The join + exact-cents aggregation of [[streamEnrich]], applied to any
    * (streaming or batch) events source — one definition, no test drift.
    */
  private[graft] def enrichAgg(events: DataFrame, dim: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events.join(broadcast(dim), $"user_id" === $"c_custkey")
      .groupBy($"n_name", $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(round($"value" * 100).cast("bigint")).as("value_cents"))
  }

  val streamEnrichSql: String =
    """SELECT n.n_name, e.event_type, count(*) AS n,
      | CAST(sum(CAST(round(e.value*100) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM events e
      |JOIN customer c ON e.user_id = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  /** Stateful streaming dedup at ingest: the same events file is ingested
    * TWICE (two micro-batches, `maxFilesPerTrigger 1`) and
    * `dropDuplicates(event_id)` must emit each event exactly once — the
    * keyed dedup state persisting across micro-batches is the streaming
    * analog of the crawl engine's URL-seen membership (which the engine
    * keeps outside SS because of its round feedback loop; at pure-ingest
    * time THIS is the shape). Downstream, the deduped rows reduce to the
    * per-type exact-cents aggregate, so the DuckDB twin is the plain
    * single-copy aggregate: any leaked duplicate doubles a count and
    * breaks the hash. At real scale the dedup key state is watermark-aged
    * (`dropDuplicatesWithinWatermark`) — unbounded here only because the
    * test corpus is static.
    */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("stream-dedup")
    try
      runToTable(dedupIngest(spark, dir, src), OutputMode.Append())
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum(round($"value" * 100).cast("bigint")).as("value_cents"))
        .orderBy($"event_type")
    finally {
      // recursive + tolerant: an unexpected extra file (or a failed copy)
      // must not turn cleanup into a masking exception from the finally
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(src).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** The double-ingested dedup stream of [[streamDedup]] — the events file
    * copied TWICE into `src` with `maxFilesPerTrigger 1` (one file per
    * micro-batch) through `dropDuplicates(event_id)`. Shared with the spec
    * so the ≥ 2-micro-batch cross-batch-state assertion drives the
    * operator's actual query shape, not a test copy of it.
    */
  private[graft] def dedupIngest(
      spark: SparkSession, dir: String, src: java.nio.file.Path): DataFrame = {
    val from = java.nio.file.Paths.get(s"$dir/events.parquet")
    Seq("a", "b").foreach { n =>
      java.nio.file.Files.copy(from, src.resolve(s"$n.parquet"))
    }
    spark.readStream.schema(spark.read.parquet(from.toString).schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
      .dropDuplicates("event_id")
  }

  val streamDedupSql: String =
    """SELECT event_type, count(*) AS n,
      | CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  val streamSessionizeSql: String =
    """WITH e AS (
      | SELECT user_id, ts, event_id,
      |  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |        > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      | FROM events),
      |s AS (
      | SELECT user_id, ts,
      |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      | FROM e)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      | count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end
      |FROM s GROUP BY 1,2 ORDER BY 1,2""".stripMargin
}
