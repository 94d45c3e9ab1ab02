package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators of the engine, exercised over the driver's generic
  * testdata tables so the DuckDB oracle can verify them. Each is the
  * testdata-facing twin of a crawl-engine operator (SURVEY.md §2 ids in each
  * scaladoc).
  *
  * Numeric discipline: monetary/measure doubles are reduced to exact integer
  * cents (`cast(round(x*100) as bigint)`) BEFORE summing, so aggregation
  * results are independent of floating-point summation order — the same
  * trick the crawl scheduler uses for OPIC cash (pinned fold order). Without
  * it, Spark-vs-DuckDB hash comparison would flake on the last ulp.
  */
object RelationalOps {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** A2/A1 flagship aggregate (ref analog: batch success/failure tallies,
    * medcrawler/base.py:416-418): pruned scan → partial agg → final agg.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    t(dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").cast("bigint").as("sum_qty"),
        sum(round($"l_extendedprice" * 100).cast("bigint")).as("sum_base_cents"),
        sum(round($"l_extendedprice" * (lit(1) - $"l_discount") * 10000)
          .cast("bigint")).as("sum_disc_x10k"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
      | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
      | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS BIGINT) AS sum_disc_x10k,
      | count(*) AS n
      |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  /** S3/A1: statistics-driven count with predicate pushed to the scan
    * (ref: rettype=count pre-query, medcrawler/pubmed.py:70-97).
    */
  def qCountPushdown(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    t(dir, "lineitem")
      .where($"l_shipdate" < lit(java.sql.Timestamp.valueOf("1995-06-01 00:00:00")))
      .agg(count(lit(1)).as("n"), sum($"l_quantity").cast("bigint").as("sum_qty"))
  }

  val qCountPushdownSql: String =
    """SELECT count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      |FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-06-01'""".stripMargin

  /** P5/J1/T2: left-anti join — the URL-seen exclusion shape
    * (`if pmid not in old_item_ids`, medcrawler/pubmed.py:185-187).
    */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    // customers that ordered but never emitted an event (non-empty result:
    // the events table covers a small user-id range)
    t(dir, "orders").select($"o_custkey".as("custkey")).distinct()
      .join(t(dir, "events"), $"custkey" === $"user_id", "left_anti")
      .orderBy($"custkey")
  }

  val qAntiJoinSql: String =
    """SELECT DISTINCT o_custkey AS custkey FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = o.o_custkey)
      |ORDER BY custkey""".stripMargin

  /** T4 analog: left-semi join (EXISTS). */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    t(dir, "supplier")
      .join(t(dir, "lineitem"), $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")
  }

  val qSemiJoinSql: String =
    """SELECT s_suppkey, s_name FROM supplier s
      |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
      |ORDER BY s_suppkey""".stripMargin

  /** J2: broadcast hash join against a small dimension (ref analog: the
    * per-API CrawlerConfig dispatch, medcrawler/config.py:70-82).
    */
  def qBroadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    t(dir, "lineitem")
      .join(broadcast(t(dir, "part")), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(
        sum(round($"l_extendedprice" * (lit(1) - $"l_discount") * 10000)
          .cast("bigint")).as("revenue_x10k"),
        count(lit(1)).as("n"))
      .orderBy($"p_brand")
  }

  val qBroadcastJoinSql: String =
    """SELECT p_brand,
      | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS BIGINT) AS revenue_x10k,
      | count(*) AS n
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** §2.5: the per-host fetch-quota window (row_number rank with
    * deterministic tie-break — THE crawl-order contract shape; ref batch
    * caps, medcrawler/pubmed.py:299).
    */
  def qWindowQuota(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    t(dir, "orders")
      .withColumn("rk", row_number().over(w))
      .where($"rk" <= 3)
      .select($"o_custkey", $"o_orderkey",
        round($"o_totalprice" * 100).cast("bigint").as("price_cents"), $"rk")
      .orderBy($"o_custkey", $"rk")
  }

  val qWindowQuotaSql: String =
    """SELECT o_custkey, o_orderkey,
      | CAST(round(o_totalprice*100) AS BIGINT) AS price_cents, CAST(rk AS INT) AS rk
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
      | FROM orders)
      |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin

  /** T1/T3: union of sources + exact distinct (ref: multi-source demo,
    * medcrawler/demo.py:195-226; within-page `set(idlist)`,
    * medcrawler/pubmed.py:129).
    */
  def qUnionDedup(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    t(dir, "orders").select($"o_custkey".as("id"))
      .unionByName(t(dir, "events").select($"user_id".as("id")))
      .distinct()
      .orderBy($"id")
  }

  val qUnionDedupSql: String =
    """SELECT DISTINCT o_custkey AS id FROM orders
      |UNION SELECT DISTINCT user_id AS id FROM events
      |ORDER BY id""".stripMargin

  /** L1/§2.6: global ordered top-k (budget truncation shape). */
  def qTopk(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    t(dir, "orders")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
      .select($"o_orderkey", $"o_custkey",
        round($"o_totalprice" * 100).cast("bigint").as("price_cents"))
  }

  val qTopkSql: String =
    """SELECT o_orderkey, o_custkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** Hierarchical rollup aggregate (GROUPING SETS family): per-(lang,
    * source) doc counts and token totals PLUS per-lang subtotals PLUS the
    * grand total in one pass — the corpus-report shape every dataset card
    * tabulates. Catalyst plans this as ONE Expand (each row replicated once
    * per grouping set) feeding a single hash aggregate: no self-union, no
    * second scan, map-side combinable — at 100 TB the cost is the expand
    * factor (3 here), not extra passes. Rollup NULL markers are coalesced
    * to a sentinel in BOTH engines so the twin never hash-compares nulls
    * (`lang` is never null in the corpus, so the sentinel is unambiguous).
    */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    t(dir, "documents")
      .rollup($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split($"text", " "))).cast("bigint").as("total_tokens"))
      .select(coalesce($"lang", lit("(all)")).as("lang"),
        coalesce($"source", lit("(all)")).as("source"),
        $"n_docs", $"total_tokens")
      .orderBy($"lang", $"source")
  }

  val qRollupSql: String =
    """SELECT coalesce(lang, '(all)') AS lang,
      |  coalesce(source, '(all)') AS source,
      |  count(*) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
      |FROM documents GROUP BY ROLLUP(lang, source)
      |ORDER BY 1, 2""".stripMargin

  /** §2.9: event-time tumbling-window aggregation over the events stream
    * table (batch equivalent of the streaming windowed agg; value summed as
    * exact cents).
    */
  def qEventWindow(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    t(dir, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(round($"value" * 100).cast("bigint")).as("value_cents"))
      .orderBy($"hour", $"event_type")
  }

  val qEventWindowSql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
      | CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  /** §2.10 UDTF analog: explode/generator (outlink expansion shape:
    * one page → N tokens; `explode(outlinks)` in the crawl engine).
    */
  def qExplodeTokens(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    t(dir, "documents")
      .select(explode(split($"text", " ")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token".asc)
      .limit(30)
  }

  val qExplodeTokensSql: String =
    """SELECT token, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY 1 ORDER BY n DESC, token LIMIT 30""".stripMargin

  /** P2/F6 analog: JSON metadata extraction (ref: CT.gov nested-JSON →
    * columns projection, medcrawler/clinical_trials.py:175-221, and the
    * str→dict fallback parse, medcrawler/pubmed.py:95-96).
    */
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    t(dir, "events")
      .select($"event_type",
        get_json_object($"props", "$.k").cast("bigint").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
        min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  val qJsonExtractSql: String =
    """SELECT event_type, count(*) AS n,
      | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      | CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
      | CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** F8/P4 analog: date arithmetic + range predicate (ref: --recent now-90d,
    * medcrawler/demo.py:183-192; date-range pushdown,
    * medcrawler/pubmed.py:159-170).
    */
  def qDateRange(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    t(dir, "orders")
      .where($"o_orderdate".between(
        lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")),
        lit(java.sql.Timestamp.valueOf("1996-12-31 23:59:59"))))
      .groupBy(date_trunc("month", $"o_orderdate").as("month"))
      .agg(count(lit(1)).as("n"),
        sum(round($"o_totalprice" * 100).cast("bigint")).as("total_cents"))
      .orderBy($"month")
  }

  val qDateRangeSql: String =
    """SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n,
      | CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
      |FROM orders
      |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31 23:59:59'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** P2/F6 FULL nested-JSON projection: `from_json` with a nested StructType
    * including string arrays and an array-of-structs, plus the reference's
    * author formatter (ln + first initial, comma-joined) re-expressed with
    * higher-order `transform` + `concat_ws`/`array_join`
    * (ref: clinical_trials.py:175-221 nested protocolSection extraction;
    * pubmed.py:248-255 author formatting). The JSON document is constructed
    * deterministically from `documents` columns — identically in the DuckDB
    * twin — then parsed back through each engine's own JSON machinery.
    */
  def qJsonStruct(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("study", StructType(Seq(
        StructField("id", LongType),
        StructField("meta", StructType(Seq(
          StructField("lang", StringType),
          StructField("source", StringType))))))),
      StructField("conditions", ArrayType(StringType)),
      StructField("authors", ArrayType(StructType(Seq(
        StructField("ln", StringType),
        StructField("fn", StringType)))))))
    t(dir, "documents")
      .withColumn("ws", split($"text", " "))
      .where(size($"ws") >= 6)
      .withColumn("js", concat(
        lit("{\"study\":{\"id\":"), $"doc_id",
        lit(",\"meta\":{\"lang\":\""), $"lang",
        lit("\",\"source\":\""), $"source",
        lit("\"}},\"conditions\":[\""), $"ws".getItem(0),
        lit("\",\""), $"ws".getItem(1),
        lit("\"],\"authors\":[{\"ln\":\""), $"ws".getItem(2),
        lit("\",\"fn\":\""), $"ws".getItem(3),
        lit("\"},{\"ln\":\""), $"ws".getItem(4),
        lit("\",\"fn\":\""), $"ws".getItem(5),
        lit("\"}]}")))
      .withColumn("j", from_json($"js", schema))
      .select($"doc_id",
        $"j.study.meta.lang".as("lang_j"),
        $"j.study.meta.source".as("source_j"),
        size($"j.conditions").cast("bigint").as("n_cond"),
        array_join($"j.conditions", ";").as("conds"),
        concat_ws(", ", transform($"j.authors", a =>
          concat(a.getField("ln"), lit(" "),
            substring(a.getField("fn"), 1, 1)))).as("authors_fmt"))
      .orderBy($"doc_id")
  }

  val qJsonStructSql: String =
    """WITH d AS (
      | SELECT doc_id, lang, source, string_split(text, ' ') AS ws FROM documents
      | WHERE len(string_split(text, ' ')) >= 6),
      |j AS (
      | SELECT doc_id,
      |  '{"study":{"id":' || doc_id || ',"meta":{"lang":"' || lang ||
      |  '","source":"' || source || '"}},"conditions":["' || ws[1] || '","' ||
      |  ws[2] || '"],"authors":[{"ln":"' || ws[3] || '","fn":"' || ws[4] ||
      |  '"},{"ln":"' || ws[5] || '","fn":"' || ws[6] || '"}]}' AS js
      | FROM d)
      |SELECT doc_id,
      | json_extract_string(js, '$.study.meta.lang') AS lang_j,
      | json_extract_string(js, '$.study.meta.source') AS source_j,
      | CAST(json_array_length(js, '$.conditions') AS BIGINT) AS n_cond,
      | list_aggregate(CAST(json_extract_string(js, '$.conditions[*]') AS VARCHAR[]),
      |   'string_agg', ';') AS conds,
      | list_aggregate(list_transform(CAST(json_extract(js, '$.authors') AS JSON[]),
      |   a -> json_extract_string(a, '$.ln') || ' ' ||
      |        substr(json_extract_string(a, '$.fn'), 1, 1)),
      |   'string_agg', ', ') AS authors_fmt
      |FROM j ORDER BY doc_id""".stripMargin

  /** F8: `--recent`-style RELATIVE date arithmetic — the predicate bound is
    * computed with date_sub inside the engine (ref: now−90d,
    * medcrawler/demo.py:183-192), with "now" pinned for determinism.
    */
  def qRecent(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    // bounds computed with date_sub, then cast to timestamp on the LITERAL
    // side — the scan column stays bare, so the range predicate pushes into
    // the parquet scan (a to_date() around the column would block pushdown)
    val now = to_date(lit("1997-06-01"))
    t(dir, "orders")
      .where($"o_orderdate" >= date_sub(now, 90).cast("timestamp") &&
        $"o_orderdate" < now.cast("timestamp"))
      .agg(count(lit(1)).as("n"),
        sum(round($"o_totalprice" * 100).cast("bigint")).as("total_cents"),
        min(to_date($"o_orderdate")).as("d_min"),
        max(to_date($"o_orderdate")).as("d_max"))
  }

  val qRecentSql: String =
    """SELECT count(*) AS n,
      | CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents,
      | min(CAST(o_orderdate AS DATE)) AS d_min,
      | max(CAST(o_orderdate AS DATE)) AS d_max
      |FROM orders
      |WHERE o_orderdate >= CAST(DATE '1997-06-01' - 90 AS TIMESTAMP)
      |  AND o_orderdate < TIMESTAMP '1997-06-01'""".stripMargin
}
