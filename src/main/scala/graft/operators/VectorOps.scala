package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-similarity operators over the `embeddings` table
  * (vec_id: long, embedding: array<float> 64-dim, label: int).
  *
  * Cosine similarity is computed in DOUBLE with a pinned left-fold over the
  * element index (Catalyst `aggregate` over `zip_with`), then rounded to 6
  * decimals; ranking happens on the ROUNDED value with vec_id tie-break, so
  * Spark and the DuckDB oracle order identically.
  *
  * Scale notes: brute-force KNN is the correctness baseline (cross join =
  * |Q|·|N| — fine for a bounded query set, never for all-pairs at 10^10).
  * The scale path is the sign-LSH variant: bucket on the sign pattern of the
  * leading dimensions (deterministic hyperplanes), turning ANN into an
  * equi-join groupable/broadcastable by bucket — same candidate-then-verify
  * split as MinHash LSH and the crawl Bloom.
  */
object VectorOps {

  private def emb(dir: String)(implicit s: SparkSession): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** dot(a,b) folded left over the element index, all in double. */
  private def dotCol(a: String, b: String): Column = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)")

  private def norm2Col(a: String): Column = expr(
    s"aggregate($a, cast(0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double))")

  private def cosine(a: String, b: String): Column =
    round(dotCol(a, b) / (sqrt(norm2Col(a)) * sqrt(norm2Col(b))), 6)

  /** DuckDB twin of [[cosine]]: list comprehension + list_sum in double. */
  private def cosineSql(a: String, b: String): String =
    s"""round(list_sum([$a[i]::DOUBLE * $b[i]::DOUBLE FOR i IN generate_series(1, len($a))])
       | / (sqrt(list_sum([$a[i]::DOUBLE * $a[i]::DOUBLE FOR i IN generate_series(1, len($a))]))
       |  * sqrt(list_sum([$b[i]::DOUBLE * $b[i]::DOUBLE FOR i IN generate_series(1, len($b))]))), 6)"""
      .stripMargin.replace("\n", "")

  /** Brute-force cosine top-k: for each query vector (vec_id < 20), the 5
    * nearest neighbors.
    */
  def embedKnn(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val e = emb(dir)
    val q = e.where($"vec_id" < 20)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val c = e.select($"vec_id".as("neighbor_id"), $"embedding".as("ce"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"sim".desc, $"neighbor_id".asc)
    q.crossJoin(c)
      .where($"query_id" =!= $"neighbor_id")
      .withColumn("sim", cosine("qe", "ce"))
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= 5)
      .select($"query_id", $"neighbor_id", $"sim", $"rank")
      .orderBy($"query_id", $"rank")
  }

  val embedKnnSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 20),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
       |p AS (SELECT query_id, neighbor_id, ${cosineSql("qe", "ce")} AS sim
       |  FROM q, c WHERE query_id <> neighbor_id),
       |r AS (SELECT query_id, neighbor_id, sim,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
       | FROM p)
       |SELECT query_id, neighbor_id, sim, rank FROM r WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** Embedding-cosine near-duplicate pairs: all pairs with similarity ≥ 0.4
    * (the corpus' top similarities sit around 0.45; nothing reaches classic
    * 0.9+ because vectors are near-orthogonal random draws).
    */
  def embedNearDup(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    val a = emb(dir).select($"vec_id".as("vec_a"), $"embedding".as("ea"))
    val b = emb(dir).select($"vec_id".as("vec_b"), $"embedding".as("eb"))
    a.crossJoin(b)
      .where($"vec_a" < $"vec_b")
      .withColumn("sim", cosine("ea", "eb"))
      .where($"sim" >= 0.4)
      .select($"vec_a", $"vec_b", $"sim")
      .orderBy($"vec_a", $"vec_b")
  }

  val embedNearDupSql: String =
    s"""WITH a AS (SELECT vec_id AS vec_a, embedding AS ea FROM embeddings),
       |b AS (SELECT vec_id AS vec_b, embedding AS eb FROM embeddings),
       |p AS (SELECT vec_a, vec_b, ${cosineSql("ea", "eb")} AS sim
       | FROM a, b WHERE vec_a < vec_b)
       |SELECT vec_a, vec_b, sim FROM p WHERE sim >= 0.4 ORDER BY vec_a, vec_b""".stripMargin

  /** Sign-LSH bucketed ANN: bucket = sign bits of the first 8 dimensions
    * (deterministic hyperplanes); neighbors searched within the query's
    * bucket only, top-3 by cosine. The scale path: bucket is an equi-join
    * key, so candidate generation is a hash join, not a cross join.
    */
  def embedAnnLsh(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    import spark.implicits._
    def bucketCol(e: String): Column =
      (0 until 8).map(i =>
        when(col(e).getItem(i) >= 0f, lit(1 << i)).otherwise(lit(0)))
        .reduce(_ + _).as("bucket")
    val base = emb(dir).select($"vec_id", $"embedding", bucketCol("embedding"))
    val q = base.where($"vec_id" < 50)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"), $"bucket")
    val c = base.select($"vec_id".as("neighbor_id"), $"embedding".as("ce"), $"bucket")
    val w = Window.partitionBy($"query_id")
      .orderBy($"sim".desc, $"neighbor_id".asc)
    q.join(c, Seq("bucket"))
      .where($"query_id" =!= $"neighbor_id")
      .withColumn("sim", cosine("qe", "ce"))
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= 3)
      .select($"bucket", $"query_id", $"neighbor_id", $"sim", $"rank")
      .orderBy($"query_id", $"rank")
  }

  val embedAnnLshSql: String = {
    val bucket = (0 until 8)
      .map(i => s"(CASE WHEN embedding[${i + 1}] >= 0 THEN ${1 << i} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH base AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM base WHERE vec_id < 50),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS ce, bucket FROM base),
       |p AS (SELECT q.bucket, query_id, neighbor_id, ${cosineSql("qe", "ce")} AS sim
       | FROM q JOIN c ON q.bucket = c.bucket WHERE query_id <> neighbor_id),
       |r AS (SELECT bucket, query_id, neighbor_id, sim,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
       | FROM p)
       |SELECT bucket, query_id, neighbor_id, sim, rank FROM r WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin
  }
}
