package graft.engine

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Per-shard Bloom prefilter over the URL-seen set.
  *
  * North-rule requirement: "URL-seen is a partitioned Bloom/cuckoo filter
  * keyed by xxHash64 of canonicalized URLs sharded by host-hash". The Bloom
  * is a PREFILTER only — the authoritative membership check is the exact
  * anti-join against the seen shards (a Bloom false positive must not drop a
  * URL; see SURVEY.md §7.4). Reference analog: the in-memory
  * `old_item_ids: Set[str]` exclusion (medcrawler/base.py:348) — exact there,
  * exact here; the Bloom just keeps the 10^10-scale shuffle small.
  */
object Bloom {

  /** One pass, map-side-combined per-bucket Bloom build:
    * `df.groupBy(hostBucket).agg(bloom_agg(urlHash))`.
    */
  def bloomAgg(col: Column, expectedItems: Long, fpp: Double): Column =
    bridge.toColumn(
      BloomBuildAgg(bridge.toExpression(col), expectedItems, fpp)
        .toAggregateExpression())

  /** Build bucket → serialized-bloom map from a seen-delta DataFrame with
    * columns (urlHash, hostBucket). Distributed aggregation; only the tiny
    * per-bucket filters reach the driver.
    */
  def buildPerBucket(
      df: DataFrame,
      expectedItems: Long,
      fpp: Double): Map[Int, Array[Byte]] = {
    df.groupBy(col("hostBucket"))
      .agg(bloomAgg(col("urlHash"), expectedItems, fpp).as("bloom"))
      .collect()
      .map(r => r.getInt(0) -> r.getAs[Array[Byte]](1))
      .toMap
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Merge a new per-bucket delta into an existing per-bucket map. */
  def merge(
      old: Map[Int, Array[Byte]],
      delta: Map[Int, Array[Byte]]): Map[Int, Array[Byte]] = {
    val keys = old.keySet ++ delta.keySet
    keys.map { k =>
      (old.get(k), delta.get(k)) match {
        case (Some(a), Some(b)) =>
          val bf = deserialize(a)
          bf.mergeInPlace(deserialize(b))
          k -> serialize(bf)
        case (Some(a), None) => k -> a
        case (None, Some(b)) => k -> b
        case _               => throw new IllegalStateException
      }
    }.toMap
  }

  /** Broadcast the per-bucket blooms and return a `(hostBucket, urlHash) →
    * mightContain` Column. Buckets with no bloom yet ⇒ nothing seen ⇒ false.
    */
  def mightContainCol(
      spark: SparkSession,
      blooms: Map[Int, Array[Byte]])(bucket: Column, hash: Column): Column = {
    val bc = spark.sparkContext.broadcast(blooms)
    val f = udf { (b: Int, h: Long) =>
      // deserialize once per executor per bucket via a small local cache
      BloomCache.get(bc.value, b).exists(_.mightContainLong(h))
    }
    f(bucket, hash)
  }

  /** Persist the bloom state for snapshot resume (write-tmp-then-rename). */
  def save(path: java.nio.file.Path, blooms: Map[Int, Array[Byte]]): Unit = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(blooms.size)
    blooms.toSeq.sortBy(_._1).foreach { case (k, v) =>
      out.writeInt(k); out.writeInt(v.length); out.write(v)
    }
    out.close()
    java.nio.file.Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    java.nio.file.Files.write(tmp, bos.toByteArray)
    java.nio.file.Files.move(tmp, path,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def load(path: java.nio.file.Path): Map[Int, Array[Byte]] = {
    val in = new DataInputStream(new ByteArrayInputStream(java.nio.file.Files.readAllBytes(path)))
    val n = in.readInt()
    (0 until n).map { _ =>
      val k = in.readInt()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      k -> b
    }.toMap
  }
}

/** Executor-local deserialization cache for broadcast blooms (avoids
  * re-parsing the filter for every row).
  */
object BloomCache {
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Option[BloomFilter]]()

  def get(blooms: Map[Int, Array[Byte]], bucket: Int): Option[BloomFilter] = {
    val key = (System.identityHashCode(blooms), bucket)
    var v = cache.get(key)
    if (v == null) {
      v = blooms.get(bucket).map(Bloom.deserialize)
      cache.put(key, v)
      if (cache.size() > 4096) cache.clear()
    }
    v
  }
}

/** Native Catalyst aggregate building a Bloom filter of long keys per group.
  * Map-side partial aggregation + `mergeInPlace` on the reduce side — one
  * shuffle of small serialized filters instead of raw keys.
  */
case class BloomBuildAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = Bloom.serialize(buffer)

  override def deserialize(storageFormat: Array[Byte]): BloomFilter =
    Bloom.deserialize(storageFormat)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_build_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
    copy(child = newChild)
}
