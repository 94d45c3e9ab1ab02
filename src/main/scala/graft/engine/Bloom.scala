package graft.engine

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
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
  * per-bucket [[KeyLog]] run probe (a Bloom false positive must not drop a
  * URL, and an absent filter must not veto the exact probe; see SURVEY.md
  * §7.4). Reference analog: the in-memory `old_item_ids: Set[str]` exclusion
  * (medcrawler/base.py:348) — exact there, exact here; the Bloom keeps the
  * probe O(1) for the common not-seen case.
  */
object Bloom {

  /** One pass, map-side-combined per-bucket Bloom build:
    * `df.groupBy(hostBucket).agg(bloom_agg(urlHash))`.
    */
  def bloomAgg(col: Column, expectedItems: Long, fpp: Double): Column =
    bridge.toColumn(
      BloomBuildAgg(bridge.toExpression(col), expectedItems, fpp)
        .toAggregateExpression())

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def bucketPath(dir: String, bucket: Int): String = s"$dir/b$bucket.bloom"

  /** Create an empty bloom-state directory (fresh crawl, round 0). */
  def init(dir: String): Unit = Fs.mkdirs(dir)

  /** Distributed per-bucket delta merge. The per-bucket delta filters come
    * out of the [[BloomBuildAgg]] aggregation; each aggregation OUTPUT task
    * then merges its bucket's delta with the previous round's bucket FILE
    * and writes the new bucket file directly (tmp + atomic rename) — no
    * filter bytes ever pass through the driver and no executor holds more
    * than the buckets of its own partition. Buckets untouched by the delta
    * are hard-linked from the previous round's directory (an O(numBuckets)
    * driver-side metadata op, no data copied — the Iceberg
    * "unchanged files carry over by reference" analog; on an HDFS-backed
    * deployment the link becomes a manifest entry instead).
    *
    * expectedItems must be CONSTANT over the crawl: sketch Bloom filters
    * merge only at identical bit size.
    */
  def mergeAndSave(
      seenDelta: DataFrame,
      prevDir: Option[String],
      newDir: String,
      expectedItems: Long,
      fpp: Double): Unit = {
    Fs.mkdirs(newDir)
    val spark = seenDelta.sparkSession
    import spark.implicits._
    val prev = prevDir // local val: the closure must not capture a Manifest
    val changed = seenDelta
      .groupBy(col("hostBucket"))
      .agg(bloomAgg(col("urlHash"), expectedItems, fpp).as("bloom"))
      .as[(Int, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (bucket, deltaBytes) =>
          val merged = prev.map(d => bucketPath(d, bucket))
            .filter(Fs.exists) match {
            case Some(p) =>
              val bf = deserialize(Fs.readAllBytes(p))
              bf.mergeInPlace(deserialize(deltaBytes))
              serialize(bf)
            case None => deltaBytes
          }
          // idempotent publish: a crash between mergeAndSave and
          // Snapshot.commit re-runs the round and replaces the file
          Fs.writeAtomic(bucketPath(newDir, bucket), merged)
          bucket
        }
      }
      .collect()
      .toSet
    prevDir.foreach { d =>
      Fs.list(d).foreach { name =>
        if (name.startsWith("b") && name.endsWith(".bloom")) {
          val bucket = name.stripPrefix("b").stripSuffix(".bloom").toInt
          if (!changed.contains(bucket))
            Fs.carryForward(bucketPath(d, bucket), bucketPath(newDir, bucket))
        }
      }
    }
  }

}

/** Executor-local bucket-file cache for bloom probes: deserialize each
  * probed bucket once per executor, keyed by the immutable (dir, bucket)
  * identity of the committed bloom state. Bounded [[LruCache]]: overflow
  * evicts only the least-recently-probed entries instead of stampeding
  * every thread into a full re-read.
  */
object BloomCache {
  @transient private lazy val cache =
    new LruCache[(String, Int), Option[BloomFilter]](4096)

  def get(dir: String, bucket: Int): Option[BloomFilter] =
    cache.get((dir, bucket)) { case (d, b) =>
      val p = Bloom.bucketPath(d, b)
      if (Fs.exists(p)) Some(Bloom.deserialize(Fs.readAllBytes(p))) else None
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
