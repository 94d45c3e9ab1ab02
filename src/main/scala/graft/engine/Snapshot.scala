package graft.engine

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Minimal Iceberg-style snapshot log over Parquet.
  *
  * No Iceberg jars exist in /opt/spark/jars (offline coursier), so the table
  * format is emulated with the same guarantees the north rule relies on:
  *   - atomic commit: data files are written first, then the manifest JSON is
  *     written to a temp file and atomically renamed to `meta/v{N}.json` —
  *     readers only ever see fully-committed snapshots (Iceberg's
  *     metadata-swap commit);
  *   - parent chain: each manifest records its parent snapshot id;
  *   - exact resume: the manifest carries every state pointer a crawl round
  *     needs (frontier dir, seen delta dirs, bloom sidecar, fetched/schedule/
  *     metrics delta dirs, round counter, scheduled-budget counter);
  *   - snapshot expiry: superseded frontier dirs older than `retain` commits
  *     are deleted (ref analog: oldest-first TTL cache eviction,
  *     medcrawler/base.py:82-86).
  *
  * Ref analog of the whole log: the TTL result cache + incremental seen-set
  * accretion (medcrawler/base.py:52-93) — fetch-once semantics persisted.
  */
object Snapshot {

  case class Manifest(
      snapshotId: Int,
      parentId: Int, // -1 for the first snapshot
      round: Int, // round that PRODUCED this snapshot (-1 = initial)
      totalScheduled: Long,
      frontierDir: String,
      seenDirs: Vector[String],
      fetchedDirs: Vector[String],
      scheduleDirs: Vector[String],
      metricsDirs: Vector[String],
      bloomDir: String,
      frontierCount: Long,
      seenCount: Long,
      fetchedCount: Long,
      done: Boolean)

  private def metaDir(root: String): Path = Paths.get(root, "meta")

  def commit(root: String, m: Manifest): Unit = {
    val dir = metaDir(root)
    Files.createDirectories(dir)
    val json = toJson(m)
    val tmp = dir.resolve(s"v${m.snapshotId}.json.tmp")
    Files.write(tmp, json.getBytes("UTF-8"))
    Files.move(tmp, dir.resolve(s"v${m.snapshotId}.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Latest committed snapshot, if any. Ignores torn .tmp files. */
  def latest(root: String): Option[Manifest] = {
    val dir = metaDir(root)
    if (!Files.isDirectory(dir)) return None
    val versions = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d+\\.json") =>
        s.stripPrefix("v").stripSuffix(".json").toInt
      }
      .toVector
    if (versions.isEmpty) None
    else Some(read(root, versions.max))
  }

  def read(root: String, id: Int): Manifest = {
    val json = new String(
      Files.readAllBytes(metaDir(root).resolve(s"v$id.json")), "UTF-8")
    fromJson(json)
  }

  /** Expire snapshots older than `retain` generations, Iceberg-style:
    * delete their frontier dirs plus any seen-delta / bloom dirs no longer
    * referenced by a retained manifest. Like Iceberg's expire_snapshots,
    * time-travel to an expired snapshot is no longer guaranteed (its state
    * files may be gone if superseded by compaction); the attempts/metrics
    * DATA outputs are never touched. Bloom dirs share unchanged bucket
    * files via hard links, so deleting a superseded dir only unlinks.
    */
  def expire(root: String, retain: Int = 3): Unit = {
    val dir = metaDir(root)
    if (!Files.isDirectory(dir)) return
    val manifests = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d+\\.json") =>
        s.stripPrefix("v").stripSuffix(".json").toInt
      }
      .toVector.sorted
    val retained = manifests.takeRight(retain).map(read(root, _))
    val referenced: Set[String] =
      retained.flatMap(m => m.seenDirs ++ Vector(m.bloomDir, m.frontierDir)).toSet
    manifests.dropRight(retain).foreach { id =>
      val m = read(root, id)
      (Vector(m.frontierDir, m.bloomDir) ++ m.seenDirs)
        .filterNot(referenced.contains)
        .foreach { d =>
          val p = Paths.get(d)
          if (Files.isDirectory(p)) deleteRecursively(p)
        }
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  // --- tiny hand-rolled JSON (flat schema, controlled strings) ---

  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def arr(v: Vector[String]): String = v.map(q).mkString("[", ",", "]")

  def toJson(m: Manifest): String =
    s"""{"snapshotId":${m.snapshotId},"parentId":${m.parentId},"round":${m.round},
       |"totalScheduled":${m.totalScheduled},"frontierDir":${q(m.frontierDir)},
       |"seenDirs":${arr(m.seenDirs)},"fetchedDirs":${arr(m.fetchedDirs)},
       |"scheduleDirs":${arr(m.scheduleDirs)},"metricsDirs":${arr(m.metricsDirs)},
       |"bloomDir":${q(m.bloomDir)},"frontierCount":${m.frontierCount},
       |"seenCount":${m.seenCount},"fetchedCount":${m.fetchedCount},"done":${m.done}}"""
      .stripMargin.replace("\n", "")

  def fromJson(json: String): Manifest = {
    // strings in this manifest are paths we wrote ourselves (no embedded
    // quotes), so a simple field scanner is sufficient and dependency-free
    def str(k: String): String = {
      val m = ("\"" + k + "\":\"([^\"]*)\"").r.findFirstMatchIn(json)
      m.map(_.group(1)).getOrElse(sys.error(s"manifest missing $k"))
    }
    def num(k: String): Long = {
      val m = ("\"" + k + "\":(-?\\d+)").r.findFirstMatchIn(json)
      m.map(_.group(1).toLong).getOrElse(sys.error(s"manifest missing $k"))
    }
    def bool(k: String): Boolean =
      ("\"" + k + "\":(true|false)").r.findFirstMatchIn(json)
        .exists(_.group(1) == "true")
    def strArr(k: String): Vector[String] = {
      val m = ("\"" + k + "\":\\[([^\\]]*)\\]").r.findFirstMatchIn(json)
        .getOrElse(sys.error(s"manifest missing $k"))
      val body = m.group(1).trim
      if (body.isEmpty) Vector.empty
      else body.split(",").toVector.map(_.trim.stripPrefix("\"").stripSuffix("\""))
    }
    Manifest(
      num("snapshotId").toInt, num("parentId").toInt, num("round").toInt,
      num("totalScheduled"), str("frontierDir"), strArr("seenDirs"),
      strArr("fetchedDirs"), strArr("scheduleDirs"), strArr("metricsDirs"),
      str("bloomDir"), num("frontierCount"), num("seenCount"),
      num("fetchedCount"), bool("done"))
  }
}
