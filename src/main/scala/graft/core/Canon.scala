package graft.core

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** RFC-3986-style URL canonicalization + the engine's URL identity hash.
  *
  * Reference analog: the reference only joins/trims URL pieces
  * (medcrawler/base.py:228,282-283); the north rule expands this into full
  * canonicalization: lowercase scheme+host, strip fragment, sort query
  * params, drop default port.
  *
  * Pinned canonicalization spec (both the Spark engine and the single-threaded
  * [[RefOracle]] call exactly this function, so it IS the contract):
  *   1. trim whitespace
  *   2. if the URL does not match `scheme://authority[path][?query][#frag]`
  *      with an http/https scheme, return the trimmed input unchanged
  *   3. lowercase scheme and host; drop default port (:80 http, :443 https)
  *   4. path: empty → "/"; resolve "." and ".." segments; duplicate slashes
  *      are preserved; percent-encoding is NOT normalized (documented choice)
  *   5. query: split on "&", drop empty params, sort lexicographically
  *      (stable), rejoin; an empty query string is dropped entirely
  *   6. fragment: dropped
  */
object Canon {

  private val UrlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$".r

  def canonicalize(raw: String): String = {
    val s = raw.trim
    s match {
      case UrlRe(scheme0, auth0, path0, query0) =>
        val scheme = scheme0.toLowerCase
        if (scheme != "http" && scheme != "https") s
        else {
          val (hostPart, portPart) = splitAuthority(auth0)
          val host = hostPart.toLowerCase
          val port = portPart match {
            case Some(p)
                if (scheme == "http" && p == "80") ||
                  (scheme == "https" && p == "443") =>
              ""
            case Some(p) => ":" + p
            case None    => ""
          }
          val path = normalizePath(if (path0.isEmpty) "/" else path0)
          val query = Option(query0).map(normalizeQuery).getOrElse("")
          s"$scheme://$host$port$path$query"
        }
      case _ => s
    }
  }

  private def splitAuthority(auth: String): (String, Option[String]) = {
    // no userinfo support needed (synthetic corpus never emits it); a ":"
    // after the last "]" or anywhere in a reg-name splits host:port
    val i = auth.lastIndexOf(':')
    if (i >= 0 && auth.drop(i + 1).forall(_.isDigit) && i > auth.lastIndexOf(']'))
      (auth.take(i), Some(auth.drop(i + 1)).filter(_.nonEmpty))
    else (auth, None)
  }

  /** Remove "." and ".." segments per RFC 3986 §5.2.4; preserves duplicate
    * slashes as empty segments.
    */
  private def normalizePath(path: String): String = {
    val segs = path.split("/", -1).toList
    val out = scala.collection.mutable.ListBuffer.empty[String]
    segs.foreach {
      case "."  => ()
      case ".." => if (out.nonEmpty && out.last.nonEmpty) out.remove(out.length - 1)
      case seg  => out += seg
    }
    val joined = out.mkString("/")
    if (joined.startsWith("/")) joined else "/" + joined.dropWhile(_ == '/')
  }

  private def normalizeQuery(q: String): String = {
    val params = q.split("&", -1).filter(_.nonEmpty)
    if (params.isEmpty) "" else "?" + params.sorted.mkString("&")
  }

  /** Host component of a canonical URL ("" if not parseable). */
  def hostOf(canonUrl: String): String = canonUrl match {
    case UrlRe(_, auth, _, _) => splitAuthority(auth)._1.toLowerCase
    case _                    => ""
  }

  /** Path component of a canonical URL ("/" default). */
  def pathOf(canonUrl: String): String = canonUrl match {
    case UrlRe(_, _, p, _) => if (p.isEmpty) "/" else p
    case _                 => ""
  }

  /** xxhash64 of a string, bit-identical to Spark's
    * `org.apache.spark.sql.functions.xxhash64(col)` on a StringType column
    * (XxHash64 expression, seed 42, over UTF-8 bytes). Used on both the
    * driver/oracle side (this method) and in-plan (the builtin function), so
    * the two always agree.
    */
  def xxhash64(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
  }

  /** Shard key: pmod(xxhash64(host), numBuckets) — matches Spark's
    * `pmod(xxhash64(host), lit(n))`.
    */
  def hostBucket(host: String, numBuckets: Int): Int = {
    val h = xxhash64(host) % numBuckets
    (if (h < 0) h + numBuckets else h).toInt
  }
}
