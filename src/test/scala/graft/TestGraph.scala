package graft

/** Independent connected-components reference for the cluster tests: a
  * plain union-find with union-by-min-root, generic over any ordered id
  * type. Deliberately shares NO code with `GraphOps` — it is the oracle
  * the Spark label propagation is judged against.
  */
object TestGraph {

  /** node → component-min for every node appearing in `pairs` (union by
    * min of the two roots ⇒ the surviving root of a component is its min
    * id, by induction over merges — every id starts as a root).
    */
  def components[K](pairs: Seq[(K, K)])(implicit ord: Ordering[K]): Map[K, K] = {
    val parent = scala.collection.mutable.Map[K, K]()
    def find(x: K): K = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        val (lo, hi) = if (ord.lt(ra, rb)) (ra, rb) else (rb, ra)
        parent(hi) = lo
      }
    }
    pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(n => n -> find(n)).toMap
  }

  /** The `GraphOps.canonicalClusters` output shape
    * (id, cluster_id, cluster_size, is_canonical) from the same pairs.
    */
  def canonicalClusters[K: Ordering](
      pairs: Seq[(K, K)]): Set[(K, K, Long, Boolean)] = {
    val root = components(pairs)
    val sizes = root.values.groupBy(identity).map { case (k, v) => k -> v.size }
    root.map { case (n, r) =>
      (n, r, sizes(r).toLong, n == r)
    }.toSet
  }
}
