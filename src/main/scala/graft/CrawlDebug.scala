package graft
object CrawlDebug {
  def main(args: Array[String]): Unit = {
    val cores = if (args.isEmpty) Seq(16) else args.map(_.toInt).toSeq
    val spec = graft.core.CorpusSpec(numHosts = 400, pagesPerHost = 100,
      imgBase = 256, imgVar = 65, quotaBoost = 20)
    Bench.rawFetch(32, 12000, spec) // JIT warmup
    Bench.crawlRound(16, 1)         // spark warmup
    for (c <- cores) {
      val (n, t) = Bench.crawlRound(c, 3)
      println(f"cores=$c: $n urls in $t%.1fs = ${n / t}%.0f urls/s")
    }
  }
}
