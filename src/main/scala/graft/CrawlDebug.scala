package graft
object CrawlDebug {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.getOrElse("3").toInt
    val spec = graft.core.CorpusSpec(numHosts = 400, pagesPerHost = 100,
      imgBase = 256, imgVar = 65, quotaBoost = 20)
    Bench.rawFetch(32, 12000, spec) // JIT warmup
    Bench.crawlRound(16, 1)         // spark warmup
    for (c <- Seq(4, 16)) {
      val (n, t) = Bench.crawlRound(c, scale)
      println(f"cores=$c scale=$scale: $n urls in $t%.1fs = ${n / t}%.0f urls/s")
    }
  }
}
