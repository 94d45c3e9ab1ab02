package graft
/** Ad-hoc crawl measurement: warmup, then best-of-2 crawlRound at each core
  * count given in args (first arg = scale). */
object CrawlDebug {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.getOrElse("3").toInt
    val cores = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(4, 16)
    val spec = graft.core.CorpusSpec(numHosts = 400, pagesPerHost = 100,
      imgBase = 256, imgVar = 65, quotaBoost = 20)
    Bench.rawFetchFor(32, 8.0, spec) // JIT warmup
    Bench.crawlRound(16, 1)          // spark warmup
    for (c <- cores; i <- 1 to 2) {
      val (n, t, cpu) = Bench.crawlRound(c, scale)
      println(f"cores=$c run$i: $n urls in $t%.1fs = ${n / t}%.0f urls/s " +
        f"(task-cpu $cpu%.0fs, ${cpu * 1000.0 / n}%.2f cpu-ms/url)")
    }
  }
}
