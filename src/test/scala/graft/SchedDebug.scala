package graft

object SchedDebug {
  // Isolate the NON-FETCH pipeline scaling: tiny images make fetch ~free,
  // so wall time ~= scheduling+writes+commit chain.
  def main(args: Array[String]): Unit = {
    val scale = 3
    def spec = graft.core.CorpusSpec(numHosts = 400 * scale, pagesPerHost = 100,
      imgBase = 8, imgVar = 2, quotaBoost = 20)
    def round(cores: Int): (Long, Double) = {
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.hadoop.fs.file.impl", graft.engine.NioLocalFs.ImplClass)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      try {
        val cfg = graft.core.CrawlConfig(maxResults = Long.MaxValue, maxRounds = 1, numBuckets = 16)
        val out = java.nio.file.Files.createTempDirectory("sched-bench").toString
        val t0 = System.nanoTime()
        val res = graft.engine.CrawlEngine.run(spark, spec,
          graft.engine.CrawlEngine.synthSeeds(spark, spec), cfg, out)
        (res.totalScheduled, (System.nanoTime() - t0) / 1e9)
      } finally spark.stop()
    }
    round(16) // warmup
    for (c <- Seq(4, 16, 4, 16)) {
      val (n, t) = round(c)
      println(f"[sched] cores=$c: $n urls in $t%.1fs")
    }
  }
}
