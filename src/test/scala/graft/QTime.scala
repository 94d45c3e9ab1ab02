package graft

/** Ad-hoc operator timing: `Test/runMain graft.QTime <sfDir> <query>...`
  * (2 passes each at local[32] — pass 2 is the warm number).
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qs = if (args.length > 1) args.drop(1).toSeq
      else Seq("dedup_minhash_lsh", "embed_ann_lsh", "embed_ann_ivf", "embed_knn")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.file.impl", graft.engine.NioLocalFs.ImplClass)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      SparkEntry.queries("q_topk")(spark, dir).count(): Unit // session warmup
      for (q <- qs; pass <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, dir).count()
        println(f"[qtime] $q pass$pass: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    } finally spark.stop()
  }
}
