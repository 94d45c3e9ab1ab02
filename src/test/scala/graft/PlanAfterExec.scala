package graft

/** Print the FINAL adaptive plan (post-execution) of a query. */
object PlanAfterExec {
  def main(args: Array[String]): Unit = {
    val q = args(0); val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.file.impl", graft.engine.NioLocalFs.ImplClass)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(q)(spark, dir)
    df.count(): Unit
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
