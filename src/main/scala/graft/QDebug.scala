package graft
import org.apache.spark.sql.SparkSession
object QDebug {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.hadoop.fs.file.impl", graft.engine.NioLocalFs.ImplClass)
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, dir)
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"run$i: $n rows in ${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    df.explain("formatted")
    spark.stop()
  }
}
