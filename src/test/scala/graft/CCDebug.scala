package graft

import org.apache.spark.sql.functions._

/** Inspect the CC loop's per-iteration executed plans (cache hit or not). */
object CCDebug {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.file.impl", graft.engine.NioLocalFs.ImplClass)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    try {
      val pairs = graft.operators.ImageOps.imgPhashNearDup(spark, dir)
        .select($"img_a", $"img_b")
      val edges = pairs.union(pairs.select($"img_b", $"img_a"))
        .toDF("src", "dst").persist()
      var t0 = System.nanoTime()
      val labels = edges.select($"src".as("node")).distinct()
        .select($"node", $"node".as("lbl"))
        .localCheckpoint()
      println(f"init: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
      val nbrMin = edges
        .join(labels.select($"node".as("dst"), $"lbl".as("nlbl")), Seq("dst"))
        .groupBy($"src")
        .agg(min($"nlbl").as("nmin"))
        .select($"src".as("node"), $"nmin")
      val next = labels.join(nbrMin, Seq("node"), "left")
        .select($"node", least($"lbl", coalesce($"nmin", $"lbl")).as("lbl"))
      println("=== iter0 plan (pre-exec) ===")
      println(next.queryExecution.executedPlan.toString.take(4000))
      val cp = next.localCheckpoint()
      println(f"iter0 checkpoint: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      println("cached edges? " + edges.storageLevel)
      cp.count(): Unit
    } finally spark.stop()
  }
}
