package graft

import java.util.concurrent.atomic.AtomicLong

/** Ad-hoc operator timing with TASK-CPU attribution (steal/clock-invariant
  * on this burstable box, mirroring Bench's crawl CPU evidence):
  * `Test/runMain graft.QTime2 <sfDir> <passes> <query>...`
  * Reports per pass wall + cumulative executor task CPU, then min-of-N for
  * both. CPU mins are the comparable number when the box is noisy.
  */
object QTime2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val qs = args.drop(2).toSeq
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.file.impl", graft.engine.NioLocalFs.ImplClass)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpuNs = new AtomicLong(0)
    val stageCpu = new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()
    val stageName = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val wantStages = sys.env.contains("QTIME2_STAGES")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            cpuNs.addAndGet(m.executorCpuTime): Unit
            if (wantStages)
              stageCpu.computeIfAbsent(te.stageId, _ => new AtomicLong(0))
                .addAndGet(m.executorCpuTime): Unit
          }
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          if (wantStages)
            stageName.merge(sc.stageInfo.stageId,
              sc.stageInfo.name.takeWhile(_ != '\n').take(120),
              (a, b) => a + " " + b): Unit
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          if (wantStages) {
            val desc = Option(js.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse("")
            js.stageIds.foreach(sid =>
              stageName.merge(sid, s"[job ${js.jobId} $desc] ",
                (a, b) => b + a): Unit)
          }
      })
    try {
      SparkEntry.queries("q_topk")(spark, dir).count(): Unit // session warmup
      for (q <- qs) {
        var minWall = Double.MaxValue
        var minCpu = Double.MaxValue
        for (pass <- 1 to passes) {
          val c0 = cpuNs.get()
          val t0 = System.nanoTime()
          val n = SparkEntry.queries(q)(spark, dir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
          val cpu = (cpuNs.get() - c0) / 1e9
          minWall = math.min(minWall, wall)
          minCpu = math.min(minCpu, cpu)
          println(f"[qtime2] $q pass$pass: wall $wall%.2f s cpu $cpu%.2f s ($n rows)")
          if (wantStages) {
            import scala.jdk.CollectionConverters._
            stageCpu.asScala.toSeq.sortBy(-_._2.get).take(16).foreach {
              case (sid, ns) => println(
                f"[qtime2]   stage $sid%4d cpu ${ns.get / 1e9}%7.2fs  " +
                  stageName.getOrDefault(sid, "?"))
            }
            stageCpu.clear(); stageName.clear()
          }
        }
        println(f"[qtime2] $q MIN: wall $minWall%.2f s cpu $minCpu%.2f s")
      }
    } finally spark.stop()
  }
}
