package graft
object ScratchRaw {
  def main(args: Array[String]): Unit = {
    val spec = graft.core.CorpusSpec(numHosts = 1200, pagesPerHost = 100,
      imgBase = 256, imgVar = 65, quotaBoost = 20)
    Bench.rawFetch(32, 12000, spec) // JIT warmup
    for (t <- Seq(4, 16, 16, 4)) {
      val r = Bench.rawFetch(t, if (t == 4) 6000 else 20000, spec)
      println(f"RAW ${t}t: $r%.0f urls/s")
    }
  }
}
