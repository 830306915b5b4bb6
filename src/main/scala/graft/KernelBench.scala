package graft
object KernelBench {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(42)
    val as = Array.fill(1000)(Array.fill(64)(rnd.nextDouble()))
    val bs = Array.fill(1000)(Array.fill(64)(rnd.nextDouble()))
    var s = 0.0
    for (i <- 0 until 300; j <- 0 until 300) s += graft.functions.Kernels.dtw(as(i), bs(j), -1)
    var t0 = System.nanoTime()
    for (i <- 0 until 1000; j <- 0 until 1000) s += graft.functions.Kernels.dtw(as(i), bs(j), -1)
    println(f"[kb] dtw unconstrained: ${(System.nanoTime()-t0)/1e9}%.2fs / 1M pairs")
    t0 = System.nanoTime()
    for (i <- 0 until 1000; j <- 0 until 1000) s += graft.functions.Kernels.dtw(as(i), bs(j), 8)
    println(f"[kb] dtw band=8: ${(System.nanoTime()-t0)/1e9}%.2fs / 1M pairs")
    for (i <- 0 until 300; j <- 0 until 300) s += graft.functions.Kernels.fastdtw(as(i), bs(j), 1)
    t0 = System.nanoTime()
    for (i <- 0 until 1000; j <- 0 until 1000) s += graft.functions.Kernels.fastdtw(as(i), bs(j), 1)
    println(f"[kb] fastdtw r=1: ${(System.nanoTime()-t0)/1e9}%.2fs / 1M pairs")
    t0 = System.nanoTime()
    for (i <- 0 until 1000; j <- 0 until 1000) s += graft.functions.Kernels.euclidean(as(i), bs(j))
    println(f"[kb] euclidean: ${(System.nanoTime()-t0)/1e9}%.2fs / 1M pairs")
    println("[kb] " + s)
  }
}
