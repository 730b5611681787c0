package graft

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/** Dev-only: allocation-free, JNI-free JVM compute scaling probe. */
object CpuMicro {
  def main(args: Array[String]): Unit = {
    def work(iters: Long): Double = {
      var x = 1.00000001
      var i = 0L
      while (i < iters) { x = x * 1.0000001 % 3.7 + 0.1; i += 1 }
      x
    }
    work(10000000L) // warmup JIT
    for (threads <- Seq(1, 8, 32); rep <- 1 to 3) {
      val pool = Executors.newFixedThreadPool(threads)
      val sink = new AtomicLong()
      val perThread = 80000000L
      val t0 = System.nanoTime()
      (0 until threads).foreach { _ =>
        pool.submit(new Runnable {
          def run(): Unit = sink.addAndGet(work(perThread).toLong)
        })
      }
      pool.shutdown(); pool.awaitTermination(600, TimeUnit.SECONDS)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[cpu] threads=$threads%2d rep$rep time=$sec%.2f s (ideal: constant)")
    }
  }
}
