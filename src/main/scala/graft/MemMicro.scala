package graft

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/** Dev-only: memory-bandwidth scaling probe (large-array streaming sum). */
object MemMicro {
  def main(args: Array[String]): Unit = {
    val MB = 1 << 20
    val arrays = (0 until 32).map(_ => Array.fill[Long](32 * MB / 8)(3L)).toArray
    for (threads <- Seq(1, 4, 8, 16, 32); rep <- 1 to 2) {
      val pool = Executors.newFixedThreadPool(threads)
      val sink = new AtomicLong()
      val reps = 6
      val t0 = System.nanoTime()
      (0 until threads).foreach { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var r = 0
            var acc = 0L
            while (r < reps) {
              val a = arrays(t)
              var i = 0
              while (i < a.length) { acc += a(i); i += 1 }
              r += 1
            }
            sink.addAndGet(acc)
          }
        })
      }
      pool.shutdown(); pool.awaitTermination(600, TimeUnit.SECONDS)
      val sec = (System.nanoTime() - t0) / 1e9
      val gb = threads.toLong * reps * 32 / 1024.0
      println(f"[mem] threads=$threads%2d rep$rep ${gb / sec}%6.1f GB/s (${gb}%5.1f GB in $sec%.2f s)")
    }
  }
}
