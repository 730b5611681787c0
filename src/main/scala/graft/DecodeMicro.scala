package graft

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong
import graft.operators.Multimodal
import graft.sources.ImageFixture

/** Dev-only: pure-JVM (no Spark) decode throughput at 1/8/32 threads —
  * isolates javax.imageio thread-scaling from Spark effects. */
object DecodeMicro {
  def main(args: Array[String]): Unit = {
    val n = 4000
    val rows = (0L until n).map(ImageFixture.row)
    val which = if (args.nonEmpty) args(0) else "all"
    val payloads = (which match {
      case "png" => rows.filter(_.fmt == "png")
      case "jpeg" => rows.filter(_.fmt == "jpeg")
      case _ => rows
    }).map(_.bytes).toArray
    println(s"[micro] format=$which payloads=${payloads.length}")
    // warmup
    payloads.foreach(b => Multimodal.decode(b))
    for (threads <- Seq(1, 8, 32)) {
      val pool = Executors.newFixedThreadPool(threads)
      val done = new AtomicLong()
      val reps = if (threads >= 32) 64 else 8 * threads
      val t0 = System.nanoTime()
      (0 until threads).foreach { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var r = 0
            while (r < reps) {
              var i = t
              while (i < payloads.length) {
                val info = Multimodal.payloadInfo(payloads(i))
                done.addAndGet(info._1.toLong)
                i += threads
              }
              r += 1
            }
          }
        })
      }
      pool.shutdown()
      pool.awaitTermination(600, TimeUnit.SECONDS)
      val sec = (System.nanoTime() - t0) / 1e9
      val total = n.toLong * reps
      println(f"[micro] threads=$threads%2d decodes=$total time=$sec%.2f s rate=${total / sec}%.0f/s per-thread=${total / sec / threads}%.0f/s")
    }
  }
}
