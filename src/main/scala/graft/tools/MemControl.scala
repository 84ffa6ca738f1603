package graft.tools

import java.util.concurrent.{Executors, TimeUnit}

/**
 * Memory-bandwidth scaling control — the honest ceiling for a
 * SCAN-HEAVY workload on one shared-memory box. Each thread streams
 * over its own 256 MB long array (sum) so the aggregate demand is
 * `threads × bandwidth`; past the socket's bandwidth the added threads
 * buy nothing. A real 4×-executor cluster multiplies memory bandwidth
 * WITH the executor count, so this control separates "the engine stops
 * scaling" from "one box's memory bus is saturated" — the distinction
 * the pure-CPU control ([[CpuControl]]) cannot make.
 * Run: `sbt "runMain graft.tools.MemControl <threads>"`.
 */
object MemControl {
  def main(a: Array[String]): Unit = {
    val threads = a(0).toInt
    val perThreadLongs = 32 << 20 // 256 MB per thread
    val arrays = Array.fill(threads)(
      Array.tabulate[Long](perThreadLongs)(i => i.toLong))
    val pool = Executors.newFixedThreadPool(threads)
    def once(): Double = {
      val t0 = System.nanoTime()
      val futs = arrays.map { arr =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            var s = 0L
            var pass = 0
            while (pass < 8) { // 8 passes × 256 MB per thread
              var i = 0
              while (i < arr.length) { s += arr(i); i += 1 }
              pass += 1
            }
            s
          }
        })
      }
      futs.foreach(_.get())
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm (page faults, JIT)
    val ts = (1 to 5).map(_ => once())
    val gb = threads.toLong * perThreadLongs * 8L * 8L / 1e9
    println(f"MEMCONTROL threads=$threads best=${ts.min}%.2f " +
      f"bw=${gb / ts.min}%.1f GB/s " +
      s"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    pool.shutdown()
    pool.awaitTermination(1, TimeUnit.SECONDS)
  }
}
