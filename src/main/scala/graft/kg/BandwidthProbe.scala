package graft.kg

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/** Hardware thread-scaling envelope for interpreting PureScale/chain
  * efficiency numbers: runs (a) a register-only compute kernel (xorshift
  * mix — no memory traffic) and (b) a streaming-read kernel (64 MB/thread
  * working set, one long per cache line) at each thread count, reporting
  * per-thread efficiency vs the 2-thread baseline.
  *
  * Round-5 measurements on this box (32 vCPU Firecracker, /proc MHz
  * pinned): compute ~0.93 at 32 threads (mild all-core throttle),
  * streaming ~0.34 (memory bandwidth saturates near 174 GB/s), G1 pauses
  * ~2.6 % of wall in the extractor workload — so the extractor's 32-thread
  * efficiency sits between the two envelopes according to its bytes-touched
  * per conversation, and cutting allocation moves it toward the compute
  * envelope. A real cluster adds MACHINES (each with its own memory
  * controllers), so neither ceiling applies to the N-vs-4N-executor rule.
  */
object BandwidthProbe {
  def main(args: Array[String]): Unit = {
    val threadCounts = if (args.nonEmpty) args.map(_.toInt).toList else List(2, 8, 32)

    def compute(seed: Long, iters: Long): Long = {
      var h = seed
      var i = 0L
      while (i < iters) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17; h *= 0x9E3779B97F4A7C15L
        i += 1
      }
      h
    }

    def runLevel(t: Int, body: Int => Long): Double = {
      val pool = Executors.newFixedThreadPool(t)
      val sink = new AtomicLong()
      val t0 = System.nanoTime()
      for (w <- 0 until t) pool.execute(() => sink.addAndGet(body(w)))
      pool.shutdown()
      pool.awaitTermination(1, TimeUnit.HOURS)
      (System.nanoTime() - t0) / 1e9
    }

    println("--- compute kernel (register-only) ---")
    val iters = 600_000_000L
    compute(1, 50_000_000L) // warm/JIT
    var base = 0.0
    for (t <- threadCounts) {
      val sec = runLevel(t, w => compute(w.toLong, iters))
      val rate = t * iters / sec
      if (t == threadCounts.head) base = rate / t
      println(f"threads=$t%2d  ${rate / 1e9}%6.2f Gops/s  eff=${rate / t / base}%.3f")
    }

    println("--- streaming-read kernel (64 MB/thread, 1 long per line) ---")
    val mb = 64
    val reps = 40
    base = 0.0
    for (t <- threadCounts) {
      val arrs = Array.fill(t)(Array.tabulate(mb * 131072)(_.toLong))
      val sec = runLevel(t, w => {
        val arr = arrs(w)
        var s = 0L
        var r = 0
        while (r < reps) {
          var i = 0
          while (i < arr.length) { s += arr(i); i += 8 }
          r += 1
        }
        s
      })
      val gbps = t.toLong * reps * mb / 1024.0 / sec
      if (t == threadCounts.head) base = gbps / t
      println(f"threads=$t%2d  $gbps%6.1f GB/s touched  eff=${gbps / t / base}%.3f")
    }
  }
}
