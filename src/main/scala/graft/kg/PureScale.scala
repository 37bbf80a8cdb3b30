package graft.kg

import graft.kg.extract.DocExtractor
import graft.kg.gen.TranscriptGen
import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/** Thread-scaling diagnostic for the pure extractor (no Spark): runs the
  * identical per-conversation workload on T threads for each requested T and
  * reports convs/s plus the per-thread efficiency vs the 1-thread baseline.
  * Separates JVM/algorithmic scaling from the host's all-core frequency and
  * memory-bandwidth ceiling when interpreting the Spark chain's efficiency
  * (BENCH.md). Also samples /proc/cpuinfo MHz under load so the frequency
  * confound of same-box N-vs-4N comparisons is measured, not assumed. */
object PureScale {
  def main(args: Array[String]): Unit = {
    val perThread = args.headOption.map(_.toInt).getOrElse(1500)
    val threadCounts = if (args.length > 1) args.drop(1).map(_.toInt).toList else List(1, 2, 8, 32)

    def mhzSample(): Double = {
      try {
        val src = scala.io.Source.fromFile("/proc/cpuinfo")
        val mhz = src.getLines().filter(_.startsWith("cpu MHz")).map(_.split(":")(1).trim.toDouble).toList
        src.close()
        if (mhz.isEmpty) 0.0 else mhz.sum / mhz.size
      } catch { case _: Exception => 0.0 }
    }

    // warm-up: JIT-compile the whole extraction path before any timing
    for (i <- 0 until 3000) {
      val cid = f"warm_$i%06d"
      val turns = TranscriptGen.conversation(cid, 14).map(x => (x.turn_idx, x.text))
      DocExtractor.extract(cid, turns)
    }

    def round(t: Int): (Double, Long) = {
      val pool = Executors.newFixedThreadPool(t)
      val edges = new AtomicLong()
      val n = perThread * t
      val t0 = System.nanoTime()
      for (w <- 0 until t) pool.execute { () =>
        var i = w * perThread
        val end = i + perThread
        while (i < end) {
          val cid = f"conv_$i%06d"
          val turns = TranscriptGen.conversation(cid, 14).map(x => (x.turn_idx, x.text))
          edges.addAndGet(DocExtractor.extract(cid, turns).edges.size.toLong)
          i += 1
        }
      }
      pool.shutdown()
      pool.awaitTermination(1, TimeUnit.HOURS)
      (n / ((System.nanoTime() - t0) / 1e9), edges.get())
    }

    var base = 0.0
    for (t <- threadCounts) {
      // best of 2 rounds per level: the first round at a new thread count
      // still absorbs allocator/GC ramp-up
      val (r1, e1) = round(t)
      val (r2, e2) = round(t)
      require(e1 == e2, s"nondeterministic extraction: $e1 vs $e2")
      val rate = math.max(r1, r2)
      if (t == threadCounts.head) base = rate / t
      val eff = rate / t / base
      println(f"threads=$t%2d  ${rate}%9.1f convs/s  per-thread-eff-vs-t${threadCounts.head}=$eff%.3f  mhz=${mhzSample()}%6.1f  (edges=$e1)")
    }
  }
}
