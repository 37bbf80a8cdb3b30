package graft.kg

import graft.kg.extract.DocExtractor
import graft.kg.gen.TranscriptGen

/** JFR target: pure single-thread extraction loop (no Spark). */
private[kg] object PureProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(6000)
    var trip = 0L
    val t0 = System.nanoTime()
    for (i <- 0 until n) {
      val cid = f"conv_$i%06d"
      val turns = TranscriptGen.conversation(cid, 14).map(t => (t.turn_idx, t.text))
      trip += DocExtractor.extract(cid, turns).edges.size
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"$n convs in $sec%.2f s => ${n / sec}%.1f convs/s ($trip edges)")
  }
}
