package graft.kg
import graft.kg.gen.TranscriptGen
import graft.kg.extract.DocExtractor
import graft.kg.text.{Segmenter, Normalize}
import graft.kg.rules.Citations
object Prof {
  def main(args: Array[String]): Unit = {
    val convs = (0 until 3000).map(i => f"conv_$i%06d")
    val turnsets = convs.map(c => c -> TranscriptGen.conversation(c, 14).map(t => (t.turn_idx, t.text)))
    // warm
    turnsets.take(500).foreach { case (c, t) => DocExtractor.extract(c, t) }
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-22s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    time("full extract x5") { (1 to 5).foreach(_ => turnsets.foreach { case (c, t) => DocExtractor.extract(c, t) }) }
    val texts = turnsets.map { case (c, t) => DocExtractor.assemble(t) }
    time("segment only") { texts.foreach(t => Segmenter.segment(t, "x")) }
    time("citations only") { texts.foreach(t => Citations.extract(t, "in")) }
    val docs = texts.map(t => Segmenter.segment(t, "x"))
    val ont = graft.kg.ontology.Ontology.default
    val patterns = ont.patterns.toList.sortBy(_._1)
    val phrases = patterns.flatMap(_._2.matchablePhrases)
    println("n pattern phrases: " + phrases.size)
    time("signal scan only") {
      docs.foreach { d => d.sentences.foreach { s =>
        val low = s.text.toLowerCase(java.util.Locale.ROOT)
        patterns.foreach { case (n, p) => p.matchablePhrases.foreach(ph => low.contains(ph)) }
      }}}
    val scan = ont.concepts.toList.sortBy(_._1).map { case (cid, c) => (cid, c.keyPhrasesLower.filter(_.length>=4), c.establishingCasesNorm) }
    time("concept scan only") {
      docs.foreach { d => d.sentences.foreach { s =>
        val low = s.text.toLowerCase(java.util.Locale.ROOT)
        scan.foreach { case (cid, ps, cs) =>
          var m = false
          ps.foreach(ph => if (low.indexOf(ph) >= 0) m = true)
          if (!m) cs.foreach(cn => low.indexOf(cn))
        }}}}
  }
}
