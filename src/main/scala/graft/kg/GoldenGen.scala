package graft.kg
import graft.kg.extract.DocExtractor
import graft.kg.gen.TranscriptGen
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val sb = new StringBuilder("[\n")
    var first = true
    for (i <- 0 until 10) {
      val cid = f"conv_$i%06d"
      val g = DocExtractor.extract(cid, TranscriptGen.conversation(cid, 14).map(t => (t.turn_idx, t.text)))
      for (e <- g.edges) {
        if (!first) sb.append(",\n")
        first = false
        sb.append(s"""  ["$cid","${e.source}","${e.relation}","${e.target}"]""")
      }
    }
    sb.append("\n]\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/golden_triples.json"), sb.toString)
    println("written " + sb.count(_ == '[') + " entries")
  }
}
