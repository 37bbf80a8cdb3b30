package graft

import graft.kg.text.PhraseAutomaton
import org.scalatest.funsuite.AnyFunSuite

/** PhraseAutomaton vs a naive indexOf oracle: the automaton must report
  * exactly the occurrence set a per-phrase indexOf scan finds, including
  * overlapping matches, shared prefixes/suffixes, nested phrases, duplicate
  * phrase entries and non-ASCII (Turkish) characters. */
class PhraseAutomatonSpec extends AnyFunSuite {

  private def naive(text: String, phrases: IndexedSeq[String]): Set[(Int, Int)] = {
    val out = scala.collection.mutable.Set.empty[(Int, Int)]
    for ((p, id) <- phrases.zipWithIndex if p.nonEmpty) {
      var i = text.indexOf(p)
      while (i >= 0) { out += ((id, i)); i = text.indexOf(p, i + 1) }
    }
    out.toSet
  }

  private def scan(a: PhraseAutomaton, text: String): Set[(Int, Int)] = {
    val out = scala.collection.mutable.Set.empty[(Int, Int)]
    a.scan(text, new PhraseAutomaton.Sink {
      def hit(pid: Int, start: Int): Unit = out += ((pid, start))
    })
    out.toSet
  }

  test("finds every occurrence incl. overlaps, nesting and duplicates") {
    val phrases = Vector("he", "she", "his", "hers", "her", "is", "she", "e")
    val a = PhraseAutomaton.build(phrases)
    for (t <- Seq("ushers", "she is his hero", "hershey", "", "xyz", "hhhhers"))
      assert(scan(a, t) == naive(t, phrases), s"text '$t'")
  }

  test("empty phrases never match; single-char and full-text phrases do") {
    val phrases = Vector("", "a", "abcabc")
    val a = PhraseAutomaton.build(phrases)
    val t = "abcabc"
    assert(scan(a, t) == naive(t, phrases))
  }

  test("non-ASCII (Turkish) characters round-trip through the compact alphabet") {
    val phrases = Vector("ölçülülük", "hukuk devleti", "ölç", "devlet")
    val a = PhraseAutomaton.build(phrases)
    val t = "anayasadaki ölçülülük ilkesi ve hukuk devleti; ölçü devletten"
    assert(scan(a, t) == naive(t, phrases))
  }

  test("deterministic pseudo-random cross-check over a tiny alphabet") {
    // tiny alphabet maximizes overlap/fail-path traffic
    val rnd = new scala.util.Random(42)
    for (round <- 0 until 20) {
      val phrases = Vector.fill(12)(
        (0 to rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val a = PhraseAutomaton.build(phrases)
      val text = (0 until 200).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      assert(scan(a, text) == naive(text, phrases), s"round $round phrases=$phrases")
    }
  }
}
