package graft

import graft.kg.ontology.Ontology
import graft.kg.rules.{Citations, Relations}
import org.scalatest.funsuite.AnyFunSuite

class RulesSpec extends AnyFunSuite {

  // --- relations -------------------------------------------------------------
  test("relation normalization: aliases + collapse") {
    assert(Relations.normalize("Claims-Satisfies  ") == "claims_satisfies")
    assert(Relations.normalize("claim_satisfies") == "claims_satisfies")
    assert(Relations.normalize("supports argument") == "supports_arg")
    assert(Relations.normalize("conflicts") == "conflicts_with")
    assert(Relations.normalize(null) == "")
  }

  test("relation coercion heuristics land in the enum") {
    assert(Relations.coerce("partially satisfied the test") == "partially_satisfies")
    assert(Relations.coerce("contradicts entirely") == "conflicts_with")
    assert(Relations.coerce("led to the result") == "contributes_to")
    assert(Relations.coerce("gibberish") == "supports")
    for (junk <- List("xyz", "negated by", "resolver", "determinative"))
      assert(Relations.ValidRelations.contains(Relations.coerce(junk)))
  }

  test("node type from id: longest prefix first") {
    assert(Relations.nodeTypeFromId("js1") == "justification_set")
    assert(Relations.nodeTypeFromId("j1") == "unknown")
    assert(Relations.nodeTypeFromId("rc_i1_h1") == "reasoning_chain")
    assert(Relations.nodeTypeFromId("f12") == "fact")
    assert(Relations.nodeTypeFromId("h1") == "holding")
    assert(Relations.nodeTypeFromId("outcome") == "outcome")
    assert(Relations.nodeTypeFromId("c_x") == "concept")
    assert(Relations.nodeTypeFromId("zz") == "unknown")
  }

  test("matrix validation") {
    assert(Relations.validate("f1", "c1", "triggers")._1)
    assert(!Relations.validate("f1", "c1", "resolves")._1)
    assert(Relations.validate("h1", "outcome", "determines")._1)
    assert(!Relations.validate("outcome", "h1", "determines")._1)
  }

  test("repair flips direction when only reverse pair is supported") {
    // outcome -> holding unsupported; holding -> outcome supported
    val Some((s, t, r, note)) = Relations.repair("outcome", "h1", "determines")
    assert(s == "h1" && t == "outcome" && r == "determines")
    assert(note.contains("flipped"))
  }

  test("repair maps drifted relations and downgrades to preference order") {
    val Some((_, _, r1, _)) = Relations.repair("h1", "i1", "explains")
    assert(r1 == "addresses")
    val Some((_, _, r2, _)) = Relations.repair("f1", "c1", "fails")
    assert(r2 == "triggers") // pair-specific fallback
  }

  // --- citations -------------------------------------------------------------
  test("indian citation patterns with offsets") {
    val text = "As held in Maneka Gandhi, AIR 1978 SC 597 and (2017) 9 SCC 1; see MANU/SC/0133/1978."
    val hits = Citations.extract(text, "in")
    val types = hits.map(_.citationType).toSet
    assert(types == Set("air", "scc", "manu"))
    for (h <- hits) assert(text.substring(h.startChar, h.endChar).trim == h.citation)
    assert(hits.find(_.citationType == "air").get.caseYear.contains(1978))
  }

  test("echr case-v pattern extracts case name") {
    val text = "In Selmouni v. France [GC], no. 25803/94, the Court held that Article 3 applies."
    val hits = Citations.extract(text, "echr")
    val cv = hits.find(_.citationType == "echr_case_v")
    assert(cv.isDefined)
    assert(cv.get.caseName.contains("Selmouni v. France"))
  }

  test("overlap dedup keeps the longest span") {
    import graft.kg.rules.CitationHit
    val hits = List(
      CitationHit("a", 0, 10, "x", None, None),
      CitationHit("b", 5, 8, "y", None, None),
      CitationHit("c", 12, 20, "z", None, None))
    val out = Citations.dedupeOverlapping(hits)
    assert(out.map(_.citation) == List("a", "c"))
  }

  test("turkish kanun + esas patterns") {
    val text = "5237 sayılı Kanun uyarınca, E. 2018/123, K. 2019/456 sayılı karar."
    val hits = Citations.extract(text, "tr")
    assert(hits.exists(_.citationType == "tr_kanun"))
  }

  // --- ontology --------------------------------------------------------------
  test("ontology loads with 54 concepts and 32 patterns") {
    val o = Ontology.default
    assert(o.concepts.size == 54)
    assert(o.patterns.size == 32)
    val bs = o.concepts("DOCTRINE_BASIC_STRUCTURE")
    assert(bs.logic == "and")
    assert(bs.requires.size == 2)
    assert(bs.keyPhrases.contains("emasculate basic features"))
    assert(bs.establishingCases.exists(_.startsWith("Kesavananda")))
  }

  test("key phrase parsing prefers quoted, falls back to commas") {
    assert(Ontology.parseKeyPhrases("\"a b\", \"c d\"") == List("a b", "c d"))
    assert(Ontology.parseKeyPhrases("a b, c d") == List("a b", "c d"))
    assert(Ontology.parseKeyPhrases("") == Nil)
  }

  test("requires normalization handles [AND]/[OR] and numbered strings") {
    assert(Ontology.normalizeRequires(List("[OR]", "x", "y"))._1 == "or")
    assert(Ontology.normalizeRequires(List("[AND]", "x"))._2 == List("x"))
    assert(Ontology.normalizeRequires("1. first req\n2. second req")._2.size == 2)
    assert(Ontology.normalizeRequires("[OR] a; b") == ("or", List("a", "b")))
    assert(Ontology.normalizeRequires(null) == ("and", Nil))
  }

  test("concept match score: key phrase beats keyword overlap") {
    val c = Ontology.default.concepts("DOCTRINE_NATURAL_JUSTICE_AUDI_ALTERAM_PARTEM")
    val withPhrase = Ontology.conceptMatchScore(
      "The petitioner was given no fair opportunity to answer the charges", c)
    val without = Ontology.conceptMatchScore("The weather was pleasant that day", c)
    assert(withPhrase >= 5)
    assert(without == 0)
  }

  test("establishing case containment scores +8") {
    val c = Ontology.default.concepts("DOCTRINE_BASIC_STRUCTURE")
    val s = Ontology.conceptMatchScore(
      "Following Kesavananda Bharati v. State of Kerala (1973) the amendment fails", c)
    assert(s >= 8)
  }

  test("bestConceptMatch: exact, substring, guard, fuzzy") {
    val cs = Ontology.default.concepts
    assert(Ontology.bestConceptMatch("DOCTRINE_BASIC_STRUCTURE", "", cs)
      .contains("DOCTRINE_BASIC_STRUCTURE"))
    assert(Ontology.bestConceptMatch("DOCTRINE_NATURAL_JUSTICE", "", cs)
      .contains("DOCTRINE_NATURAL_JUSTICE_AUDI_ALTERAM_PARTEM"))
    assert(Ontology.bestConceptMatch("CONST_ART21", "life and liberty", cs).isEmpty)
  }

  test("signal patterns have matchable phrases") {
    val o = Ontology.default
    assert(o.patterns("primary_holding").matchablePhrases.contains("we hold that"))
    // placeholder signals reduce to their longest literal segment
    val fp = o.patterns("following_precedent").matchablePhrases
    assert(fp.contains("as held in"))
    assert(fp.exists(_.contains("the principle laid down in")))
  }

  test("actor normalization follows the reference alias map (V4)") {
    import graft.kg.rules.Actors
    assert(Actors.normalizeActor("Union of India") == "respondent")
    assert(Actors.normalizeActor("Writ-Petitioner") == "petitioner")
    assert(Actors.normalizeActor("High Court") == "lower_court")
    assert(Actors.normalizeActor("Amicus Curiae") == "amicus")
    assert(Actors.normalizeActor(null) == null)
    assert(Actors.normalizeActor("  ") == null)
  }

  test("actor coercion heuristics and fallbacks (V4)") {
    import graft.kg.rules.Actors
    assert(Actors.coerceActor("State Electricity Board") == "respondent")
    assert(Actors.coerceActor("the writ applicant") == "petitioner")
    assert(Actors.coerceActor("appellate side") == "appellant")
    assert(Actors.coerceActor("sessions judge") == "lower_court")
    assert(Actors.coerceActor("division bench") == "court")
    assert(Actors.coerceActor("random stranger") == "third_party")
    assert(Actors.coerceActor(null, default = "court") == "court")
    assert(Actors.coerceActor("grand_chamber",
      extraAliases = Map("grand_chamber" -> "court")) == "court")
  }

  test("argument scheme normalization and enum clamp (V3)") {
    import graft.kg.rules.Actors
    assert(Actors.normalizeScheme("Textual Interpretation") == "textual")
    assert(Actors.normalizeScheme("audi-alteram-partem") == "natural_justice")
    assert(Actors.normalizeScheme("precedent_distinguishing") == "precedent_distinction")
    assert(Actors.coerceScheme("made_up_scheme") == "other")
    assert(Actors.ArgumentSchemes.size == 19)
    assert(Actors.coerceScheme(null) == null)
  }

  test("rule-extracted arguments carry actor + scheme (V3/V4 wiring)") {
    val turns = Seq(
      0 -> "The petitioner contends that the order violates natural justice and audi alteram partem.",
      1 -> "The Union of India submits that the measure is proportionate.",
      2 -> "The question is whether the restriction is reasonable.",
      3 -> "We hold that the restriction fails the proportionality test.",
      4 -> "The appeal is allowed.")
    val g = graft.kg.extract.DocExtractor.extract("v34", turns, Ontology.default, "in")
    val args = g.nodes.filter(_.nodeType == "argument")
    assert(args.nonEmpty)
    assert(args.forall(a => graft.kg.rules.Actors.ActorTypes.contains(a.actor)))
    assert(args.forall(a => a.schemes != null && a.schemes.nonEmpty &&
      a.schemes.forall(graft.kg.rules.Actors.ArgumentSchemes.contains)))
    assert(args.forall(a => a.claim == a.text))
    val byActor = args.map(a => a.actor).toSet
    assert(byActor.contains("petitioner"))
    val schemes = args.flatMap(_.schemes).toSet
    assert(schemes.contains("natural_justice"))
  }
}
