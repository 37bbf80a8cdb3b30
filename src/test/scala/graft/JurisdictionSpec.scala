package graft

import graft.kg.extract.DocExtractor
import graft.kg.ontology.Ontology
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end extraction over ECHR and Turkish fixture conversations,
  * exercising the M2/M3 citation grammars, the per-jurisdiction ontologies,
  * and the Turkish case-fold path. */
class JurisdictionSpec extends AnyFunSuite {

  test("echr: ontology loads and extraction finds echr citations + concepts") {
    val o = Ontology.echr
    assert(o.concepts.size == 55)
    assert(o.patterns.nonEmpty)
    val turns = Seq(
      0 -> "The applicant complained under Article 3 of the Convention about the conditions of detention.",
      1 -> "In Selmouni v. France [GC], no. 25803/94, the Court held that the Convention is a living instrument.",
      2 -> "The question is whether the treatment attained the minimum level of severity.",
      3 -> "We hold that there has been a violation of Article 3 of the Convention.",
      4 -> "The application is accordingly allowed.")
    val g = DocExtractor.extract("echr_fix", turns, o, jurisdiction = "echr")
    val precedents = g.nodes.filter(_.nodeType == "precedent")
    assert(precedents.nonEmpty)
    assert(precedents.exists(p => Option(p.caseName).exists(_.contains("Selmouni"))))
    assert(g.nodes.exists(_.nodeType == "holding"))
    assert(g.edges.nonEmpty)
  }

  test("turkish: ontology loads and extraction handles turkish citations + fold") {
    val o = Ontology.turkish
    assert(o.concepts.size == 77)
    val turns = Seq(
      0 -> "Başvurucu, 5237 sayılı Kanun uyarınca verilen karar nedeniyle başvuruda bulunmuştur.",
      1 -> "AYM, E.2018/123, K.2019/456 sayılı kararında ölçülülük ilkesini değerlendirmiştir.",
      2 -> "The question is whether the restriction was proportionate.",
      3 -> "We hold that the interference was not proportionate to the aim pursued.",
      4 -> "The appeal is allowed.")
    val g = DocExtractor.extract("tr_fix", turns, o, jurisdiction = "tr")
    val precedents = g.nodes.filter(_.nodeType == "precedent")
    assert(precedents.exists(_.citationType.startsWith("tr_")), precedents.map(_.citationType).toString)
    assert(g.summary.nSentences > 0)
  }

  test("jurisdiction routing") {
    assert(Ontology.forJurisdiction("echr").concepts.size == 55)
    assert(Ontology.forJurisdiction("turkey").concepts.size == 77)
    assert(Ontology.forJurisdiction("in").concepts.size == 54)
  }

  test("turkish fold applies in concept phrase matching") {
    // a concept phrase with dotted-I content must match its upper-case form
    // under the Turkish fold but not under plain ROOT lowering of İ
    val hay = "İDARİ İŞLEMİN İPTALİ"
    assert(graft.kg.text.Normalize.turkishLower(hay) == "idari işlemin iptali")
  }

  test("turkish: digit-free court mentions are found far from any digit") {
    // TrYargitay/TrDanistay are the only TR patterns whose digit groups are
    // optional; the digit-window scan alone would miss a court mention
    // > 200 chars from every number (full-scan semantics must hold)
    val filler = "bu dosya hakkinda uzun bir anlatim yer almaktadir " * 12 // ~600 digit-free chars
    val text = filler + "Yargıtay Ceza Dairesi karari dikkate alinmistir. " +
      filler + "DANIŞTAY Daire gorusu de benzerdir." + filler
    val hits = graft.kg.rules.Citations.extract(text, "tr")
    assert(hits.exists(h => h.citationType == "tr_yargitay"), hits.toString)
    assert(hits.exists(h => h.citationType == "tr_danistay"), hits.toString)
    // offsets are exact against the original text
    for (h <- hits)
      assert(text.substring(h.startChar, h.endChar).trim.startsWith(h.citation.take(8)))
    // and with a digit present, the windows still agree with themselves:
    // the same mention near a digit yields the same citation strings
    val near = "sayi 12345 " + "Yargıtay Ceza Dairesi karari dikkate alinmistir."
    val nearHits = graft.kg.rules.Citations.extract(near, "tr")
    assert(nearHits.exists(_.citationType == "tr_yargitay"))
    // U+017F LONG S: regex CASE_INSENSITIVE|UNICODE_CASE folds 'ſ' to 's',
    // so a digit-free "Danıſtay …" matches a full scan — the stem fold must
    // window it too (the last case-fold equivalence the fold handles)
    val longS = filler + "Danıſtay Daire gorusu de benzerdir." + filler
    val longSHits = graft.kg.rules.Citations.extract(longS, "tr")
    assert(longSHits.exists(_.citationType == "tr_danistay"), longSHits.toString)
  }
}
