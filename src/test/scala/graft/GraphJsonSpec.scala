package graft

import graft.kg.io.{GraphJsonWriter, RefGraphJson}
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip of the reference's graph JSON format: parse a published case,
  * write it back through GraphJsonWriter, re-parse, and assert the modeled
  * fields survive unchanged; plus our own extracted graphs export as valid
  * schema-v2.1 documents that our reader accepts. */
class GraphJsonSpec extends AnyFunSuite {

  private val sample = new java.io.File("/root/reference/iltur_graphs/1950_10.json")

  test("published graph round-trips through write + parse on modeled fields") {
    assume(sample.isFile)
    val g = RefGraphJson.parseFile(sample.getPath)
    val json = GraphJsonWriter.toJson(g.caseId, g.nodes, g.edges,
      g.justificationSets, g.chains, g.qualityTier, g.validationWarnings)
    val g2 = RefGraphJson.parse(json)
    assert(g2.caseId == g.caseId)
    // nodes: id/type/anchor spans and typed fields that both sides model
    val nk = (n: graft.kg.model.Node) =>
      (n.id, n.nodeType, Option(n.anchor).map(a => (a.startChar, a.endChar)),
        Option(n.conceptId), Option(n.actor), Option(n.factType),
        Option(n.treatment), Option(n.courtFinding), Option(n.resolvesIssue),
        n.isRatio, Option(n.caseName), Option(n.citation))
    assert(g2.nodes.map(nk) == g.nodes.map(nk))
    // edges byte-relevant fields
    val ek = (e: graft.kg.model.EdgeRow) =>
      (e.id, e.source, e.target, e.relation, e.confidence, e.strength,
        e.isCritical, e.supportGroupIds, Option(e.explanation))
    assert(g2.edges.map(ek) == g.edges.map(ek))
    // justification sets + chains byte-for-byte on modeled fields
    assert(g2.justificationSets == g.justificationSets)
    val ck = (c: graft.kg.model.ChainRow) =>
      (c.id, c.issueId, c.holdingId, c.factIds, c.conceptIds, c.argumentIds,
        c.edgeIds, Option(c.justificationSetId), c.criticalNodes, c.narrative)
    assert(g2.chains.map(ck) == g.chains.map(ck))
    assert(g2.qualityTier == g.qualityTier)
    assert(g2.validationWarnings == g.validationWarnings)
  }

  test("extracted graphs export as reference-format documents our reader accepts") {
    val turns = Seq(
      0 -> "The petitioner contends that the order violates the principles of natural justice.",
      1 -> "As held in A.K. Kraipak v. Union of India, AIR 1970 SC 150, fairness is required.",
      2 -> "The question is whether the order can be sustained.",
      3 -> "We hold that the order cannot be sustained.",
      4 -> "The appeal is allowed.")
    val g = graft.kg.extract.DocExtractor.extract("case_x", turns)
    val json = GraphJsonWriter.toJson(g.summary.convId, g.nodes, g.edges,
      g.justificationSets, g.chains, g.summary.qualityTier, g.warnings)
    val back = RefGraphJson.parse(json)
    assert(back.caseId == "case_x")
    assert(back.nodes.map(_.id).toSet == g.nodes.map(_.id).toSet)
    assert(back.edges.map(e => (e.source, e.relation, e.target)) ==
      g.edges.map(e => (e.source, e.relation, e.target)))
    assert(back.qualityTier == g.summary.qualityTier)
    // the exported document passes our full validation, like the reference's
    assert(graft.kg.extract.GraphAssembly.validateGraph(
      back.nodes, back.edges, back.justificationSets).isEmpty)
  }
}
