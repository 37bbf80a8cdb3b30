package graft.kg.extract

import graft.kg.model.{Anchor, EdgeRow, Node}
import graft.kg.rules.Relations
import graft.kg.text.Normalize
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Orphan repair: connect nodes that ended up with no edges via
  * keyword-overlap + anchor-proximity scored candidate edges.
  *
  * Semantics re-expressed from the reference repair engine
  * (repair_orphans.py:324-641): per-type target priorities, default relation
  * per (type,type) pair with direction chosen by matrix membership, keyword
  * overlap gate (0 → no edge), proximity bonuses (<300:+2, <800:+1,
  * <2000:+0.5), type-specific bonuses, connected-candidate +0.5, min score
  * 2.0, ≤2 edges per orphan (runner-up needs ≥3.5), no duplicate signatures,
  * no bidirectional pairs, `e_repair_{n}` ids with confidence=inferred and
  * weak/moderate strength. Legitimate orphans (background facts,
  * mentioned/obiter concepts — repair_orphans.py:256-291) are left alone.
  * Ties are broken by candidate id for parallel determinism.
  */
object OrphanRepair {

  private val DefaultRelations: Map[(String, String), String] = Map(
    ("fact", "argument") -> "supports", ("fact", "holding") -> "supports",
    ("fact", "issue") -> "triggers", ("fact", "concept") -> "triggers",
    ("concept", "issue") -> "addresses", ("concept", "holding") -> "grounds",
    ("concept", "argument") -> "supports", ("concept", "concept") -> "requires",
    ("argument", "issue") -> "addresses", ("argument", "holding") -> "supports",
    ("argument", "argument") -> "responds_to", ("argument", "concept") -> "supports",
    ("precedent", "argument") -> "supports", ("precedent", "holding") -> "supports",
    ("precedent", "concept") -> "supports", ("precedent", "issue") -> "supports",
    ("holding", "issue") -> "addresses", ("holding", "holding") -> "supports",
    ("holding", "concept") -> "grounds", ("holding", "precedent") -> "follows",
    ("issue", "issue") -> "specializes", ("issue", "concept") -> "requires",
    ("issue", "holding") -> "addresses", ("issue", "argument") -> "addresses",
    ("issue", "precedent") -> "addresses")

  private val TargetPriorities: Map[String, List[String]] = Map(
    "fact" -> List("argument", "holding", "issue", "concept"),
    "concept" -> List("issue", "holding", "argument", "concept"),
    "argument" -> List("issue", "holding", "argument", "concept"),
    "precedent" -> List("argument", "holding", "concept", "issue"),
    "issue" -> List("holding", "concept", "argument", "issue", "precedent"),
    "holding" -> List("issue", "holding", "concept", "precedent"))

  private def isLegitimateOrphan(n: Node): Boolean = n.nodeType match {
    case "fact"      => n.factType == "background"
    case "concept"   => n.relevance == "mentioned" || n.relevance == "obiter"
    case "precedent" => false // treatment not tracked pre-edge in v1
    case _           => false
  }

  private def nodeText(n: Node): String =
    List(Option(n.text), Option(n.caseName), Option(n.citation))
      .flatten.mkString(" ")

  private def anchorMid(n: Node): Option[Int] =
    Option(n.anchor).map(a => (a.startChar + a.endChar) / 2)

  /** Returns (repaired edges, warnings). Input edges are assumed deduped. */
  def repair(
      nodes: Vector[Node],
      edges: Vector[EdgeRow],
      minScore: Double = 2.0,
      maxEdgesPerOrphan: Int = 2,
      runnerUpThreshold: Double = 3.5): (Vector[EdgeRow], Vector[String]) = {

    val convId = nodes.headOption.map(_.convId).getOrElse("")
    val eligible = nodes.filter(n => n.nodeType != "outcome")
    val connected: Set[String] =
      edges.iterator.flatMap(e => Iterator(e.source, e.target)).toSet
    val orphans = eligible.filter(n => !connected.contains(n.id))
      .filter(n => nodeText(n).trim.length >= 10)
      .filter(n => !isLegitimateOrphan(n))
      .sortBy(_.id)
    if (orphans.isEmpty) return (edges, Vector.empty)

    val byId: Map[String, Node] = eligible.map(n => n.id -> n).toMap
    val kwCache = mutable.Map.empty[String, Set[String]]
    def kw(n: Node): Set[String] =
      kwCache.getOrElseUpdate(n.id, Normalize.keywordSet(nodeText(n)))

    val existingSigs = mutable.Set.empty[(String, String, String)]
    val connectedPairs = mutable.Set.empty[Set[String]]
    edges.foreach { e =>
      existingSigs += ((e.source, e.target, e.relation))
      connectedPairs += Set(e.source, e.target)
    }

    val newEdges = ArrayBuffer.empty[EdgeRow]
    val warnings = ArrayBuffer.empty[String]
    var counter = 0

    for (orphan <- orphans) {
      val priorities = TargetPriorities.getOrElse(orphan.nodeType, Nil)
      val candidates = ArrayBuffer.empty[(Double, String, String, String, String)]
      for (cand <- eligible if cand.id != orphan.id &&
             priorities.contains(cand.nodeType)) {
        val pair = (orphan.nodeType, cand.nodeType)
        val rev = (cand.nodeType, orphan.nodeType)
        val dirOpt: Option[(String, String, String)] =
          if (Relations.Matrix.contains(pair))
            Some((orphan.id, cand.id, DefaultRelations.getOrElse(pair,
              Relations.Matrix(pair).toList.sorted.head)))
          else if (Relations.Matrix.contains(rev))
            Some((cand.id, orphan.id, DefaultRelations.getOrElse(rev,
              Relations.Matrix(rev).toList.sorted.head)))
          else None
        for ((src, tgt, rel) <- dirOpt) {
          val overlap = kw(orphan).intersect(kw(cand)).size
          if (overlap > 0) {
            var score = overlap.toDouble
            for (om <- anchorMid(orphan); cm <- anchorMid(cand)) {
              val d = math.abs(om - cm)
              if (d < 300) score += 2.0
              else if (d < 800) score += 1.0
              else if (d < 2000) score += 0.5
            }
            if (orphan.nodeType == "argument" && cand.nodeType == "issue" &&
              kw(orphan).intersect(kw(cand)).size >= 3) score += 1.5
            if (orphan.nodeType == "concept" && cand.nodeType == "holding" &&
              cand.resolvesIssue != null) score += 0.5
            if (connected.contains(cand.id)) score += 0.5
            if (score >= minScore)
              candidates += ((score, rel, src, tgt, cand.id))
          }
        }
      }
      val sorted = candidates.sortBy(c => (-c._1, c._5))
      var added = 0
      for ((score, rel, src, tgt, _) <- sorted
           if added < maxEdgesPerOrphan &&
             (added < 1 || score >= runnerUpThreshold)) {
        val sig = (src, tgt, rel)
        val pairKey = Set(src, tgt)
        if (!existingSigs.contains(sig) && !connectedPairs.contains(pairKey)) {
          counter += 1
          newEdges += EdgeRow(
            convId, s"e_repair_$counter", src, tgt, rel,
            confidence = "inferred",
            strength = if (score < 4.0) "weak" else "moderate",
            isCritical = false,
            supportGroupIds = Seq.empty,
            explanation = f"Orphan repair: score=$score%.1f, " +
              s"${Relations.nodeTypeFromId(src)}->${Relations.nodeTypeFromId(tgt)}",
            anchor = null,
            method = "inference",
            repairNote = null)
          existingSigs += sig
          connectedPairs += pairKey
          added += 1
        }
      }
      if (added > 0) warnings += s"orphan ${orphan.id} repaired with $added edge(s)"
    }

    ((edges ++ newEdges).sortBy(e => (e.source, e.target, e.relation, e.id)),
      warnings.toVector)
  }
}
