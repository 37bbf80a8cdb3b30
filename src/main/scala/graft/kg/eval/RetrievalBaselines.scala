package graft.kg.eval

import com.fasterxml.jackson.databind.JsonNode
import graft.kg.query.CaseRetrieval
import scala.jdk.CollectionConverters._

/** Concept-retrieval benchmark harness — the deterministic pipeline of the
  * reference's eval_retrieval_baselines.py:
  *
  *  - concept collection with graded relevance + first-seen metadata
  *    (eval_retrieval_baselines.py:187-233);
  *  - query selection (3 ≤ df ≤ corpus/2, df-descending, stable ties,
  *    :235-244), query-text assembly (:247-270) and binary/graded qrels
  *    (:273-289);
  *  - concept-set retrieval scores via exact/fuzzy concept match (:417-470)
  *    — reuses CaseRetrieval's token normalization (same grammar);
  *  - reciprocal rank fusion (:395-413);
  *  - nDCG@k / AP / P@k and the per-method evaluation (:475-568).
  *
  * Fixture-exact vs the published script on 80 published graphs
  * (scripts/gen_retrievalbaselines_fixture.py). ONE documented deviation:
  * ranking ties. The reference perturbs scores with 1e-10 seed-42 noise and
  * numpy's unstable argsort; this port ranks by (−score, index) — a stable,
  * engine-independent total order. The fixture is generated with the noise
  * zeroed and a stable argsort, so tie ORDER (never any score) is the only
  * difference from a verbatim run. [[bm25Okapi]] implements the public
  * BM25Okapi algorithm the reference imports from rank_bm25 (not in this
  * container): Robertson idf with the ε·avg-idf floor for negative values.
  */
object RetrievalBaselines {

  val RelevanceGrade: Map[String, Int] =
    Map("central" -> 3, "supporting" -> 2, "mentioned" -> 1, "obiter" -> 1)

  final case class ConceptInfo(
      df: Int,
      cases: Map[Int, Int],            // doc index -> max grade
      unlistedLabel: Option[String],
      unlistedDescription: Option[String],
      interpretation: Option[String])

  private def arr(g: JsonNode, f: String): Seq[JsonNode] = {
    val a = g.path(f)
    if (!a.isArray) Nil else a.elements().asScala.toSeq
  }

  private def str(n: JsonNode, f: String): Option[String] = {
    val v = n.path(f)
    if (v.isTextual) Some(v.asText()) else None
  }

  /** collect_concepts (:187-233): insertion order preserved (select_queries'
    * stable df sort observes it). */
  def collectConcepts(graphs: Seq[JsonNode]): Vector[(String, ConceptInfo)] = {
    final case class Mut(var df: Int, cases: scala.collection.mutable.LinkedHashMap[Int, Int],
                         var label: Option[String], var desc: Option[String],
                         var interp: Option[String])
    val info = scala.collection.mutable.LinkedHashMap.empty[String, Mut]
    for ((g, idx) <- graphs.zipWithIndex) {
      val seenInCase = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      for (c <- arr(g, "concepts"); cid <- str(c, "concept_id") if cid.nonEmpty) {
        val grade = RelevanceGrade.getOrElse(str(c, "relevance").getOrElse("mentioned"), 1)
        seenInCase(cid) = math.max(seenInCase.getOrElse(cid, 0), grade)
        val m = info.getOrElseUpdate(cid,
          Mut(0, scala.collection.mutable.LinkedHashMap.empty, None, None, None))
        def firstSeen(cur: Option[String], f: String): Option[String] =
          cur.orElse(str(c, f).map(_.trim).filter(_.nonEmpty))
        m.label = firstSeen(m.label, "unlisted_label")
        m.desc = firstSeen(m.desc, "unlisted_description")
        m.interp = firstSeen(m.interp, "interpretation")
      }
      for ((cid, grade) <- seenInCase) {
        val m = info(cid)
        m.df += 1
        m.cases(idx) = math.max(m.cases.getOrElse(idx, 0), grade)
      }
    }
    info.iterator.map { case (cid, m) =>
      cid -> ConceptInfo(m.df, m.cases.toMap, m.label, m.desc, m.interp)
    }.toVector
  }

  /** select_queries (:235-244): stable df-descending sort. */
  def selectQueries(concepts: Vector[(String, ConceptInfo)], nCorpus: Int,
                    nQueries: Int = 50): Vector[(String, ConceptInfo)] = {
    val maxDf = nCorpus / 2
    concepts.filter { case (_, i) => i.df >= 3 && i.df <= maxDf }
      .sortBy { case (_, i) => -i.df }
      .take(nQueries)
  }

  /** build_query_text (:247-270). */
  def buildQueryText(cid: String, info: ConceptInfo): String = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    info.unlistedLabel.foreach(parts += _)
    info.unlistedDescription.foreach(parts += _)
    if (parts.isEmpty) {
      val clean = (if (cid.startsWith("UNLISTED_")) cid.substring(9) else cid)
        .replace("_", " ")
      parts += clean
    }
    info.interpretation.foreach(i => parts += i.take(200))
    parts.mkString(" ")
  }

  /** build_qrels (:273-289). */
  def buildQrels(queries: Seq[(String, ConceptInfo)], binary: Boolean): Seq[Map[Int, Int]] =
    queries.map { case (_, info) =>
      info.cases.map { case (idx, grade) => idx -> (if (binary) 1 else grade) }
    }

  /** run_concept_set (:417-470). */
  def conceptSetScores(queries: Seq[(String, ConceptInfo)],
                       graphs: Seq[JsonNode],
                       fuzzyThreshold: Double = 0.25): Array[Array[Double]] = {
    val caseConceptData: Seq[Seq[(String, Set[String], Int)]] = graphs.map { g =>
      val seen = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      for (c <- arr(g, "concepts"); cid <- str(c, "concept_id") if cid.nonEmpty) {
        val grade = RelevanceGrade.getOrElse(str(c, "relevance").getOrElse("mentioned"), 1)
        seen(cid) = math.max(seen.getOrElse(cid, 0), grade)
      }
      seen.iterator.map { case (cid, grade) =>
        (cid, CaseRetrieval.normalizeConceptTokens(cid), grade)
      }.toSeq
    }
    queries.map { case (queryCid, _) =>
      val queryTokens = CaseRetrieval.normalizeConceptTokens(queryCid)
      caseConceptData.map { entries =>
        var best = 0.0
        for ((cid, tokens, grade) <- entries) {
          if (cid == queryCid) best = math.max(best, grade.toDouble)
          else {
            val sim = CaseRetrieval.fuzzyTokenJaccard(queryTokens, tokens)
            if (sim >= fuzzyThreshold) best = math.max(best, grade * sim)
          }
        }
        best
      }.toArray
    }.toArray
  }

  /** Stable descending ranking: by (−score, index) — the engine-independent
    * total order (see the tie-handling note in the object doc). */
  def rankDesc(scores: Array[Double]): Array[Int] =
    scores.indices.sortBy(i => (-scores(i), i)).toArray

  /** run_rrf (:395-413): RRF score = Σ 1/(k + rank + 1) over both rankings. */
  def rrf(a: Array[Array[Double]], b: Array[Array[Double]], k: Int = 60): Array[Array[Double]] =
    a.indices.map { qi =>
      val nDocs = a(qi).length
      val posA = new Array[Int](nDocs); val posB = new Array[Int](nDocs)
      for ((doc, rank) <- rankDesc(a(qi)).zipWithIndex) posA(doc) = rank
      for ((doc, rank) <- rankDesc(b(qi)).zipWithIndex) posB(doc) = rank
      Array.tabulate(nDocs)(d => 1.0 / (k + posA(d) + 1) + 1.0 / (k + posB(d) + 1))
    }.toArray

  /** dcg_at_k (:475-481). */
  def dcgAtK(relevances: Seq[Double], k: Int = 10): Double =
    relevances.take(k).zipWithIndex.map { case (r, i) =>
      r / (math.log(i + 2) / math.log(2))
    }.sum

  /** ndcg_at_k (:484-496). */
  def ndcgAtK(rankingRels: Seq[Double], qrelGraded: Map[Int, Int], k: Int = 10): Double = {
    val actual = dcgAtK(rankingRels, k)
    val ideal = dcgAtK(qrelGraded.values.toSeq.map(_.toDouble).sorted.reverse, k)
    if (ideal == 0.0) 0.0 else actual / ideal
  }

  /** average_precision (:499-510). */
  def averagePrecision(ranking: Seq[Int], qrelBinary: Map[Int, Int]): Double = {
    if (qrelBinary.isEmpty) return 0.0
    var hits = 0; var sumPrec = 0.0
    for ((doc, i) <- ranking.zipWithIndex if qrelBinary.contains(doc)) {
      hits += 1
      sumPrec += hits.toDouble / (i + 1)
    }
    sumPrec / qrelBinary.size
  }

  /** precision_at_k (:513-517). */
  def precisionAtK(ranking: Seq[Int], qrelBinary: Map[Int, Int], k: Int = 10): Double =
    ranking.take(k).count(qrelBinary.contains).toDouble / k

  final case class QueryMetrics(ndcg: Double, ap: Double, p10: Double)
  final case class MethodEval(perQuery: Seq[QueryMetrics],
                              meanNdcg: Double, meanAp: Double, meanP10: Double)

  /** evaluate_method (:520-568) with the stable tie order. */
  def evaluateMethod(scores: Array[Array[Double]], qrelsBinary: Seq[Map[Int, Int]],
                     qrelsGraded: Seq[Map[Int, Int]], k: Int = 10): MethodEval = {
    val per = scores.indices.map { qi =>
      val ranked = rankDesc(scores(qi)).toSeq
      val rankingRels = ranked.take(k).map(idx => qrelsGraded(qi).getOrElse(idx, 0).toDouble)
      QueryMetrics(
        ndcgAtK(rankingRels, qrelsGraded(qi), k),
        averagePrecision(ranked, qrelsBinary(qi)),
        precisionAtK(ranked, qrelsBinary(qi), k))
    }
    MethodEval(per,
      per.map(_.ndcg).sum / per.size,
      per.map(_.ap).sum / per.size,
      per.map(_.p10).sum / per.size)
  }

  /** The public BM25Okapi scoring the reference imports from rank_bm25
    * (:309-320; library not in this container): k1/b defaults 1.5/0.75,
    * Robertson idf ln((N−df+0.5)/(df+0.5)) with negative values floored to
    * ε·avg(idf), whitespace-lowercase tokens like the reference's prep. */
  def bm25Okapi(docTexts: Seq[String], queryTexts: Seq[String],
                k1: Double = 1.5, b: Double = 0.75,
                epsilon: Double = 0.25): Array[Array[Double]] = {
    val docs = docTexts.map(_.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
    val n = docs.size
    val docLens = docs.map(_.size.toDouble)
    val avgdl = docLens.sum / n
    val freqs = docs.map(_.groupBy(identity).map { case (t, xs) => t -> xs.size })
    val df = scala.collection.mutable.HashMap.empty[String, Int]
    for (f <- freqs; t <- f.keys) df(t) = df.getOrElse(t, 0) + 1
    val rawIdf = df.map { case (t, d) => t -> math.log((n - d + 0.5) / (d + 0.5)) }
    val avgIdf = rawIdf.values.sum / rawIdf.size
    val idf = rawIdf.map { case (t, v) => t -> (if (v < 0) epsilon * avgIdf else v) }.toMap
    queryTexts.map { qt =>
      val qTokens = qt.toLowerCase.split("\\s+").filter(_.nonEmpty)
      Array.tabulate(n) { d =>
        qTokens.map { t =>
          val f = freqs(d).getOrElse(t, 0).toDouble
          if (f == 0) 0.0
          else idf.getOrElse(t, 0.0) * f * (k1 + 1) /
            (f + k1 * (1 - b + b * docLens(d) / avgdl))
        }.sum
      }
    }.toArray
  }
}
