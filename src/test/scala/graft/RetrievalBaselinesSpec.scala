package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.kg.eval.RetrievalBaselines
import graft.kg.eval.RetrievalBaselines._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** RetrievalBaselines vs the PUBLISHED eval_retrieval_baselines.py,
  * fixture-exact on 80 published graphs
  * (scripts/gen_retrievalbaselines_fixture.py). Tie order is the one
  * documented deviation: the fixture is generated with the reference's
  * 1e-10 tie noise zeroed and a stable argsort, so every score and every
  * non-tie rank matches a verbatim run. */
class RetrievalBaselinesSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private lazy val fx: JsonNode = mapper.readTree(
    getClass.getResourceAsStream("/graft/retrievalbaselines_fixture.json"))

  private lazy val graphs: Seq[JsonNode] =
    fx.path("case_ids").elements().asScala.map(_.asText()).toSeq.map { cid =>
      mapper.readTree(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"/root/reference/iltur_graphs/$cid.json")))
    }

  private def near(a: Double, b: Double, tol: Double = 1e-9) = math.abs(a - b) <= tol

  test("concept collection + query selection + qrels replay exactly") {
    assume(new java.io.File("/root/reference/iltur_graphs").isDirectory)
    val concepts = collectConcepts(graphs)
    val expInfo = fx.path("concept_info")
    assert(concepts.size == expInfo.size())
    for ((cid, info) <- concepts) {
      val e = expInfo.path(cid)
      assert(!e.isMissingNode, cid)
      assert(info.df == e.path("df").asInt(), s"$cid df")
      val expCases = e.path("cases").fields().asScala
        .map(x => x.getKey.toInt -> x.getValue.asInt()).toMap
      assert(info.cases == expCases, s"$cid cases")
      def o(f: String) = if (e.path(f).isNull) None else Some(e.path(f).asText())
      assert(info.unlistedLabel == o("unlisted_label"), s"$cid label")
      assert(info.unlistedDescription == o("unlisted_description"), s"$cid desc")
      assert(info.interpretation == o("interpretation"), s"$cid interp")
    }
    val queries = selectQueries(concepts, graphs.size, nQueries = 25)
    val expQ = fx.path("queries").elements().asScala.toSeq
    assert(queries.size == expQ.size)
    for (((cid, info), e) <- queries.zip(expQ)) {
      assert(cid == e.path("cid").asText())
      assert(info.df == e.path("df").asInt())
    }
    val texts = queries.map { case (cid, info) => buildQueryText(cid, info) }
    val expTexts = fx.path("query_texts").elements().asScala.map(_.asText()).toSeq
    assert(texts == expTexts)
    for ((got, e) <- buildQrels(queries, binary = true)
        .zip(fx.path("qrels_binary").elements().asScala.toSeq)) {
      val exp = e.fields().asScala.map(x => x.getKey.toInt -> x.getValue.asInt()).toMap
      assert(got == exp)
    }
    for ((got, e) <- buildQrels(queries, binary = false)
        .zip(fx.path("qrels_graded").elements().asScala.toSeq)) {
      val exp = e.fields().asScala.map(x => x.getKey.toInt -> x.getValue.asInt()).toMap
      assert(got == exp)
    }
  }

  test("concept-set score matrix is value-exact") {
    assume(new java.io.File("/root/reference/iltur_graphs").isDirectory)
    val queries = selectQueries(collectConcepts(graphs), graphs.size, nQueries = 25)
    val scores = conceptSetScores(queries, graphs)
    val exp = fx.path("concept_set_scores").elements().asScala.toSeq
    assert(scores.length == exp.size)
    for ((row, erow) <- scores.zip(exp)) {
      val evals = erow.elements().asScala.map(_.asDouble()).toSeq
      assert(row.length == evals.size)
      for ((g, e) <- row.zip(evals)) assert(near(g, e))
    }
  }

  test("RRF fusion matches on tie-free matrices") {
    def mat(f: String) = fx.path(f).elements().asScala
      .map(_.elements().asScala.map(_.asDouble()).toArray).toArray
    val fused = rrf(mat("rrf_a"), mat("rrf_b"))
    val exp = mat("rrf_fused")
    for ((row, erow) <- fused.zip(exp); (g, e) <- row.zip(erow))
      assert(near(g, e, 1e-12))
  }

  test("nDCG/AP/P@10 evaluation replays the fixture exactly") {
    assume(new java.io.File("/root/reference/iltur_graphs").isDirectory)
    val queries = selectQueries(collectConcepts(graphs), graphs.size, nQueries = 25)
    val ev = evaluateMethod(conceptSetScores(queries, graphs),
      buildQrels(queries, binary = true), buildQrels(queries, binary = false))
    val expPer = fx.path("per_query").elements().asScala.toSeq
    assert(ev.perQuery.size == expPer.size)
    for ((g, e) <- ev.perQuery.zip(expPer)) {
      assert(near(g.ndcg, e.path("ndcg").asDouble()), "ndcg")
      assert(near(g.ap, e.path("ap").asDouble()), "ap")
      assert(near(g.p10, e.path("p10").asDouble()), "p10")
    }
    val em = fx.path("mean_metrics")
    assert(near(ev.meanNdcg, em.path("nDCG@10").asDouble()))
    assert(near(ev.meanAp, em.path("MAP").asDouble()))
    assert(near(ev.meanP10, em.path("P@10").asDouble()))
  }

  test("bm25Okapi: algorithm sanity (idf floor, length normalization)") {
    val docs = Seq("the cat sat", "the cat cat sat on the mat and mat", "dogs play fetch")
    val scores = bm25Okapi(docs, Seq("cat mat", "dogs"))
    // "cat" appears in 2/3 docs -> negative Robertson idf -> floored positive
    assert(scores(0)(0) > 0 && scores(0)(1) > 0)
    assert(scores(0)(2) == 0.0)                    // no query term
    assert(scores(1)(2) > scores(1)(0))            // "dogs" only in doc 2
    // doc 1 has higher tf for cat+mat but is longer; both terms present -> higher
    assert(scores(0)(1) > scores(0)(0))
  }
}
