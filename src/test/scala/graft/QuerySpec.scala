package graft

import graft.kg.gen.TranscriptGen
import graft.kg.pipeline.KgPipeline
import graft.kg.query.{GraphOps, Retrieval}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class QuerySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-query-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()
  import spark.implicits._

  private lazy val transcripts = TranscriptGen.turns(30, 12).toDF()
  private lazy val nodes = KgPipeline.nodesDirect(spark, transcripts).toDF().cache()
  private lazy val edges = KgPipeline.edgesDirect(spark, transcripts).toDF().cache()
  private lazy val js = {
    implicit val e = org.apache.spark.sql.Encoders.product[graft.kg.model.JustificationSetRow]
    KgPipeline.flatExtract(spark, transcripts)(_.justificationSets).toDF().cache()
  }

  test("driver query plans: filter/projection pushdown and broadcast joins") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val plan02 = SparkEntry.queries("q02_filter_project")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan02.contains("PushedFilters") &&
      plan02.contains("GreaterThanOrEqual(n_chars,300"), plan02.take(1500))
    // projection pruning: the scan reads 3 columns, not the text blob
    assert(!plan02.contains("text"), "text column should be pruned from the scan")
    val plan07 = SparkEntry.queries("q07_join_agg")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan07.contains("BroadcastHashJoin"), plan07.take(1500))
  }

  test("linearization is stable and ordered by node type") {
    val a = Retrieval.linearizeStable(nodes).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val b = Retrieval.linearizeStable(nodes.repartition(13)).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a == b)
    assert(a.nonEmpty)
    assert(a.values.forall(_.nonEmpty))
  }

  test("tfidf ranks the self-document first for a distinctive query") {
    val docs = Retrieval.linearizeStable(nodes)
    val someDoc = docs.orderBy("conv_id").first()
    val queryText = someDoc.getString(1).split(" ").take(25).mkString(" ")
    val queries = Seq((someDoc.getString(0), queryText)).toDF("query_id", "query_text")
    val top = Retrieval.topK(
      Retrieval.tfidfScores(spark, docs, queries), 3, docCol = "doc_id").collect()
    assert(top.nonEmpty)
    assert(top.head.getAs[String]("doc_id") == someDoc.getString(0))
  }

  test("bm25 scores are positive and rank term-bearing docs") {
    val docs = Seq(
      ("d1", "natural justice hearing opportunity fairness"),
      ("d2", "arbitrary classification differentia nexus"),
      ("d3", "proportionality aim restrictive means balancing")).toDF("conv_id", "doc_text")
    val queries = Seq(("q1", "natural justice")).toDF("query_id", "query_text")
    val out = Retrieval.bm25Scores(spark, docs, queries).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("doc_id") == "d1")
    assert(out.head.getAs[Double]("score") > 0)
  }

  test("concept-set retrieval scores exact and fuzzy matches") {
    val scores = Retrieval.conceptSetScores(spark, nodes,
      Seq("DOCTRINE_NATURAL_JUSTICE_AUDI_ALTERAM_PARTEM", "NATURAL_JUSTICE"))
    val rows = scores.collect()
    assert(rows.nonEmpty)
    // exact query id scores the grade (supporting=3); fuzzy scores grade*sim < 3
    val exact = rows.filter(_.getAs[String]("query_cid").startsWith("DOCTRINE_"))
    assert(exact.forall(_.getAs[Double]("score") == 3.0))
    val fuzzy = rows.filter(_.getAs[String]("query_cid") == "NATURAL_JUSTICE")
    assert(fuzzy.forall(r => r.getAs[Double]("score") > 0 && r.getAs[Double]("score") < 3.0))
  }

  test("toulmin buckets argument in-edges by source type") {
    val t = GraphOps.toulmin(nodes, edges)
    val rows = t.collect()
    if (rows.nonEmpty) {
      for (r <- rows) {
        val all = r.getSeq[String](2) ++ r.getSeq[String](3) ++
          r.getSeq[String](4) ++ r.getSeq[String](5)
        assert(all.nonEmpty)
      }
    }
    // arguments appear as edge targets rarely in v1 (most argument edges point
    // AT holdings); assert the op runs and respects the schema either way
    assert(t.columns.toSeq ==
      Seq("conv_id", "argument_id", "grounds", "warrants", "backing", "rebuttals"))
  }

  test("holding support lists grounding concepts, supporting facts, JS") {
    val hs = GraphOps.holdingSupport(nodes, edges, js)
    val rows = hs.collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getSeq[String](2).nonEmpty)) // grounding concepts
    assert(rows.exists(r => Option(r.getSeq[String](4)).exists(_.nonEmpty))) // js
  }

  test("toulmin + holding support match the published graph methods on reference corpora") {
    val fixtureUrl = getClass.getResource("/graft/ref_graphops_fixture.json")
    assert(fixtureUrl != null)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val fixture = mapper.readTree(fixtureUrl)
    val dir = new java.io.File("/root/reference/iltur_graphs")
    assume(dir.isDirectory)
    implicit val nodeEnc = org.apache.spark.sql.Encoders.product[graft.kg.model.Node]
    implicit val edgeEnc = org.apache.spark.sql.Encoders.product[graft.kg.model.EdgeRow]
    implicit val jsEnc = org.apache.spark.sql.Encoders.product[graft.kg.model.JustificationSetRow]
    var checked = 0
    val it = fixture.elements()
    while (it.hasNext) {
      val c = it.next()
      val g = graft.kg.io.RefGraphJson.parseFile(s"${dir.getPath}/${c.path("file").asText()}")
      val n = spark.createDataset(g.nodes).toDF()
      val e = spark.createDataset(g.edges).toDF()
      val j = spark.createDataset(g.justificationSets).toDF()

      def expected(field: String, idField: String): Map[String, Map[String, Seq[String]]] = {
        val m = scala.collection.mutable.Map.empty[String, Map[String, Seq[String]]]
        val fit = c.path(field).elements()
        while (fit.hasNext) {
          val x = fit.next()
          val lists = scala.collection.mutable.Map.empty[String, Seq[String]]
          val fields = x.fields()
          while (fields.hasNext) {
            val ent = fields.next()
            if (ent.getValue.isArray) {
              import scala.jdk.CollectionConverters._
              lists(ent.getKey) = ent.getValue.elements().asScala.map(_.asText()).toSeq
            }
          }
          m(x.path(idField).asText()) = lists.toMap
        }
        m.toMap
      }

      val expT = expected("toulmin", "argument_id")
      val gotT = GraphOps.toulmin(n, e).collect().map { r =>
        r.getString(1) -> Map(
          "grounds" -> r.getSeq[String](2), "warrants" -> r.getSeq[String](3),
          "backing" -> r.getSeq[String](4), "rebuttals" -> r.getSeq[String](5))
      }.toMap
      for ((aid, exp) <- expT) {
        val got = gotT.getOrElse(aid,
          Map("grounds" -> Nil, "warrants" -> Nil, "backing" -> Nil, "rebuttals" -> Nil))
        assert(got == exp, s"toulmin $aid in ${c.path("file").asText()}")
      }
      // no extra non-empty structures beyond the fixture's arguments
      assert(gotT.keySet.subsetOf(expT.keySet))

      val expH = expected("holding_support", "holding_id")
      val gotH = GraphOps.holdingSupport(n, e, j).collect().map { r =>
        r.getString(1) -> Map(
          "grounding_concepts" -> r.getSeq[String](2),
          "supporting_facts" -> r.getSeq[String](3),
          "justification_sets" -> Option(r.getSeq[String](4)).getOrElse(Seq.empty))
      }.toMap
      for ((hid, exp) <- expH) {
        val got = gotH.getOrElse(hid, Map("grounding_concepts" -> Nil,
          "supporting_facts" -> Nil, "justification_sets" -> Nil))
        assert(got == exp, s"holding support $hid in ${c.path("file").asText()}")
      }

      // counterfactual_remove_concept parity
      val cit = c.path("counterfactuals").elements()
      while (cit.hasNext) {
        val x = cit.next()
        val cid = x.path("concept").asText()
        import scala.jdk.CollectionConverters._
        val expAffected = x.path("affected").elements().asScala.map(_.asText()).toSeq
        val expOutcome = x.path("outcome_affected").asBoolean()
        val removed = GraphOps.counterfactualRemoveConcept(n, e, j, cid)
        val gotAffected = removed.filter(col("affected"))
          .select("holding_id").collect().map(_.getString(0)).sorted.toSeq
        assert(gotAffected == expAffected,
          s"counterfactual $cid in ${c.path("file").asText()}")
        val gotOutcome = GraphOps.counterfactualOutcomeFlag(removed, e)
          .collect().headOption.exists(r => !r.isNullAt(1) && r.getBoolean(1))
        assert(gotOutcome == expOutcome,
          s"outcome flag for $cid in ${c.path("file").asText()}")
      }

      // trace_reasoning_path parity: edge-list-order BFS shortest paths
      val pit = c.path("paths").elements()
      while (pit.hasNext) {
        val p = pit.next()
        import scala.jdk.CollectionConverters._
        val expected = p.path("path").elements().asScala.map(_.asText()).toSeq
        val got = GraphOps.tracePath(g.edges,
          p.path("start").asText(), p.path("end").asText())
        assert(got == expected,
          s"path ${p.path("start").asText()}->${p.path("end").asText()} in ${c.path("file").asText()}")
      }
      checked += 1
    }
    assert(checked >= 15, s"only $checked graphs checked")
  }

  test("counterfactual: removing the sole AND-support breaks the holding") {
    // hand-built micro graph: one holding, one primary AND js, one support edge
    val n = Seq(
      ("c0", "f1", "fact"), ("c0", "h1", "holding")).toDF("convId", "id", "nodeType")
    val e = Seq(
      ("c0", "e1", "f1", "h1", "supports", Seq("js1"))
    ).toDF("convId", "id", "source", "target", "relation", "supportGroupIds")
    val j = Seq(("c0", "js1", "h1", "and", true))
      .toDF("convId", "id", "targetId", "logic", "isPrimary")
    val broken = GraphOps.counterfactual(n, e, j, "f1").collect()
    assert(broken.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("c0", "h1")))
    val notBroken = GraphOps.counterfactual(n, e, j, "f999").collect()
    assert(notBroken.isEmpty)
  }

  test("counterfactual outcome propagation") {
    val n = Seq(
      ("c0", "f1", "fact"), ("c0", "h1", "holding"), ("c0", "h2", "holding"),
      ("c0", "outcome", "outcome")).toDF("convId", "id", "nodeType")
    val e = Seq(
      ("c0", "e1", "f1", "h1", "supports", Seq("js1")),
      ("c0", "e2", "f1", "h2", "supports", Seq("js2")),
      ("c0", "e3", "h1", "outcome", "determines", Seq.empty[String]),
      ("c0", "e4", "h2", "outcome", "determines", Seq.empty[String])
    ).toDF("convId", "id", "source", "target", "relation", "supportGroupIds")
    val j = Seq(("c0", "js1", "h1", "and", true), ("c0", "js2", "h2", "and", true))
      .toDF("convId", "id", "targetId", "logic", "isPrimary")
    // removing f1 breaks BOTH determining holdings → outcome affected
    val out = GraphOps.counterfactualOutcome(n, e, j, "f1").collect()
    assert(out.length == 1 && out.head.getAs[Boolean]("outcome_affected"))
    assert(out.head.getSeq[String](2) == Seq("h1", "h2"))
    // removing nothing relevant → not affected
    val out2 = GraphOps.counterfactualOutcome(n, e, j, "f999").collect()
    assert(out2.length == 1 && !out2.head.getAs[Boolean]("outcome_affected"))
  }

  test("rank metrics: perfect ranking scores 1.0, inverted scores less") {
    import graft.kg.eval.RankMetrics
    val qrels = Seq(("q1", "d1", 2), ("q1", "d2", 1)).toDF("query_id", "doc_id", "rel")
    val perfect = Seq(("q1", "d1", 0.9), ("q1", "d2", 0.8), ("q1", "d3", 0.1))
      .toDF("query_id", "doc_id", "score")
    val m = RankMetrics.perQuery(perfect, qrels, k = 3).collect().head
    assert(m.getAs[Double]("ndcg") == 1.0)
    assert(m.getAs[Double]("ap") == 1.0)
    assert(math.abs(m.getAs[Double]("p_at_3") - 2.0 / 3) < 1e-6)
    val inverted = Seq(("q1", "d3", 0.9), ("q1", "d2", 0.8), ("q1", "d1", 0.1))
      .toDF("query_id", "doc_id", "score")
    val mi = RankMetrics.perQuery(inverted, qrels, k = 3).collect().head
    assert(mi.getAs[Double]("ndcg") < 1.0)
    val sum = RankMetrics.summary(perfect, qrels, 3).collect().head
    assert(sum.getAs[Double]("map") == 1.0)
  }

  test("reachability BFS walks support edges") {
    val e = Seq(
      ("c0", "e1", "f1", "a1", "supports"),
      ("c0", "e2", "a1", "h1", "supports"),
      ("c0", "e3", "h1", "i1", "resolves")).toDF("convId", "id", "source", "target", "relation")
    val r = GraphOps.reachable(spark, e, "f1").collect()
      .map(x => x.getString(1)).toSet
    assert(r == Set("a1", "h1", "i1"))
  }
}
