package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.kg.eval.ConfidenceSweep
import graft.kg.eval.ConfidenceSweep._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** ConfidenceSweep replayed EXACTLY against the PUBLISHED
  * *_confidence_analysis.json artifacts: the reference computed them from
  * its published prediction files, so re-running our port over the same
  * inputs must reproduce every sweep row, strategy, best pick, calibration
  * bin, ECE/Brier, AUACC — and the seeded bootstrap CIs, via the bit-exact
  * MT19937 replica in NumpyRandom. */
class ConfidenceSweepSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def load(path: String): JsonNode = mapper.readTree(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  /** load_results (:40-55): struct_* normalized to raw_*, invalid preds
    * filtered. */
  private def cases(results: JsonNode): Seq[CasePred] =
    results.path("cases").elements().asScala.flatMap { c =>
      val hasRaw = c.has("raw_pred")
      val rp = if (hasRaw) c.path("raw_pred") else c.path("struct_pred")
      val rc = if (hasRaw) c.path("raw_conf") else c.path("struct_conf")
      val gp = c.path("graph_pred")
      if ((gp.asInt(-1) == 0 || gp.asInt(-1) == 1) && (rp.asInt(-1) == 0 || rp.asInt(-1) == 1))
        Some(CasePred(c.path("case_id").asText(), c.path("true_label").asInt(),
          gp.asInt(), c.path("graph_conf").asDouble(), rp.asInt(), rc.asDouble()))
      else None
    }.toSeq

  test("numpy arange threshold grids replicate (incl. float quirks)") {
    assert(Thresholds == Vector(0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95))
    def tl(th: Double) = npArange(0.50, th, 0.05).map(x =>
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_EVEN).toDouble)
    assert(tl(0.55) == Vector(0.5, 0.55)) // numpy includes the endpoint here
    assert(tl(0.6) == Vector(0.5, 0.55))
    assert(tl(0.8) == Vector(0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8))
    assert(tl(0.95) == Vector(0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9))
  }

  private def checkSweep(got: Seq[SweepRow], exp: JsonNode, tag: String): Unit = {
    val rows = exp.elements().asScala.toSeq
    assert(got.size == rows.size, tag)
    for ((g, e) <- got.zip(rows)) {
      assert(g.threshold == e.path("threshold").asDouble(), s"$tag t")
      assert(g.coverage == e.path("coverage").asDouble(), s"$tag cov@${g.threshold}")
      assert(g.nAccepted == e.path("n_accepted").asInt(), s"$tag n@${g.threshold}")
      assert(g.accuracy == e.path("accuracy").asDouble(), s"$tag acc@${g.threshold}")
      assert(g.accOnAccepted == e.path("acc_on_accepted").asDouble(), s"$tag aoa@${g.threshold}")
      assert(g.accOnRejected == e.path("acc_on_rejected").asDouble(), s"$tag aor@${g.threshold}")
    }
  }

  private def checkStrategy(got: Strategy, e: JsonNode, tag: String): Unit = {
    assert(got.strategy == e.path("strategy").asText(), tag)
    for ((k, v) <- got.params)
      assert(v == e.path(k).asDouble(), s"$tag $k")
    assert(got.coverage == e.path("coverage").asDouble(), s"$tag cov")
    assert(got.accuracy == e.path("accuracy").asDouble(), s"$tag acc")
    assert(got.nPredicted == e.path("n_predicted").asInt(), s"$tag np")
    assert(got.nCorrect == e.path("n_correct").asInt(), s"$tag nc")
    assert(got.score == e.path("score").asDouble(), s"$tag score")
    if (got.details.nonEmpty)
      for ((k, v) <- got.details)
        assert(v == e.path("details").path(k).asInt(), s"$tag detail $k")
  }

  private def replay(resultsPath: String, analysisPath: String): Unit = {
    val cs = cases(load(resultsPath))
    val exp = load(analysisPath)
    assert(cs.size == exp.path("n_cases").asInt())

    checkSweep(sweep(cs, graph = true), exp.path("graph_sweep"), "graph")
    checkSweep(sweep(cs, graph = false), exp.path("raw_sweep"), "raw")

    assert(auacc(sweep(cs, graph = true)) == exp.path("graph_auacc").asDouble())
    assert(auacc(sweep(cs, graph = false)) == exp.path("raw_auacc").asDouble())

    val strats = strategies(cs)
    val expStrats = exp.path("strategies").elements().asScala.toSeq
    assert(strats.size == expStrats.size, "strategy count")
    for ((g, e) <- strats.zip(expStrats)) checkStrategy(g, e, s"strat ${g.strategy}")
    for (kind <- Seq("hybrid", "ensemble", "contra_graph", "contra_hybrid")) {
      val key = kind match {
        case "hybrid" => "best_hybrid"
        case "ensemble" => "best_ensemble"
        case "contra_graph" => "best_contra"
        case "contra_hybrid" => "best_contra_hybrid"
      }
      checkStrategy(best(strats, kind).get, exp.path(key), key)
    }

    val cal = calibration(cs)
    val expCal = exp.path("calibration")
    def checkBins(got: Seq[CalibrationBin], e: JsonNode, tag: String): Unit =
      for ((g, b) <- got.zip(e.elements().asScala.toSeq)) {
        assert(g.bin == b.path("bin").asText(), tag)
        assert(g.n == b.path("n").asInt(), s"$tag n ${g.bin}")
        assert(g.meanConfidence == (if (b.path("mean_confidence").isNull) None
          else Some(b.path("mean_confidence").asDouble())), s"$tag mc ${g.bin}")
        assert(g.actualAccuracy == (if (b.path("actual_accuracy").isNull) None
          else Some(b.path("actual_accuracy").asDouble())), s"$tag aa ${g.bin}")
        assert(g.calibrationError == (if (b.path("calibration_error").isNull) None
          else Some(b.path("calibration_error").asDouble())), s"$tag ce ${g.bin}")
      }
    checkBins(cal.graph, expCal.path("graph"), "cal graph")
    checkBins(cal.raw, expCal.path("raw"), "cal raw")
    assert(cal.graphEce == expCal.path("graph_ece").asDouble())
    assert(cal.rawEce == expCal.path("raw_ece").asDouble())
    assert(cal.graphBrier == expCal.path("graph_brier").asDouble())
    assert(cal.rawBrier == expCal.path("raw_brier").asDouble())

    val cis = bootstrapCIs(cs)
    def pair(f: String) = {
      val a = expCal.path(f).elements().asScala.toSeq
      (a(0).asDouble(), a(1).asDouble())
    }
    assert(cis.eceCi95 == pair("ece_bootstrap_ci_95"), "ece CI")
    assert(cis.brierCi95 == pair("brier_bootstrap_ci_95"), "brier CI")
  }

  test("NumpyRandom replicates numpy RandomState draw-for-draw") {
    // expected values from np.random.RandomState(42) in the reference env
    val rng = new graft.kg.eval.NumpyRandom(42)
    assert(Seq.fill(5)(rng.interval(2516).toInt) == Seq(860, 1294, 1130, 1095, 1638))
    val rng2 = new graft.kg.eval.NumpyRandom(42)
    assert(math.abs(rng2.uniform(0, 1) - 0.3745401188473625) < 1e-16)
  }

  test("REPLAYS the published graph-vs-raw n2517 confidence analysis exactly") {
    assume(new java.io.File("/root/reference/graph_vs_raw_n2517_noscrub.json").exists)
    replay("/root/reference/graph_vs_raw_n2517_noscrub.json",
      "/root/reference/graph_vs_raw_n2517_noscrub_confidence_analysis.json")
  }

  test("REPLAYS the published graph-vs-structured n2508 analysis exactly (struct_* channel)") {
    assume(new java.io.File(
      "/root/reference/graph_vs_structured_n2508_noscrub_grok-4-1-fast-reasoning.json").exists)
    replay("/root/reference/graph_vs_structured_n2508_noscrub_grok-4-1-fast-reasoning.json",
      "/root/reference/graph_vs_structured_n2508_noscrub_grok-4-1-fast-reasoning_confidence_analysis.json")
  }
}
