package graft.kg.eval

/** Confidence-gated selective prediction analysis — exact port of the
  * reference's eval_confidence_sweep.py over per-case prediction rows
  * (graph vs raw/structured predictions with confidences):
  *
  *  - accuracy/coverage sweep per confidence threshold (:60-104);
  *  - hybrid / contra-flip / contra-hybrid / agreement-ensemble strategies
  *    with the accuracy·√coverage score and first-max best picks
  *    (:110-267, :495-519);
  *  - calibration bins + ECE + Brier (:270-434);
  *  - area under the accuracy-coverage curve (:316-332);
  *  - numpy's cumulative arange threshold grids replicated bit-for-bit
  *    (including its float quirks: `arange(0.50, 0.8, 0.05)` INCLUDES 0.8).
  *
  * Replayed EXACTLY against the published *_confidence_analysis.json
  * artifacts (computed by the reference from its published prediction
  * files) in ConfidenceSweepSpec — every sweep row, strategy, calibration
  * bin, ECE/Brier, AUACC value AND the seeded bootstrap CIs
  * ([[bootstrapCIs]] drives a bit-exact [[NumpyRandom]] MT19937 replica,
  * so nothing in the published artifacts is left unreplayed).
  */
object ConfidenceSweep {

  final case class CasePred(
      caseId: String, trueLabel: Int,
      graphPred: Int, graphConf: Double,
      rawPred: Int, rawConf: Double)

  /** numpy arange: cumulative start += step, ceil((stop-start)/step) items. */
  def npArange(start: Double, stop: Double, step: Double): Vector[Double] = {
    val n = math.ceil((stop - start) / step).toInt
    val out = Vector.newBuilder[Double]
    var v = start
    var i = 0
    while (i < math.max(n, 0)) { out += v; v += step; i += 1 }
    out.result()
  }

  /** Python round(x, n) — half-even. */
  private def r(x: Double, n: Int): Double =
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_EVEN).toDouble

  /** [round(t, 2) for t in np.arange(0.50, 0.96, 0.05)]. */
  val Thresholds: Vector[Double] = npArange(0.50, 0.96, 0.05).map(r(_, 2))

  final case class SweepRow(
      threshold: Double, coverage: Double, nAccepted: Int,
      accuracy: Double, accOnAccepted: Double, accOnRejected: Double)

  /** sweep_thresholds (:60-104); `graph = true` selects the graph channel. */
  def sweep(cases: Seq[CasePred], graph: Boolean,
            thresholds: Seq[Double] = Thresholds): Seq[SweepRow] =
    thresholds.map { t =>
      val accepted = cases.filter(c => (if (graph) c.graphConf else c.rawConf) >= t)
      val n = accepted.size
      def pred(c: CasePred) = if (graph) c.graphPred else c.rawPred
      if (n > 0) {
        val acc = accepted.count(c => pred(c) == c.trueLabel).toDouble / n
        val accCases = accepted.filter(_.trueLabel == 1)
        val rejCases = accepted.filter(_.trueLabel == 0)
        val accOnAcc = if (accCases.nonEmpty)
          accCases.count(pred(_) == 1).toDouble / accCases.size else 0.0
        val accOnRej = if (rejCases.nonEmpty)
          rejCases.count(pred(_) == 0).toDouble / rejCases.size else 0.0
        SweepRow(t, r(n.toDouble / cases.size, 4), n, r(acc, 4), r(accOnAcc, 4), r(accOnRej, 4))
      } else SweepRow(t, r(0.0, 4), 0, 0.0, 0.0, 0.0)
    }

  final case class Strategy(
      strategy: String,
      params: Map[String, Double],     // t_graph/t_raw/t_flip/t_high/t_low/t_min
      coverage: Double, accuracy: Double,
      nPredicted: Int, nCorrect: Int,
      details: Map[String, Int],       // contra_hybrid only
      score: Double)

  /** evaluate_hybrid_strategies (:110-267) + the score stamp (:505-519). */
  def strategies(cases: Seq[CasePred]): Seq[Strategy] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Strategy]
    def mk(kind: String, params: Map[String, Double], cov: Double, acc: Double,
           nPred: Int, nCorr: Int, details: Map[String, Int] = Map.empty): Strategy = {
      val covR = r(cov, 4); val accR = r(acc, 4)
      Strategy(kind, params, covR, accR, nPred, nCorr, details,
        if (covR > 0) r(accR * math.sqrt(covR), 4) else 0.0)
    }
    // hybrid: graph first, raw fallback
    for (tg <- Thresholds; tr <- Seq(0.50, 0.60, 0.70, 0.75, 0.80)) {
      var correct = 0; var predicted = 0
      for (c <- cases) {
        if (c.graphConf >= tg) {
          predicted += 1; if (c.graphPred == c.trueLabel) correct += 1
        } else if (c.rawConf >= tr) {
          predicted += 1; if (c.rawPred == c.trueLabel) correct += 1
        }
      }
      out += mk("hybrid", Map("t_graph" -> tg, "t_raw" -> tr),
        if (cases.nonEmpty) predicted.toDouble / cases.size else 0.0,
        if (predicted > 0) correct.toDouble / predicted else 0.0, predicted, correct)
    }
    // contra_graph: flip below threshold, full coverage
    for (tf <- Thresholds) {
      val correct = cases.count(c =>
        (if (c.graphConf >= tf) c.graphPred else 1 - c.graphPred) == c.trueLabel)
      out += mk("contra_graph", Map("t_flip" -> tf), 1.0,
        if (cases.nonEmpty) correct.toDouble / cases.size else 0.0, cases.size, correct)
    }
    // contra_hybrid: trust high, flip very low, raw in the middle
    for (tHigh <- Thresholds;
         tLow <- npArange(0.50, tHigh, 0.05).map(r(_, 2))) {
      var correct = 0
      var trusted = 0; var flipped = 0; var fallback = 0
      for (c <- cases) {
        if (c.graphConf >= tHigh) {
          trusted += 1; if (c.graphPred == c.trueLabel) correct += 1
        } else if (c.graphConf < tLow) {
          flipped += 1; if (1 - c.graphPred == c.trueLabel) correct += 1
        } else {
          fallback += 1; if (c.rawPred == c.trueLabel) correct += 1
        }
      }
      out += mk("contra_hybrid", Map("t_high" -> tHigh, "t_low" -> tLow), 1.0,
        if (cases.nonEmpty) correct.toDouble / cases.size else 0.0, cases.size, correct,
        Map("graph_trusted" -> trusted, "graph_flipped" -> flipped, "raw_fallback" -> fallback))
    }
    // ensemble: agreement-based
    for (tMin <- Thresholds) {
      var correct = 0; var predicted = 0
      for (c <- cases) {
        if (c.graphPred == c.rawPred) {
          if (math.max(c.graphConf, c.rawConf) >= tMin) {
            predicted += 1; if (c.graphPred == c.trueLabel) correct += 1
          }
        } else if (math.max(c.graphConf, c.rawConf) >= tMin + 0.05) {
          predicted += 1
          val chosen = if (c.graphConf >= c.rawConf) c.graphPred else c.rawPred
          if (chosen == c.trueLabel) correct += 1
        }
      }
      out += mk("ensemble", Map("t_min" -> tMin),
        if (cases.nonEmpty) predicted.toDouble / cases.size else 0.0,
        if (predicted > 0) correct.toDouble / predicted else 0.0, predicted, correct)
    }
    out.toSeq
  }

  /** First-max pick (Python max semantics). */
  def best(strats: Seq[Strategy], kind: String): Option[Strategy] = {
    val ofKind = strats.filter(_.strategy == kind)
    if (ofKind.isEmpty) None else Some(ofKind.maxBy(_.score))
  }

  final case class CalibrationBin(
      bin: String, n: Int, meanConfidence: Option[Double],
      actualAccuracy: Option[Double], calibrationError: Option[Double])

  final case class Calibration(
      graph: Seq[CalibrationBin], raw: Seq[CalibrationBin],
      graphEce: Double, rawEce: Double,
      graphBrier: Double, rawBrier: Double)

  val Bins: Seq[(Double, Double)] =
    Seq((0.50, 0.60), (0.60, 0.70), (0.70, 0.80), (0.80, 0.90), (0.90, 1.01))

  /** calibration_analysis (:270-309) + Brier (:417-434). */
  def calibration(cases: Seq[CasePred]): Calibration = {
    def binsFor(graph: Boolean): Seq[CalibrationBin] =
      Bins.map { case (lo, hi) =>
        val inBin = cases.filter(c => {
          val conf = if (graph) c.graphConf else c.rawConf
          lo <= conf && conf < hi
        })
        if (inBin.nonEmpty) {
          val acc = inBin.count(c =>
            (if (graph) c.graphPred else c.rawPred) == c.trueLabel).toDouble / inBin.size
          val mc = inBin.map(c => if (graph) c.graphConf else c.rawConf).sum / inBin.size
          CalibrationBin(f"[$lo%.2f, $hi%.2f)", inBin.size,
            Some(r(mc, 4)), Some(r(acc, 4)), Some(r(math.abs(mc - acc), 4)))
        } else CalibrationBin(f"[$lo%.2f, $hi%.2f)", 0, None, None, None)
      }
    def ece(rows: Seq[CalibrationBin]): Double =
      r(rows.collect { case b if b.calibrationError.isDefined && b.n > 0 =>
        (b.n.toDouble / cases.size) * b.calibrationError.get
      }.sum, 4)
    def brier(graph: Boolean): Double = {
      val scores = cases.map { c =>
        val (p, conf) = if (graph) (c.graphPred, c.graphConf) else (c.rawPred, c.rawConf)
        val probTrue = if (p == c.trueLabel) conf else 1.0 - conf
        (1.0 - probTrue) * (1.0 - probTrue)
      }
      r(scores.sum / scores.size, 4)
    }
    val g = binsFor(graph = true); val rw = binsFor(graph = false)
    Calibration(g, rw, ece(g), ece(rw), brier(graph = true), brier(graph = false))
  }

  final case class BootstrapCIs(
      eceCi95: (Double, Double), brierCi95: (Double, Double))

  /** The seeded bootstrap CIs for the ECE and Brier differences (raw −
    * graph, :437-495) — numpy RandomState(seed) replicated bit-exactly via
    * [[NumpyRandom]], so even these replay the published artifacts
    * verbatim. */
  def bootstrapCIs(cases: Seq[CasePred], nBoot: Int = 10000,
                   seed: Long = 42L): BootstrapCIs = {
    val n = cases.size
    val arr = cases.toArray
    def eceOf(idx: Array[Int], graph: Boolean): Double = {
      var e = 0.0
      for ((lo, hi) <- Bins) {
        var cnt = 0; var confSum = 0.0; var correct = 0
        var i = 0
        while (i < idx.length) {
          val c = arr(idx(i))
          val conf = if (graph) c.graphConf else c.rawConf
          if (lo <= conf && conf < hi) {
            cnt += 1; confSum += conf
            if ((if (graph) c.graphPred else c.rawPred) == c.trueLabel) correct += 1
          }
          i += 1
        }
        if (cnt > 0)
          e += (cnt.toDouble / n) * math.abs(confSum / cnt - correct.toDouble / cnt)
      }
      e
    }
    def brierOf(idx: Array[Int], graph: Boolean): Double = {
      var s = 0.0
      var i = 0
      while (i < idx.length) {
        val c = arr(idx(i))
        val (p, conf) = if (graph) (c.graphPred, c.graphConf) else (c.rawPred, c.rawConf)
        val pt = if (p == c.trueLabel) conf else 1.0 - conf
        s += (1.0 - pt) * (1.0 - pt)
        i += 1
      }
      s / idx.length
    }
    val rng = new NumpyRandom(seed)
    val eceDiffs = new Array[Double](nBoot)
    val brierDiffs = new Array[Double](nBoot)
    var it = 0
    while (it < nBoot) {
      val idx = rng.choice(n, n)
      eceDiffs(it) = eceOf(idx, graph = false) - eceOf(idx, graph = true)
      brierDiffs(it) = brierOf(idx, graph = false) - brierOf(idx, graph = true)
      it += 1
    }
    def ci(xs: Array[Double]): (Double, Double) = {
      val sorted = xs.sorted
      (r(DensityValidation.percentile(sorted, 2.5), 4),
        r(DensityValidation.percentile(sorted, 97.5), 4))
    }
    BootstrapCIs(ci(eceDiffs), ci(brierDiffs))
  }

  /** compute_auacc (:316-332): trapezoid over (coverage, accuracy) points
    * sorted by coverage descending (Python stable sort). */
  def auacc(rows: Seq[SweepRow]): Double = {
    val points = rows.filter(_.nAccepted > 0).map(p => (p.coverage, p.accuracy))
    if (points.size < 2) return 0.0
    val sorted = points.sortBy(-_._1)
    var area = 0.0
    var i = 0
    while (i < sorted.length - 1) {
      area += math.abs(sorted(i)._1 - sorted(i + 1)._1) * (sorted(i)._2 + sorted(i + 1)._2) / 2
      i += 1
    }
    r(area, 4)
  }
}
