package graft.kg.eval

/** Statistical comparison of per-query metric vectors — the reference's
  * significance layer re-expressed: paired two-sided t-test
  * (eval_retrieval_v2.py:1042-1048, scipy ttest_rel semantics via
  * commons-math3's Student-t distribution) and seeded bootstrap 95% CI for a
  * paired mean difference (eval_ablation.py:382-393). Driver-side over
  * per-query aggregates only — the heavy ranking work stays distributed in
  * RankMetrics.
  */
object Significance {

  final case class TTest(t: Double, p: Double)

  /** Paired two-sided t-test over equal-length metric vectors. Identical
    * vectors return (0, 1) like the reference's allclose guard. */
  def pairedTTest(a: Seq[Double], b: Seq[Double]): TTest = {
    require(a.length == b.length && a.length >= 2, "need paired samples (n >= 2)")
    val d = a.zip(b).map { case (x, y) => x - y }
    val n = d.length
    val mean = d.sum / n
    val varSum = d.map(x => (x - mean) * (x - mean)).sum
    if (d.forall(x => math.abs(x) < 1e-12)) return TTest(0.0, 1.0) // allclose guard
    if (varSum <= 1e-24) // constant non-zero shift: infinitely significant
      return TTest(if (mean > 0) Double.PositiveInfinity else Double.NegativeInfinity, 0.0)
    val sd = math.sqrt(varSum / (n - 1))
    val t = mean / (sd / math.sqrt(n))
    val dist = new org.apache.commons.math3.distribution.TDistribution(n - 1)
    val p = 2.0 * dist.cumulativeProbability(-math.abs(t))
    TTest(t, p)
  }

  /** p-value → display label (eval_retrieval_v2.py:1051-1056). */
  def significanceLabel(p: Double): String =
    if (p < 0.01) "**" else if (p < 0.05) "*" else "n.s."

  /** eval_ablation.py:382-393 VERBATIM: seeded bootstrap 95% CI for the
    * accuracy difference of two prediction sets — numpy RandomState(seed)
    * replicated bit-exactly via [[NumpyRandom]] (test fixture computed with
    * numpy itself), round-half-even to 4 dp like Python's round. */
  def ablationBootstrapCi[T](
      predsA: Seq[T], predsB: Seq[T], truth: Seq[T],
      nBoot: Int = 10000, seed: Long = 42L): (Double, Double) = {
    require(predsA.length == truth.length && predsB.length == truth.length)
    val n = truth.length
    val aRight = predsA.zip(truth).map(x => if (x._1 == x._2) 1.0 else 0.0).toArray
    val bRight = predsB.zip(truth).map(x => if (x._1 == x._2) 1.0 else 0.0).toArray
    val rng = new NumpyRandom(seed)
    val diffs = new Array[Double](nBoot)
    var it = 0
    while (it < nBoot) {
      val idx = rng.choice(n, n)
      var sa = 0.0; var sb = 0.0
      var i = 0
      while (i < n) { sa += aRight(idx(i)); sb += bRight(idx(i)); i += 1 }
      diffs(it) = sa / n - sb / n
      it += 1
    }
    val sorted = diffs.sorted
    def pyRound4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    (pyRound4(DensityValidation.percentile(sorted, 2.5)),
      pyRound4(DensityValidation.percentile(sorted, 97.5)))
  }

  /** Brier calibration score over (prediction, confidence, truth) triples
    * (eval_ablation.py:355-365): squared error of the probability assigned
    * to the true outcome — lower is better calibrated. */
  def brierScore[T](preds: Seq[T], confidences: Seq[Double], truth: Seq[T]): Double = {
    require(preds.length == confidences.length && preds.length == truth.length
      && preds.nonEmpty)
    val scores = preds.lazyZip(confidences).lazyZip(truth).map { (p, c, t) =>
      val probTrue = if (p == t) c else 1.0 - c
      (1.0 - probTrue) * (1.0 - probTrue)
    }
    math.rint(scores.sum / scores.length * 1e4) / 1e4
  }

  /** McNemar's test between two binary prediction sets against true labels
    * (eval_ablation.py:368-380): continuity-corrected chi² over the
    * discordant pairs, 3.841 = chi²(1df) at alpha 0.05. Returns
    * (chi2, significanceText). */
  def mcnemarTest[T](predsA: Seq[T], predsB: Seq[T], truth: Seq[T]): (Double, String) = {
    require(predsA.length == predsB.length && predsA.length == truth.length)
    var aRbW = 0
    var aWbR = 0
    for (((a, b), t) <- predsA.zip(predsB).zip(truth)) {
      if (a == t && b != t) aRbW += 1
      if (a != t && b == t) aWbR += 1
    }
    val denom = aRbW + aWbR
    if (denom == 0) return (0.0, "n/a")
    val chi2 = math.pow(math.abs(aRbW - aWbR) - 1, 2) / denom
    val sig = if (chi2 > 3.841) "p<0.05" else "p>=0.05 (n.s.)"
    (math.rint(chi2 * 1000) / 1000, sig)
  }

  /** Seeded bootstrap 95% CI for the paired mean difference mean(a) - mean(b)
    * (eval_ablation.py:382-393 shape, metric-valued instead of 0/1
    * accuracy). Deterministic for a fixed seed. */
  def bootstrapCiDiff(
      a: Seq[Double], b: Seq[Double],
      nBoot: Int = 10000, seed: Long = 42L): (Double, Double) = {
    require(a.length == b.length && a.nonEmpty)
    val n = a.length
    val rng = new java.util.Random(seed)
    val aa = a.toArray
    val bb = b.toArray
    val diffs = new Array[Double](nBoot)
    var it = 0
    while (it < nBoot) {
      var sa = 0.0
      var sb = 0.0
      var j = 0
      while (j < n) {
        val idx = rng.nextInt(n)
        sa += aa(idx); sb += bb(idx)
        j += 1
      }
      diffs(it) = (sa - sb) / n
      it += 1
    }
    java.util.Arrays.sort(diffs)
    def pct(q: Double): Double = {
      // numpy 'linear' percentile interpolation
      val pos = q * (nBoot - 1)
      val lo = pos.toInt
      val hi = math.min(lo + 1, nBoot - 1)
      val frac = pos - lo
      diffs(lo) * (1 - frac) + diffs(hi) * frac
    }
    (math.rint(pct(0.025) * 1e4) / 1e4, math.rint(pct(0.975) * 1e4) / 1e4)
  }
}
