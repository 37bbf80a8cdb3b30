package graft

import graft.kg.gen.TranscriptGen
import graft.kg.pipeline.KgPipeline
import org.apache.spark.sql.SparkSession

/** Benchmark main.
  *
  * Measures (a) the headline operator queries from SparkEntry at the sf dir,
  * and (b) the end-to-end KG pipeline (synthesize → extract → link →
  * materialize triples) at TWO parallelism levels — local[N] and local[4N] —
  * on the identical input, reporting triples/sec at both plus the scaling
  * efficiency, which is the in-sandbox evidence for the north rule's
  * N-vs-4N-executor criterion (no real cluster available here).
  *
  * Variance discipline (the sandbox VM drifts 20-40 % between runs):
  * every per-query number is a MIN over `qReps` reps, and the kg phase runs
  * the PARALLELISM LEVELS round-robin — each cycle times a calibration
  * kernel, then 2c, low and high back to back — so a degraded VM span
  * inflates every level of its cycle together instead of poisoning one
  * level's phase block asymmetrically (the r5/r6 driver-artifact failure
  * mode). Min/median/range per level, per-cycle efficiencies and the
  * per-cycle calibration kernel all ship in the JSON.
  *
  * Prints ONE JSON line:
  *   {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *    "kg":{"n_convs":...,"triples":...,
  *          "low":{"cores":8,"sec":...,"triples_per_sec":...},
  *          "high":{"cores":32,"sec":...,"triples_per_sec":...},
  *          "scaling_efficiency":...}}
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      // 4 tasks/core: amortizes stragglers without tiny-task overhead
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      // tmpfs shuffle dir: the sandbox VM disk adds noise to the tiny
      // shuffles here; a real cluster uses local SSDs
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** One end-to-end extract → link → CANONICALIZE run: ONE extraction pass
    * (nodes + edges as a tagged union, persisted) feeding cross-conversation
    * canonicalization (connected components over candidate-match keys) to
    * the canonical triple count. Returns (seconds, canonical triples). */
  private def kgOnce(
      spark: SparkSession, transcripts: org.apache.spark.sql.DataFrame,
      pre: Boolean): (Double, Long) = {
    import org.apache.spark.sql.functions.col
    val t0 = System.nanoTime()
    // persist the union as a DataFrame: columnar cache, and the node/edge
    // projections rescan it without the object-encoder round-trip. The
    // union is pruned at the extraction boundary to exactly the columns
    // canonicalization reads (mention keys + slim edges) — the same column
    // pruning Catalyst would push into a relational scan.
    val combined = KgPipeline
      .canonicalInputsDirect(spark, transcripts, prePartitioned = pre)
      .toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = combined.filter(col("m").isNotNull).select("m.*")
    val edges = combined.filter(col("e").isNotNull).select("e.*")
    val triples = graft.kg.canonical.Canonicalizer
      .canonicalTriples(spark, nodes, edges).count()
    combined.unpersist()
    ((System.nanoTime() - t0) / 1e9, triples)
  }

  final private case class PathStats(
      secs: Vector[Double]) {
    def min: Double = secs.min
    def median: Double = {
      val s = secs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def lo: Double = secs.min
    def hi: Double = secs.max
    def json: String = {
      def f(d: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, d)
      // "sec" repeats the min for round-2/3 schema compatibility
      s"""{"sec":${f(min)},"min":${f(min)},"median":${f(median)},""" +
        s""""range":[${f(lo)},${f(hi)}],"reps":[${secs.map(f).mkString(",")}]}"""
    }
  }

  /** Pure-JVM single-thread calibration kernel (register-only xorshift mix,
    * no memory traffic, no Spark) timed once per cycle: a session-health
    * index shipped per-cycle in the JSON. A calm VM prints near-constant
    * values; a degraded span shows up as an inflated calib rep right next
    * to the kg reps it inflated, so a reader can normalize — or discount —
    * any cycle from the artifact alone. */
  private def calibKernel(iters: Long = 400_000_000L): Double = {
    val t0 = System.nanoTime()
    var x = 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < iters) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    // data-dependent sink keeps the loop from being eliminated
    if (x == 0L) System.err.println("calib sink")
    (System.nanoTime() - t0) / 1e9
  }

  /** One timed visit to one parallelism level inside a cycle: fresh
    * local[cores] session, tiny FULL-CHAIN warm-up (first-job session init —
    * broadcast/AQE/codegen machinery — measured at 25-90 % of a rep if left
    * inside it; JIT and the Janino codegen cache are JVM-global and already
    * hot), then `reps` interleaved (pre, shuffled) rep pairs. In-session
    * rep 2 reaches steady state (SessionInitProbe), so every visit
    * contributes a steady-state witness to the level's min.
    * Returns (preSecs, shuffledSecs, triples). */
  private def levelVisit(cores: Int, transcriptsPath: String, reps: Int,
                         shuffledToo: Boolean): (Vector[Double], Vector[Double], Long) = {
    val spark = session(cores)
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      locally {
        val w = KgPipeline.canonicalInputsDirect(spark,
          TranscriptGen.turns(120, 40).toDF(), prePartitioned = false)
          .toDF().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        graft.kg.canonical.Canonicalizer.canonicalTriples(spark,
          w.filter(col("m").isNotNull).select("m.*"),
          w.filter(col("e").isNotNull).select("e.*")).count()
        w.unpersist()
      }
      val preT = KgPipeline.readConversationPartitioned(spark, transcriptsPath)
      val shufT = spark.read.parquet(transcriptsPath)
      val preS = Vector.newBuilder[Double]
      val shufS = Vector.newBuilder[Double]
      var triples = 0L
      for (_ <- 1 to reps) {
        val (ps, pt) = kgOnce(spark, preT, pre = true)
        triples = pt
        preS += ps
        if (shuffledToo) {
          val (ss, st) = kgOnce(spark, shufT, pre = false)
          require(pt == st, s"layout changed results: $pt vs $st")
          shufS += ss
        }
      }
      (preS.result(), shufS.result(), triples)
    } finally spark.stop()
  }

  /** Full pipeline incl. MATERIALIZE: all 8 bucket-partitioned tables +
    * snapshot/lineage commit, fresh output dir, inside the given session.
    * Returns (sec, triple rows). */
  private def materializeOnce(spark: SparkSession, transcriptsPath: String): (Double, Long) = {
    val transcripts = KgPipeline.readConversationPartitioned(spark, transcriptsPath)
    val out = java.nio.file.Files.createTempDirectory("graft_bench_mat").toString
    val t0 = System.nanoTime()
    val report = graft.kg.table.Materializer.run(spark, transcripts, out,
      nBuckets = 32, prePartitioned = true)
    val sec = (System.nanoTime() - t0) / 1e9
    (sec, report.rows.getOrElse("triples", 0L))
  }

  /** One rep of MATERIALIZE in its own local[cores] session. */
  private def materializeRun(cores: Int, transcriptsPath: String): (Double, Long) = {
    val spark = session(cores)
    try materializeOnce(spark, transcriptsPath) finally spark.stop()
  }

  /** All timings from one round-robin cycle (see main). */
  final private case class Cycle(
      calib: Double, base: Vector[Double],
      lowPre: Vector[Double], lowShuf: Vector[Double],
      highPre: Vector[Double], highShuf: Vector[Double],
      mat: Option[Double], triples: Long) {
    def baseMin: Double = base.min
    def lowMin: Double = (lowPre ++ lowShuf).min
    def highMin: Double = (highPre ++ highShuf).min
    // per-cycle efficiencies: numerator and denominator measured minutes
    // apart at most, inside the SAME cycle, so a degraded span hits both
    def eff2to8(lowCores: Int): Double = (baseMin / lowMin) / (lowCores / 2.0)
    def eff8to32(ratio: Double): Double = (lowMin / highMin) / ratio
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val lowCores = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOW", "8").toInt
    val highCores = lowCores * 4
    // cycles × reps-per-visit: 3 × 2 = six windows per level, each visit
    // contributing an in-session steady-state rep (see levelVisit)
    val kgCycles = sys.env.getOrElse("SPARK_GRAFT_BENCH_KG_CYCLES", "3").toInt
    val kgReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_KG_REPS", "2").toInt
    val qReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_Q_REPS", "3").toInt

    // --- phase 1: KG end-to-end at two parallelism levels -------------------
    // Workload scales with the sf dir (documents row count), content is the
    // deterministic generator — identical input for both runs.
    val prep = session(highCores)
    val (nConvs, transcriptsPath) = {
      import prep.implicits._
      // 8 conversations per document row: enough work that the canonicalize
      // stage's fixed per-job latency stays a small fraction of even the
      // 8-core run at sf0.1 (the round-4 extractor is ~1.55x faster, so the
      // round-3 x3 workload would have shrunk the parallel share and let
      // fixed job latency dominate the efficiency ratio)
      val nDocs = prep.read.parquet(s"$sfDir/documents.parquet").count()
      val n = math.max(1000, nDocs.toInt * 8)
      // conversation-contiguous production layout: extraction reads it
      // SHUFFLE-FREE (no conv_id exchange) — the 100-TB deployment shape
      val path = s"/tmp/graft_bench_transcripts40p_$n"
      if (!new java.io.File(path + "/_SUCCESS").exists()) {
        KgPipeline.writeConversationPartitioned(
          TranscriptGen.turns(n, 40).toDF(), path, nFiles = highCores * 4)
      }
      (n, path)
    }
    // full warm-up ONCE, here: JIT, Janino codegen cache and regex
    // compilation are JVM-global, so the per-cycle sessions only need the
    // tiny session-init warm-up in levelVisit
    locally {
      import prep.implicits._
      KgPipeline.triplesDirect(prep, TranscriptGen.turns(1000, 40).toDF()).count()
    }
    prep.stop()
    calibKernel() // warm the calibration kernel's JIT too

    // Three parallelism levels → two N-vs-4N pairs. The (2 → 8) pair is the
    // faithful multi-executor emulation (per-core resources unconstrained);
    // (8 → 32) additionally reflects this single box's all-core memory-
    // bandwidth ceiling (BandwidthProbe), which a real cluster adding
    // MACHINES does not hit. Both are reported; `scaling_efficiency` is the
    // (2 → 8) pair.
    //
    // ROUND-ROBIN CYCLES (round 7): the levels are no longer phase blocks.
    // Each cycle times, back to back inside one wall-clock window:
    //   calibration kernel → 2c visit → low visit → high visit →
    //   materialize at high
    // where a visit is one fresh session running `kgReps` interleaved
    // (pre, shuffled) rep pairs after an untimed tiny full-chain warm-up.
    // Two properties fall out:
    //  - a degraded VM span inflates every level of its cycle together —
    //    the r5/r6 failure mode (a slow PHASE hitting one level's block
    //    asymmetrically and poisoning the ratio of mins) is structurally
    //    gone (cycle windows per level are interleaved across the phase);
    //  - in-session rep 2 of each visit reaches steady state
    //    (SessionInitProbe: rep 1 pays 25-90 % session init even after the
    //    warm-up), so every cycle contributes steady-state witnesses and
    //    the min-based headline measures the chain, not session setup.
    // Headline sec per level = min over ALL cycles' pre AND shuffled reps
    // (shuffled = identical extraction + a conv_id exchange, strictly more
    // work, hence always a valid witness); per-cycle efficiencies
    // (numerator and denominator minutes apart at most) plus the per-cycle
    // pure-JVM calibration kernel ship in the JSON as corroboration, so a
    // reader can verify the headline — or normalize it — from the artifact
    // alone even in a session degraded end-to-end.
    val coreRatio = highCores.toDouble / lowCores
    val cycles = Vector.tabulate(kgCycles) { c =>
      val calib = calibKernel()
      val (baseSec, _, t0) = levelVisit(2, transcriptsPath, kgReps, shuffledToo = false)
      val (lowPre, lowShuf, t1) = levelVisit(lowCores, transcriptsPath, kgReps, shuffledToo = true)
      val (highPre, highShuf, t2) = levelVisit(highCores, transcriptsPath, kgReps, shuffledToo = true)
      require(t0 == t1 && t1 == t2, s"parallelism changed results: $t0/$t1/$t2")
      // materialize interleaves once per cycle: min-of-kgCycles across
      // well-separated windows
      val mat = Some(materializeRun(highCores, transcriptsPath))
      val cy = Cycle(calib, baseSec, lowPre, lowShuf, highPre, highShuf,
        mat.map(_._1), t0)
      def v(xs: Vector[Double]) = xs.map(x => "%.4f".formatLocal(java.util.Locale.ROOT, x)).mkString("[", ",", "]")
      println(s"""{"phase":"kg_cycle","cycle":${c + 1},"calib":${"%.4f".formatLocal(java.util.Locale.ROOT, calib)},"base":${v(cy.base)},"low_pre":${v(cy.lowPre)},"low_shuf":${v(cy.lowShuf)},"high_pre":${v(cy.highPre)},"high_shuf":${v(cy.highShuf)},"mat":${cy.mat.getOrElse(-1.0)}}""")
      cy
    }
    val baseTriples = cycles.head.triples
    // reps arrays concatenate in cycle order (cycle 1's reps first)
    val base2 = PathStats(cycles.flatMap(_.base))
    val low = PathStats(cycles.flatMap(_.lowPre))
    val shufLow = PathStats(cycles.flatMap(_.lowShuf))
    val high = PathStats(cycles.flatMap(_.highPre))
    val shufHigh = PathStats(cycles.flatMap(_.highShuf))
    val calib = PathStats(cycles.map(_.calib))
    val base2Tps = baseTriples / base2.min
    val lowMin = math.min(low.min, shufLow.min)
    val highMin = math.min(high.min, shufHigh.min)
    val lowTps = baseTriples / lowMin
    val highTps = baseTriples / highMin
    val eff2to8 = (lowTps / base2Tps) / (lowCores.toDouble / 2)
    val eff8to32 = (highTps / lowTps) / coreRatio
    val cycleEffs = cycles.map(_.eff2to8(lowCores))
    val effCycleMedian = PathStats(cycleEffs).median
    // max over SAME-CYCLE efficiencies: numerator and denominator measured
    // minutes apart inside one window, so this is the reading least
    // distorted by cross-level asymmetric degradation (r7_run9: a calm 2c
    // rep against a uniformly degraded 8c level printed min-ratio 0.645
    // while its best same-window cycle measured 0.817). NOT the headline —
    // a corroborating field, like the median.
    val effBestCycle = cycleEffs.max

    def f(d: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, d)

    val matRuns = cycles.flatMap(c => c.mat.map(s => (s, c.triples)))
    val matSec = matRuns.map(_._1).min
    val matTriples = matRuns.head._2
    val perCycle = cycles.zipWithIndex.map { case (c, i) =>
      s"""{"cycle":${i + 1},"calib":${f(c.calib)},"base":${f(c.baseMin)},""" +
        s""""low":${f(c.lowMin)},"high":${f(c.highMin)},""" +
        s""""mat":${c.mat.map(f).getOrElse("null")},""" +
        s""""eff_2_to_8":${f(c.eff2to8(lowCores))},""" +
        s""""eff_8_to_32":${f(c.eff8to32(coreRatio))}}"""
    }.mkString("[", ",", "]")
    val kg =
      s"""{"n_convs":$nConvs,"triples":$baseTriples,"cycles":$kgCycles,"reps_per_visit":$kgReps,""" +
        s""""base":{"cores":2,"sec":${f(base2.min)},"triples_per_sec":${f(base2Tps)},""" +
        s""""reps":[${base2.secs.map(f).mkString(",")}]},""" +
        s""""low":{"cores":$lowCores,"sec":${f(lowMin)},"triples_per_sec":${f(lowTps)}},""" +
        s""""high":{"cores":$highCores,"sec":${f(highMin)},"triples_per_sec":${f(highTps)}},""" +
        s""""scaling_efficiency":${f(eff2to8)},""" +
        s""""scaling_efficiency_2_to_8":${f(eff2to8)},""" +
        s""""scaling_efficiency_8_to_32":${f(eff8to32)},""" +
        s""""scaling_efficiency_cycle_median":${f(effCycleMedian)},""" +
        s""""scaling_efficiency_best_cycle":${f(effBestCycle)},""" +
        s""""calibration_kernel":${calib.json},""" +
        s""""per_cycle":$perCycle,""" +
        s""""pre_low":${low.json},"pre_high":${high.json},""" +
        s""""shuffled_low":${shufLow.json},""" +
        s""""shuffled_high":${shufHigh.json},""" +
        s""""materialize":{"cores":$highCores,"sec":${f(matSec)},"triples":$matTriples,""" +
        s""""triples_per_sec":${f(matTriples / matSec)},"reps":[${matRuns.map(r => f(r._1)).mkString(",")}]}}"""
    // phase record: the driver keeps only the output tail, so each phase
    // prints its full JSON as it completes — a truncated capture still
    // carries every number somewhere in the artifact
    println(s"""{"phase":"kg","sf":"$sfDir","kg":$kg}""")

    // --- phase 2: headline operator queries at local[high], min-of-qReps ----
    // The kg_* family shares SparkEntry's extract-once memo; its one-time
    // corpus extraction is timed separately below as kg_corpus_extract so
    // per-query minima measure steady-state query cost, not the shared
    // extraction (the reference's own materialize-once design).
    val spark = session(highCores)
    val extractOnceSec = {
      val t0 = System.nanoTime()
      SparkEntry.queries("kg_triples")(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // q25 split (same materialize-once design): the one-shot tfidfScores
    // cost is ~all one-time 1-2-gram index build; production builds the
    // index once and serves many query batches. Build once here (timed as
    // tfidf_index_build — eager localCheckpoints put the whole build inside
    // the span), then q25 reps measure steady-state serve against it.
    // Numbers are identical by construction (tfidfScores = queryTfidfIndex ∘
    // buildTfidfIndex), so the oracle is untouched.
    import org.apache.spark.sql.functions.col
    val tfidfIdx = {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").as("conv_id"), col("text").as("doc_text"))
      val t0 = System.nanoTime()
      val idx = graft.kg.query.Retrieval.buildTfidfIndex(spark, docs)
      ((System.nanoTime() - t0) / 1e9, idx)
    }
    val tfidfQueries = {
      import spark.implicits._
      Seq((0, "spark join merge"), (1, "window filter scan")).toDF("query_id", "query_text")
    }
    // per-query: every rep and every error ship in the artifact; failed reps
    // are EXCLUDED from minima instead of masquerading as fast successes
    val detail = SparkEntry.queries.toList.sortBy(_._1).map { case (name, fn) =>
      val reps = Vector.newBuilder[Double]
      var err: Option[String] = None
      for (_ <- 1 to qReps) {
        val t0 = System.nanoTime()
        try {
          if (name == "q25_tfidf_topk")
            graft.kg.query.Retrieval.topK(
              graft.kg.query.Retrieval.queryTfidfIndex(tfidfIdx._2, tfidfQueries),
              10, docCol = "doc_id").count()
          else fn(spark, sfDir).count()
          reps += (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            err = Some((e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage))
              .replaceAll("[\"\\\\\\r\\n\\t]", " ").take(160))
        }
      }
      (name, reps.result(), err)
    }
    spark.stop()

    val ok = detail.collect { case (n, reps, _) if reps.nonEmpty => n -> reps.min }
    // queries with ZERO successful reps: named explicitly next to the total,
    // so totals from runs with different failure sets are never compared as
    // like-for-like (the per-query err field alone buried that)
    val failed = detail.collect { case (n, reps, _) if reps.isEmpty => n }
    val qs = (ok ++ List(
        "kg_corpus_extract" -> extractOnceSec, "tfidf_index_build" -> tfidfIdx._1))
      .map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val qDetail = detail.map { case (n, reps, err) =>
      "\"" + n + "\":{\"min\":" + reps.minOption.map(f).getOrElse("null") +
        ",\"reps\":[" + reps.map(f).mkString(",") + "]" +
        ",\"err\":" + err.map("\"" + _ + "\"").getOrElse("null") + "}"
    }.mkString("{", ",", "}")
    println(s"""{"phase":"queries","queries":$qs,"query_detail":$qDetail}""")

    // low/high contributions use the SAME min-over-pre+shuffled values the
    // kg block ships as low.sec/high.sec, so kg components + queries always
    // reconstruct the total (pre-only minima here would leave a pre-vs-
    // shuffled gap whenever a shuffled rep wins, as in the r6_run4 stall)
    val total = ok.map(_._2).sum + extractOnceSec + tfidfIdx._1 +
      base2.min + lowMin + highMin + matSec
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":${f(total)},"unit":"sec",""" +
        s""""n_failed_queries":${failed.size},"failed_queries":$failedJson,""" +
        s""""queries":$qs,"query_detail":$qDetail,"sf":"$sfDir","kg":$kg}"""
    // full record also lands on disk so a truncated stdout capture is
    // recoverable without a re-run
    try {
      val w = new java.io.PrintWriter("/root/repo/BENCH_LAST.json")
      try w.println(line) finally w.close()
    } catch { case _: Throwable => }
    println(line)
  }
}
