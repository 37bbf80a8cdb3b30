package graft.kg.eval

import graft.kg.extract.GraphAssembly
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level aggregate validation — the Spark form of the reference's
  * run_aggregate_validation (test_iltur_graphs (1).py:1062-1190): per-graph
  * validation results roll up to corpus metrics in one declarative pass —
  * pass/fail totals (a graph passes when it carries no error-class
  * warnings, the reference's `len(errors) == 0`), warning-severity tallies,
  * the quality-tier distribution, cross-graph duplicate-case_id detection
  * (:1140-1144), z-score outlier detection over the per-graph stat
  * distributions (|z| > 3 with n ≥ 10 and σ ≠ 0, sample stdev — :1146-1165),
  * and the degenerate-graph anomalies (0 facts with nodes, 0 edges with > 2
  * nodes, completely empty — :1167-1177).
  *
  * Scale posture: everything is a full aggregate or a broadcast of a 1-row
  * aggregate joined back for the z pass — no corpus-wide window, no
  * collect — so the roll-up is a constant number of map-side-combined
  * passes at any corpus size.
  */
object CorpusValidation {

  /** perGraph columns: case_id (string), warnings (array&lt;string&gt;),
    * tier (string), n_facts / n_edges / n_nodes_total (integral).
    * Returns ONE summary row. */
  def summary(perGraph: DataFrame): DataFrame = {
    val wcU = udf((ws: Seq[String]) => {
      val c = Option(ws).getOrElse(Seq.empty).map(GraphAssembly.classifyWarning)
      (c.count(_ == "error"), c.count(_ == "substantive"), c.count(_ == "cosmetic"))
    })
    val g = perGraph
      .withColumn("wc", wcU(col("warnings")))
      .select(col("case_id"), col("tier"),
        col("n_facts").cast("long").as("n_facts"),
        col("n_edges").cast("long").as("n_edges"),
        col("n_nodes_total").cast("long").as("n_nodes_total"),
        col("wc._1").cast("long").as("n_err"),
        col("wc._2").cast("long").as("n_sub"),
        col("wc._3").cast("long").as("n_cos"))

    val base = g.agg(
      count(lit(1)).as("total_graphs"),
      count_if(col("n_err") === 0).as("n_passed"),
      count_if(col("n_err") > 0).as("n_failed"),
      // coalesce: sum() over an EMPTY corpus is NULL — keep the summary row
      // well-defined (0) there; on any non-empty input the value is unchanged
      coalesce(sum("n_err"), lit(0L)).as("total_errors"),
      coalesce(sum("n_sub"), lit(0L)).as("total_substantive"),
      coalesce(sum("n_cos"), lit(0L)).as("total_cosmetic"),
      count_if(col("tier") === "gold").as("n_gold"),
      count_if(col("tier") === "silver").as("n_silver"),
      count_if(col("tier") === "bronze").as("n_bronze"),
      count_if(col("tier") === "reject").as("n_reject"),
      count_if(col("n_facts") === 0 && col("n_nodes_total") > 0).as("degen_no_facts"),
      count_if(col("n_edges") === 0 && col("n_nodes_total") > 2).as("degen_no_edges"),
      count_if(col("n_nodes_total") === 0).as("degen_empty"))

    val dups = g.groupBy("case_id").agg(count(lit(1)).as("k"))
      .filter(col("k") > 1)
      .agg(count(lit(1)).as("dup_case_ids"),
        coalesce(sum("k"), lit(0L)).as("dup_files"))

    // ONE 1-row moment aggregate covering all three stats, broadcast back
    // for ONE z-counting pass (the reference's statistics.mean/stdev over
    // stat_distributions) — previously 2 corpus scans per stat (6 total)
    val moments = g.agg(
      count(lit(1)).as("n"),
      avg("n_facts").as("mu_f"), stddev_samp("n_facts").as("sig_f"),
      avg("n_edges").as("mu_e"), stddev_samp("n_edges").as("sig_e"),
      avg("n_nodes_total").as("mu_n"), stddev_samp("n_nodes_total").as("sig_n"))
    def zCount(statCol: String, mu: String, sig: String, outName: String) =
      count_if(col("n") >= 10 && col(sig) =!= 0.0 &&
        abs((col(statCol) - col(mu)) / col(sig)) > 3.0).as(outName)
    val anoms = g.crossJoin(broadcast(moments))
      .agg(zCount("n_facts", "mu_f", "sig_f", "anom_n_facts"),
        zCount("n_edges", "mu_e", "sig_e", "anom_n_edges"),
        zCount("n_nodes_total", "mu_n", "sig_n", "anom_n_nodes"))

    base.crossJoin(dups).crossJoin(anoms)
  }
}
