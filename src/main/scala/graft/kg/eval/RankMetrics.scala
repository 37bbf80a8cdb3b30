package graft.kg.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality metrics over a (query_id, doc_id, score) table and a
  * (query_id, doc_id, rel) qrels table — the retrieval-metric surface of the
  * reference evaluation (P@10 / nDCG@10 / MAP, eval_retrieval_v2.py:982-1039),
  * computed relationally per query then averaged.
  */
object RankMetrics {

  /** Per-query P@k, AP@k and nDCG@k. `rel` is a non-negative gain (binary or
    * graded). Ranks are deterministic: score desc, doc_id asc. */
  def perQuery(scores: DataFrame, qrels: DataFrame, k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val ranked = scores.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .join(qrels, Seq("query_id", "doc_id"), "left")
      .withColumn("rel", coalesce(col("rel").cast("double"), lit(0.0)))
      .withColumn("hit", (col("rel") > 0).cast("double"))

    val wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPrec = ranked
      .withColumn("cum_hits", sum(col("hit")).over(wcum))
      .withColumn("prec_at_rank", col("cum_hits") / col("rank"))
      .withColumn("dcg_term", (pow(lit(2.0), col("rel")) - 1.0) / log2(col("rank") + 1))

    val perQ = withPrec.groupBy(col("query_id")).agg(
      round(sum(col("hit")) / lit(k.toDouble), 6).as(s"p_at_$k"),
      round(sum(col("prec_at_rank") * col("hit")), 6).as("ap_num"),
      round(sum(col("dcg_term")), 6).as("dcg"))

    // ideal DCG from the qrels (top-k by rel desc)
    val wi = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("doc_id").asc)
    val idcg = qrels.withColumn("rank", row_number().over(wi))
      .filter(col("rank") <= k && col("rel") > 0)
      .withColumn("idcg_term", (pow(lit(2.0), col("rel").cast("double")) - 1.0) / log2(col("rank") + 1))
      .groupBy(col("query_id")).agg(sum(col("idcg_term")).as("idcg"),
        count(lit(1)).as("n_rel_capped"))

    perQ.join(idcg, Seq("query_id"), "left")
      .withColumn("ndcg",
        round(when(coalesce(col("idcg"), lit(0.0)) > 0, col("dcg") / col("idcg"))
          .otherwise(lit(0.0)), 6))
      .withColumn("ap",
        round(when(coalesce(col("n_rel_capped"), lit(0L)) > 0,
          col("ap_num") / col("n_rel_capped")).otherwise(lit(0.0)), 6))
      .select(col("query_id"), col(s"p_at_$k"), col("ap"), col("ndcg"))
  }

  /** Corpus means: (metric, value) rows. */
  def summary(scores: DataFrame, qrels: DataFrame, k: Int = 10): DataFrame = {
    val pq = perQuery(scores, qrels, k)
    pq.agg(
      round(avg(col(s"p_at_$k")), 6).as(s"mean_p_at_$k"),
      round(avg(col("ap")), 6).as("map"),
      round(avg(col("ndcg")), 6).as(s"mean_ndcg_at_$k"))
  }
}
