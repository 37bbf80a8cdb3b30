package graft.kg.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Triple-set precision/recall harness — the BASELINE.json acceptance check
  * (triple (subj, pred, obj) P/R ≥ 0.95 vs the reference extraction),
  * computed distributively: one inner join + two counts, never a collect of
  * the triple sets.
  */
object PrEval {

  final case class Prf(
      precision: Double, recall: Double, f1: Double,
      nActual: Long, nExpected: Long, nMatched: Long)

  /** P/R/F1 of `actual` vs `expected`, both (conv_id, subj, pred, obj). */
  def prf(actual: DataFrame, expected: DataFrame): Prf = {
    val key = Seq("conv_id", "subj", "pred", "obj")
    val a = actual.select(key.map(col): _*).distinct()
    val e = expected.select(key.map(col): _*).distinct()
    val nA = a.count()
    val nE = e.count()
    val nM = a.join(e, key).count()
    val p = if (nA == 0) 0.0 else nM.toDouble / nA
    val r = if (nE == 0) 0.0 else nM.toDouble / nE
    val f1 = if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    Prf(p, r, f1, nA, nE, nM)
  }

  /** Per-conversation P/R table (for drilling into mismatches). */
  def prfByConv(actual: DataFrame, expected: DataFrame): DataFrame = {
    val key = Seq("conv_id", "subj", "pred", "obj")
    val a = actual.select(key.map(col): _*).distinct()
      .withColumn("in_a", lit(1))
    val e = expected.select(key.map(col): _*).distinct()
      .withColumn("in_e", lit(1))
    a.join(e.drop("in_e").withColumn("in_e", lit(1)), key, "full_outer")
      .groupBy(col("conv_id"))
      .agg(
        count_if(col("in_a").isNotNull && col("in_e").isNotNull).as("matched"),
        count_if(col("in_a").isNotNull).as("actual"),
        count_if(col("in_e").isNotNull).as("expected"))
      // ANSI mode: guard zero denominators (conv present on one side only)
      .withColumn("precision",
        round(when(col("actual") > 0, col("matched") / col("actual"))
          .otherwise(lit(0.0)), 6))
      .withColumn("recall",
        round(when(col("expected") > 0, col("matched") / col("expected"))
          .otherwise(lit(0.0)), 6))
  }
}
