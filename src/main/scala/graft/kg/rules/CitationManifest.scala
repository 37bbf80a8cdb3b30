package graft.kg.rules

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-level citation manifest — the aggregation the reference builds
  * per case for its precedent pass (citation_preprocess.py:332-360, top-50
  * manifest of regex-detected citations) lifted to table scale: scan every
  * document with the full jurisdiction grammar (all patterns + keep-longest
  * overlap dedup), then the top-k citations by frequency.
  *
  * The scan is a mapPartitions over the compiled pattern grammar (regex
  * alternation with overlap-dedup state is not expressible as native
  * columns); everything downstream is relational. */
object CitationManifest {

  /** (id, citation, citation_type, case_year) — one row per deduped hit. */
  def scan(spark: SparkSession, df: DataFrame, idCol: String, textCol: String,
           jurisdiction: String = "in"): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        Citations.extract(Option(text).getOrElse(""), jurisdiction).iterator
          .map(h => (id, h.citation, h.citationType,
            h.caseYear.map(Int.box).orNull: Integer))
      })
      .toDF(idCol, "citation", "citation_type", "case_year")
  }

  /** Top-k citations by document frequency (ties broken by citation text —
    * deterministic under any partitioning). */
  def manifest(spark: SparkSession, df: DataFrame, idCol: String, textCol: String,
               jurisdiction: String = "in", maxItems: Int = 50): DataFrame =
    scan(spark, df, idCol, textCol, jurisdiction)
      .groupBy(col("citation"), col("citation_type"))
      .agg(countDistinct(col(idCol)).as("n_docs"), count(lit(1)).as("n_hits"))
      .orderBy(col("n_docs").desc, col("citation").asc)
      .limit(maxItems)
}
