package graft.kg.query

import graft.kg.rules.Relations
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-graph quality scoring (1-10) — the corpus evaluation operator
  * (evaluate_graphs.py:90-305): weighted deductions from edge validity,
  * connectivity (orphan rate), issue resolution and anchor quality, computed
  * relationally per conversation.
  */
object GraphQuality {

  /** Tier-gated corpus iteration predicate (eval_retrieval_v2.py:62-85
    * `iter_graphs` tier_filter): keep a graph when its lower-cased quality
    * tier is in `tiers`; a missing/null tier behaves like "" and is always
    * skipped when a filter is given — the reference's
    * `g.get("quality_tier", "").lower() not in tier_filter` skip branch.
    * A plain Column predicate, so Catalyst pushes it to the scan. */
  def tierFilter(tierCol: org.apache.spark.sql.Column, tiers: Set[String]): org.apache.spark.sql.Column =
    lower(coalesce(tierCol, lit(""))).isin(tiers.toSeq.map(_.toLowerCase).sorted: _*)

  /** Edge validity: share of edges whose (src_type, tgt_type, relation) is in
    * the validation matrix. The matrix is broadcast as a literal lookup set. */
  def edgeValidity(edges: DataFrame): DataFrame = {
    val validTriples: Seq[String] = Relations.Matrix.toSeq.flatMap {
      case ((s, t), rels) => rels.map(r => s"$s|$t|$r")
    }.sorted
    val typeOf = udf((id: String) => Relations.nodeTypeFromId(id))
    edges
      .withColumn("sig", concat_ws("|",
        typeOf(col("source")), typeOf(col("target")), col("relation")))
      .withColumn("valid", col("sig").isin(validTriples: _*))
      .groupBy(col("convId").as("conv_id"))
      .agg((count_if(col("valid")) / count(lit(1))).as("edge_validity"))
  }

  /** Composite per-conversation quality report + 1-10 score. */
  def score(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val validity = edgeValidity(edges)

    val endpoints = edges.select(col("convId"), col("source").as("id"))
      .union(edges.select(col("convId"), col("target").as("id"))).distinct()
    val connectivity = nodes.filter(col("nodeType") =!= "outcome")
      .join(endpoints.withColumnRenamed("id", "cid"),
        nodes("convId") === endpoints("convId") && nodes("id") === col("cid"), "left")
      .groupBy(nodes("convId").as("conv_id"))
      .agg((count_if(col("cid").isNotNull) / count(lit(1))).as("connectivity"))

    val resolution = nodes.filter(col("nodeType") === "issue")
      .select(col("convId"), col("id").as("issue_id"))
      .join(nodes.filter(col("nodeType") === "holding")
        .select(col("convId"), col("resolvesIssue")),
        Seq("convId"), "left")
      .groupBy(col("convId").as("conv_id"), col("issue_id"))
      .agg(max(when(col("resolvesIssue") === col("issue_id"), 1).otherwise(0)).as("resolved"))
      .groupBy(col("conv_id"))
      .agg((sum(col("resolved")) / count(lit(1))).as("issue_resolution"))

    val anchors = nodes
      .groupBy(col("convId").as("conv_id"))
      .agg((count_if(col("anchor").isNotNull &&
        col("anchor.endChar") > col("anchor.startChar")) / count(lit(1))).as("anchor_quality"))

    validity
      .join(connectivity, Seq("conv_id"), "full_outer")
      .join(resolution, Seq("conv_id"), "full_outer")
      .join(anchors, Seq("conv_id"), "full_outer")
      .na.fill(0.0)
      // weighted 1-10: validity 3, connectivity 3, resolution 2, anchors 1.
      // Rounding is the explicit floor(x·10^k + 0.5)/10^k form: pure IEEE
      // double arithmetic that any engine reproduces bit-exactly, unlike
      // round(), whose half-boundary behavior depends on the engine's
      // decimal-conversion strategy (Spark rounds the shortest decimal
      // repr, DuckDB the binary value — they disagree on x.xx5 scores).
      .withColumn("quality_score", floor((lit(1.0) +
        col("edge_validity") * 3.0 + col("connectivity") * 3.0 +
        col("issue_resolution") * 2.0 + col("anchor_quality") * 1.0) * 100.0 + 0.5) / 100.0)
      .select(col("conv_id"),
        (floor(col("edge_validity") * 10000.0 + 0.5) / 10000.0).as("edge_validity"),
        (floor(col("connectivity") * 10000.0 + 0.5) / 10000.0).as("connectivity"),
        (floor(col("issue_resolution") * 10000.0 + 0.5) / 10000.0).as("issue_resolution"),
        (floor(col("anchor_quality") * 10000.0 + 0.5) / 10000.0).as("anchor_quality"),
        col("quality_score"))
  }
}
