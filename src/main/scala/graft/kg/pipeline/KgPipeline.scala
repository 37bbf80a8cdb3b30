package graft.kg.pipeline

import graft.kg.extract.DocExtractor
import graft.kg.model._
import graft.kg.ontology.{Ontology, OntologyData}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Spark wiring for the KG-construction pipeline.
  *
  * Scale design: one shuffle total for extraction — transcripts are hash
  * partitioned by `conv_id` (`groupByKey`), and the entire per-conversation
  * pipeline (segment → mention-detect → node induction → cluster → edge →
  * JS/chain/tier) runs inside `mapGroups` as pure Scala over one
  * conversation's turns (the reference's per-case unit, run_iltur.py:805-1183,
  * where the asyncio semaphore fan-out becomes task parallelism). The compiled
  * ontology is a broadcast-size value captured in the task closure. All
  * cross-conversation work (canonicalization, stats, retrieval) is relational
  * and happens downstream on the emitted node/edge tables.
  *
  * Conversations are bounded (a transcript has bounded turns), so per-group
  * memory is O(doc length) and 10^12 turns parallelize as ~10^9 independent
  * conversations across executors; AQE coalesces the post-shuffle partitions.
  */
/** Minimal projected input — only the columns extraction needs, so Parquet
  * column pruning drops role/tool/ts at the scan. (Top-level + public: Spark's
  * generated deserializer code must be able to instantiate it.) */
final case class SlimTurn(conv_id: String, turn_idx: Int, text: String)

object KgPipeline {

  /** Run extraction: transcripts (conv_id, turn_idx, ..., text) → ConvGraph. */
  def graphs(
      spark: SparkSession,
      transcripts: DataFrame,
      jurisdiction: String = "in",
      ontology: OntologyData = Ontology.default): Dataset[ConvGraph] = {
    import spark.implicits._
    transcripts
      .select(col("conv_id"), col("turn_idx").cast("int"), col("text"))
      .as[SlimTurn]
      .groupByKey(_.conv_id)
      .mapGroups { (convId, it) =>
        // turns per conversation are bounded; sort in-memory for stable order
        val turns = it.map(t => (t.turn_idx, t.text)).toArray.sortBy(_._1).toSeq
        DocExtractor.extract(convId, turns, ontology, jurisdiction)
      }
  }

  def nodes(g: Dataset[ConvGraph]): Dataset[Node] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[Node]
    g.flatMap(_.nodes)
  }

  def edges(g: Dataset[ConvGraph]): Dataset[EdgeRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[EdgeRow]
    g.flatMap(_.edges)
  }

  def justificationSets(g: Dataset[ConvGraph]): Dataset[JustificationSetRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[JustificationSetRow]
    g.flatMap(_.justificationSets)
  }

  def chains(g: Dataset[ConvGraph]): Dataset[ChainRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[ChainRow]
    g.flatMap(_.chains)
  }

  def clusterMembers(g: Dataset[ConvGraph]): Dataset[ClusterMemberRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[ClusterMemberRow]
    g.flatMap(_.clusterMembers)
  }

  def requirements(g: Dataset[ConvGraph]): Dataset[RequirementRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[RequirementRow]
    g.flatMap(_.requirements)
  }

  def summaries(g: Dataset[ConvGraph]): Dataset[ConvSummary] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[ConvSummary]
    g.map(_.summary)
  }

  /** The (subj, pred, obj) triple projection of the edge table. */
  def triples(edges: Dataset[EdgeRow]): DataFrame =
    edges.toDF().select(
      col("convId").as("conv_id"),
      col("source").as("subj"),
      col("relation").as("pred"),
      col("target").as("obj"))

  /** Orphan detection: node ids that appear in no edge (evaluate_graphs.py:
    * 142-184 / repair_orphans.py:293-322) — left-anti join against the union
    * of edge endpoints. */
  def orphans(nodes: Dataset[Node], edges: Dataset[EdgeRow]): DataFrame = {
    val n = nodes.toDF()
    val e = edges.toDF()
    val connected = e.select(col("convId"), col("source").as("id"))
      .union(e.select(col("convId"), col("target").as("id")))
      .distinct()
    n.select(col("convId"), col("id"), col("nodeType"))
      .join(connected, Seq("convId", "id"), "left_anti")
  }

  /** Quality-tier histogram (checkpoint stats analog, run_iltur.py:625-668). */
  def tierHistogram(summaries: Dataset[ConvSummary]): DataFrame =
    summaries.toDF().groupBy(col("qualityTier")).count().orderBy(col("qualityTier"))
}
