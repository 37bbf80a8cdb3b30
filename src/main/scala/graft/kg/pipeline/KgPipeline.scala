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

/** Tagged union emitted by [[KgPipeline.nodesAndEdgesDirect]]: one extraction
  * pass yields BOTH projections, so a caller that needs nodes and edges
  * persists this dataset once instead of extracting twice. (Top-level +
  * public for the Spark encoder.) */
final case class NodeOrEdge(node: Option[Node], edge: Option[EdgeRow])

/** Column-pruned mention row for cross-conversation canonicalization: only
  * concept/precedent nodes, only the key-material columns
  * ([[graft.kg.canonical.Canonicalizer]] reads nothing else). */
final case class MentionKeyRow(
    convId: String, id: String, nodeType: String, conceptId: String,
    caseName: String, citation: String, citationType: String)

/** Column-pruned edge row for the canonical triple rewrite. */
final case class TripleEdgeRow(convId: String, source: String, relation: String, target: String)

/** Tagged union of EVERY materialized table's row type, emitted by
  * [[KgPipeline.allTablesDirect]] in one extraction pass. Persisted as a
  * DataFrame (columnar cache), each table projection reads ONLY its own
  * struct column — unlike a cached Dataset[ConvGraph], whose every
  * projection pays a full object-decode of the nested graph per row.
  * (Top-level + public for the Spark encoder.) */
final case class MatRow(
    node: Option[Node], edge: Option[EdgeRow], js: Option[JustificationSetRow],
    chain: Option[ChainRow], member: Option[ClusterMemberRow],
    requirement: Option[RequirementRow], summary: Option[ConvSummary])

/** Tagged union emitted by [[KgPipeline.canonicalInputsDirect]]: the
  * extraction-boundary projection of exactly what canonicalization consumes.
  * The full [[NodeOrEdge]] union persists every node field (text, anchors,
  * provenance — ~10× the bytes); when the downstream is canonical triples
  * only, pruning at the extraction boundary is the same column-pruning
  * Catalyst would apply to a relational scan. */
final case class CanonInputRow(m: Option[MentionKeyRow], e: Option[TripleEdgeRow])

object KgPipeline {

  /** Partition count for the conv_id exchange: cores × 4. The extraction
    * stage is CPU-bound with tiny shuffle bytes, so AQE's size-based
    * coalescing would shrink it to a handful of tasks and idle most cores
    * (measured 15 tasks on 32 cores → 0.37 scaling efficiency). An explicit
    * numPartitions repartition is exempt from AQE coalescing and satisfies
    * groupByKey's clustered distribution, so no second exchange is added. */
  private def extractionPartitions(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.extract.partitions").map(_.toInt)
      .getOrElse(spark.sparkContext.defaultParallelism * 4)

  /** One exchange total: explicit hash repartition on conv_id (AQE-exempt)
    * + sortWithinPartitions, then consecutive-run grouping in mapPartitions.
    * Dataset.groupByKey is NOT used: its lambda key forces a second
    * exchange that AQE size-coalesces to ~10 tasks (shuffle bytes are tiny
    * while the downstream extraction is CPU-bound), idling most cores. */
  private def slimTurns(spark: SparkSession, transcripts: DataFrame): Dataset[SlimTurn] = {
    import spark.implicits._
    transcripts
      .select(col("conv_id"), col("turn_idx").cast("int"), col("text"))
      .repartition(extractionPartitions(spark), col("conv_id"))
      // text as final sort key: a TOTAL order even under duplicate turn_idx,
      // so output never depends on shuffle arrival order
      .sortWithinPartitions(col("conv_id"), col("turn_idx"), col("text"))
      .as[SlimTurn]
  }

  /** Iterate consecutive same-conv_id runs (rows are co-partitioned and
    * sorted), invoking the extractor once per conversation. */
  private def perConversation[T](
      it: Iterator[SlimTurn],
      ontology: OntologyData,
      jurisdiction: String)(f: ConvGraph => IterableOnce[T]): Iterator[T] = {
    val rows = it.buffered
    new Iterator[Iterator[T]] {
      def hasNext: Boolean = rows.hasNext
      def next(): Iterator[T] = {
        val convId = rows.head.conv_id
        val turns = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
        while (rows.hasNext && rows.head.conv_id == convId) {
          val t = rows.next()
          turns += ((t.turn_idx, t.text))
        }
        // already sorted by turn_idx via sortWithinPartitions
        f(DocExtractor.extract(convId, turns.toSeq, ontology, jurisdiction)).iterator
      }
    }.flatten
  }

  /** Write transcripts in the conversation-contiguous production layout:
    * hash-partitioned by conv_id into `nFiles` files, rows sorted by
    * (conv_id, turn_idx) inside each file. Tables in this layout are read
    * back SHUFFLE-FREE by the `prePartitioned = true` extraction paths —
    * at 100 TB this removes the only exchange of the extraction stage.
    * Files must stay below spark.sql.files.maxPartitionBytes so the reader
    * never splits one mid-conversation; size nFiles accordingly. */
  def writeConversationPartitioned(
      transcripts: DataFrame, path: String, nFiles: Int): Unit =
    transcripts
      .repartition(nFiles, col("conv_id"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx"), col("text"))
      .write.mode("overwrite").parquet(path)

  /** Read a layout written by [[writeConversationPartitioned]] with
    * FILE-GRANULAR parallelism and a no-mid-file-split guarantee.
    *
    * Spark's default file bin-packing governs both properties and gets both
    * wrong for this layout:
    *  - small files are PACKED (`totalBytes` includes the 4 MB
    *    `openCostInBytes` per file, so at 32 cores 128 small files collapse
    *    to ~32 single-wave scan partitions, forfeiting straggler
    *    amortization — measured 128 → 32 partitions on the bench layout);
    *  - a file larger than `maxPartitionBytes` is byte-range SPLIT, and a
    *    split at a row-group boundary cuts a conversation in two — the
    *    downstream consecutive-run grouping would silently emit two
    *    half-graphs for one conv_id.
    * Setting `openCostInBytes == maxPartitionBytes > max(file size)` makes
    * every file fill its own bin: exactly one whole file per task, asserted
    * below. NOTE: the two file-source confs stay set on the session (Spark
    * resolves them at execution planning, so they cannot be restored here);
    * they only coarsen packing for other reads, never correctness. */
  def readConversationPartitioned(spark: SparkSession, path: String): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(hPath)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    require(files.nonEmpty, s"no part-files under $path")
    val cap = math.max(files.map(_.getLen).max + 1, 32L * 1024 * 1024)
    spark.conf.set("spark.sql.files.maxPartitionBytes", cap.toString)
    spark.conf.set("spark.sql.files.openCostInBytes", cap.toString)
    val df = spark.read.parquet(path)
    val parts = df.rdd.getNumPartitions
    require(parts == files.length,
      s"conversation-contiguous read wants 1 file per task; " +
        s"got $parts partitions for ${files.length} files")
    df
  }

  /** Trusting read of the conversation-contiguous layout: no exchange, no
    * sort — every conversation's rows are already contiguous and ordered
    * within one file, and file boundaries never cut a conversation (each
    * conv hashes to exactly one write partition = one file). Obtain the
    * DataFrame via [[readConversationPartitioned]], which pins one whole
    * file per task — a raw `spark.read.parquet` is subject to bin-packing
    * (slow) and mid-file splits (silently wrong once files exceed
    * `spark.sql.files.maxPartitionBytes`). */
  private def slimTurnsPrePartitioned(
      spark: SparkSession, transcripts: DataFrame): Dataset[SlimTurn] = {
    import spark.implicits._
    transcripts
      .select(col("conv_id"), col("turn_idx").cast("int"), col("text"))
      .as[SlimTurn]
  }

  /** Run extraction: transcripts (conv_id, turn_idx, ..., text) → ConvGraph. */
  def graphs(
      spark: SparkSession,
      transcripts: DataFrame,
      jurisdiction: String = "in",
      ontology: OntologyData = null,
      prePartitioned: Boolean = false): Dataset[ConvGraph] = {
    import spark.implicits._
    val ont = Option(ontology).getOrElse(Ontology.forJurisdiction(jurisdiction))
    val slim =
      if (prePartitioned) slimTurnsPrePartitioned(spark, transcripts)
      else slimTurns(spark, transcripts)
    slim.mapPartitions(it => perConversation(it, ont, jurisdiction)(Iterator.single(_)))
  }

  /** Fast path: run extraction and emit projected rows DIRECTLY from
    * `flatMapGroups`, skipping the heavyweight ConvGraph encoder round-trip
    * (serialize deep nested graph → deserialize → re-serialize projection).
    * This is the production shape for single-table outputs: one shuffle, one
    * small-row encoder. */
  def flatExtract[T: org.apache.spark.sql.Encoder](
      spark: SparkSession,
      transcripts: DataFrame,
      jurisdiction: String = "in",
      ontology: OntologyData = Ontology.default,
      prePartitioned: Boolean = false)(
      f: ConvGraph => IterableOnce[T]): Dataset[T] = {
    val slim =
      if (prePartitioned) slimTurnsPrePartitioned(spark, transcripts)
      else slimTurns(spark, transcripts)
    slim.mapPartitions(it => perConversation(it, ontology, jurisdiction)(f))
  }

  /** Extraction → (subj, pred, obj) triples in one pass (the bench metric). */
  def triplesDirect(
      spark: SparkSession,
      transcripts: DataFrame,
      jurisdiction: String = "in",
      prePartitioned: Boolean = false): Dataset[Triple] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[Triple]
    flatExtract(spark, transcripts, jurisdiction, prePartitioned = prePartitioned) { g =>
      g.edges.map(e => Triple(g.summary.convId, e.source, e.relation, e.target))
    }
  }

  /** Extraction → edges in one pass. */
  def edgesDirect(
      spark: SparkSession,
      transcripts: DataFrame,
      jurisdiction: String = "in",
      prePartitioned: Boolean = false): Dataset[EdgeRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[EdgeRow]
    flatExtract(spark, transcripts, jurisdiction, prePartitioned = prePartitioned)(_.edges)
  }

  /** Extraction → nodes in one pass. */
  def nodesDirect(
      spark: SparkSession,
      transcripts: DataFrame,
      jurisdiction: String = "in",
      prePartitioned: Boolean = false): Dataset[Node] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[Node]
    flatExtract(spark, transcripts, jurisdiction, prePartitioned = prePartitioned)(_.nodes)
  }

  /** Extraction → nodes AND edges in ONE pass, as a tagged union. Persist
    * the result and project with `flatMap(_.node)` / `flatMap(_.edge)`:
    * extraction (the expensive stage) runs once, not once per projection. */
  def nodesAndEdgesDirect(
      spark: SparkSession,
      transcripts: DataFrame,
      jurisdiction: String = "in",
      prePartitioned: Boolean = false): Dataset[NodeOrEdge] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[NodeOrEdge]
    flatExtract(spark, transcripts, jurisdiction, prePartitioned = prePartitioned) { g =>
      g.nodes.iterator.map(n => NodeOrEdge(Some(n), None)) ++
        g.edges.iterator.map(e => NodeOrEdge(None, Some(e)))
    }
  }

  /** Extraction → canonicalization inputs in ONE pass, pruned at the
    * boundary: mention-key rows for concept/precedent nodes + slim edge
    * rows. Persist the result and project with `filter(m.isNotNull)` /
    * `filter(e.isNotNull)` — the canonical-triple chain then caches ~10×
    * fewer bytes than the full [[NodeOrEdge]] union. */
  def canonicalInputsDirect(
      spark: SparkSession,
      transcripts: DataFrame,
      jurisdiction: String = "in",
      prePartitioned: Boolean = false): Dataset[CanonInputRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[CanonInputRow]
    flatExtract(spark, transcripts, jurisdiction, prePartitioned = prePartitioned) { g =>
      g.nodes.iterator
        .filter(n => n.nodeType == "concept" || n.nodeType == "precedent")
        .map(n => CanonInputRow(Some(MentionKeyRow(n.convId, n.id, n.nodeType,
          n.conceptId, n.caseName, n.citation, n.citationType)), None)) ++
        g.edges.iterator.map(e => CanonInputRow(None,
          Some(TripleEdgeRow(e.convId, e.source, e.relation, e.target))))
    }
  }

  /** Extraction → ALL 7 table projections in ONE pass, as a tagged union
    * (one branch per output table; triples derive from the edge branch).
    * Persist `.toDF()` and project each table with
    * `filter(col(branch).isNotNull).select(col("branch.*"))`: extraction
    * runs once, and every projection is a column-pruned scan of the
    * columnar cache instead of a full ConvGraph object decode. Emission
    * order per conversation (nodes, edges, js, chains, members,
    * requirements, summary) keeps each filtered branch in exactly the row
    * order the per-table `flatMap` projections produced. */
  private def matRows(g: ConvGraph): Iterator[MatRow] = {
    val empty = MatRow(None, None, None, None, None, None, None)
    g.nodes.iterator.map(n => empty.copy(node = Some(n))) ++
      g.edges.iterator.map(e => empty.copy(edge = Some(e))) ++
      g.justificationSets.iterator.map(j => empty.copy(js = Some(j))) ++
      g.chains.iterator.map(c => empty.copy(chain = Some(c))) ++
      g.clusterMembers.iterator.map(m => empty.copy(member = Some(m))) ++
      g.requirements.iterator.map(r => empty.copy(requirement = Some(r))) ++
      Iterator.single(empty.copy(summary = Some(g.summary)))
  }

  def allTablesDirect(
      spark: SparkSession,
      transcripts: DataFrame,
      jurisdiction: String = "in",
      ontology: OntologyData = Ontology.default,
      prePartitioned: Boolean = false): Dataset[MatRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MatRow]
    flatExtract(spark, transcripts, jurisdiction, ontology, prePartitioned)(matRows)
  }

  /** The same tagged union projected from an already-extracted graph
    * dataset (one object-decode pass; projections of the persisted result
    * are then column-pruned cache scans). */
  def allTables(g: Dataset[ConvGraph]): Dataset[MatRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[MatRow]
    g.flatMap(matRows)
  }

  /** Extraction → per-conversation summaries in one pass. */
  def summariesDirect(
      spark: SparkSession,
      transcripts: DataFrame,
      jurisdiction: String = "in",
      prePartitioned: Boolean = false): Dataset[ConvSummary] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[ConvSummary]
    flatExtract(spark, transcripts, jurisdiction, prePartitioned = prePartitioned)(
      g => Iterator.single(g.summary))
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
  def orphans(nodes: Dataset[_], edges: Dataset[_]): DataFrame = {
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
