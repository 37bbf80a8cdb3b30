package graft.kg.table

import graft.kg.ontology.{Ontology, OntologyData}
import graft.kg.pipeline.KgPipeline
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Materialize the full KG table set (nodes, edges, triples, justification
  * sets, chains, cluster members, requirements, summaries) partitioned by
  * `bucket = pmod(hash(conv_id), B)`, with one snapshot commit covering the
  * buckets produced in this run and per-bucket lineage rows.
  *
  * Resume: buckets already covered by committed snapshots are filtered out
  * BEFORE the extraction shuffle (the reference's completed-cases skip,
  * run_iltur.py:581-623, lifted from case granularity to bucket granularity).
  * Because the bucket is a deterministic function of conv_id, re-running after
  * a partial failure recomputes only missing buckets and is idempotent.
  */
object Materializer {

  val Tables: Seq[String] = Seq(
    "nodes", "edges", "triples", "justification_sets", "chains",
    "cluster_members", "requirements", "summaries")

  final case class Report(
      snapshotId: Long,
      bucketsCommitted: Seq[Int],
      bucketsSkipped: Seq[Int],
      rows: Map[String, Long])

  def bucketOf(convIdCol: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(hash(convIdCol), lit(nBuckets))

  /** The completed-cases skip (run_iltur.py:581-623 use site): drop every
    * row whose conversation bucket is already committed. Bucket-granular
    * resume — a plain pruning filter on the bucket column, no shuffle, and
    * it preserves within-partition row order (the conversation-contiguous
    * layout survives a resume). */
  def resumeFilter(withBucket: DataFrame, done: Set[Int]): DataFrame =
    if (done.isEmpty) withBucket
    else withBucket.filter(!col("bucket").isin(done.toSeq: _*))

  def run(
      spark: SparkSession,
      transcripts: DataFrame,
      root: String,
      nBuckets: Int = 32,
      jurisdiction: String = "in",
      ontology: OntologyData = null,
      prePartitioned: Boolean = false,
      integrityCheck: Boolean = true): Report = {

    val store = new SnapshotStore(root)
    val done = store.completedBuckets
    val withBucket = transcripts.withColumn("bucket", bucketOf(col("conv_id"), nBuckets))
    val pending = resumeFilter(withBucket, done)

    val allBuckets = (0 until nBuckets).toSet
    val pendingBuckets = (allBuckets -- done).toList.sorted
    if (pendingBuckets.isEmpty)
      return Report(store.snapshots.last.id, Nil, done.toList.sorted, Map.empty)

    // one extraction pass, persisted as a COLUMNAR tagged union and fanned
    // out to the 8 output tables: each table projection reads only its own
    // struct column from the cache (column pruning), where the previous
    // Dataset[ConvGraph] cache paid a full nested-object decode per row for
    // every one of the 8 writes (guide §1.2 "don't compute things you throw
    // away"). The resume filter preserves within-partition order, so the
    // pre-partitioned (shuffle-free) layout stays conversation-contiguous
    // and each branch keeps the exact row order of the per-table flatMaps.
    val union: DataFrame =
      KgPipeline.allTablesDirect(spark, pending.drop("bucket"), jurisdiction,
        Option(ontology).getOrElse(graft.kg.ontology.Ontology.forJurisdiction(jurisdiction)),
        prePartitioned = prePartitioned)
        .toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def branch(name: String): DataFrame =
      union.filter(col(name).isNotNull).select(col(name + ".*"))

    def addBucket(df: DataFrame, convCol: String): DataFrame =
      df.withColumn("bucket", bucketOf(col(convCol), nBuckets))

    val outputs: Seq[(String, DataFrame)] = Seq(
      "nodes" -> branch("node"),
      "edges" -> branch("edge"),
      "triples" -> branch("edge").select(col("convId"), col("source").as("subj"),
        col("relation").as("pred"), col("target").as("obj")),
      "justification_sets" -> branch("js"),
      "chains" -> branch("chain"),
      "cluster_members" -> branch("member"),
      "requirements" -> branch("requirement"),
      "summaries" -> branch("summary"))

    // materialize the shared extraction cache ONCE (a cheap columnar count)
    // before fanning the 8 independent table writes out over a small thread
    // pool: concurrent jobs back-fill each other's straggler tails instead
    // of running 8 short jobs strictly serially. Each write is to its own
    // directory, so ordering is irrelevant; results are identical.
    union.count()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val rowCounts: Map[String, Long] =
      try {
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        val futures = outputs.map { case (name, df) =>
          scala.concurrent.Future {
            val b = addBucket(df, "convId")
            // dynamic partition overwrite: re-running an uncommitted bucket
            // after a mid-write failure replaces (not duplicates) its
            // partition dirs
            b.write.mode(SaveMode.Overwrite)
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("bucket").parquet(s"$root/$name")
            // count what was WRITTEN (column-less scan over the output
            // footers), not a recompute of the table's full lineage
            name -> spark.read.parquet(s"$root/$name").count()
          }
        }
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(futures),
          scala.concurrent.duration.Duration.Inf).toMap
      } finally pool.shutdown()

    // split-integrity guard for the trusting shuffle-free read: if a
    // mid-file split ever cut a conversation in two, the consecutive-run
    // grouping would emit two half-graphs for one conv_id — one graph per
    // conversation is the invariant. Cheap: one conv_id-only distinct over
    // the input vs the already-written summaries count.
    if (prePartitioned && integrityCheck) {
      val nConvs = pending.select(col("conv_id")).distinct().count()
      val nGraphs = rowCounts("summaries")
      require(nGraphs == nConvs,
        s"pre-partitioned read integrity violated: $nGraphs graphs for " +
          s"$nConvs conversations — a file was split mid-conversation " +
          s"(read the layout via KgPipeline.readConversationPartitioned)")
    }

    // per-bucket lineage: extraction counts from summaries + an
    // order-independent content hash over the triple set. Both aggregate the
    // JUST-WRITTEN parquet (tiny columnar scans, bucket-pruned to this run's
    // buckets) instead of re-decoding the extraction cache two more times —
    // the same rows by construction (reconstructStats reads the same files).
    val pendingSet = pendingBuckets
    val lineageAgg = spark.read.parquet(s"$root/summaries")
      .filter(col("bucket").isin(pendingSet: _*))
      .groupBy(col("bucket")).agg(
      count(lit(1)).as("convs"),
      sum(col("nTurns")).as("input_rows"),
      sum(col("nFacts")).as("facts"), sum(col("nConcepts")).as("concepts"),
      sum(col("nIssues")).as("issues"), sum(col("nArguments")).as("arguments"),
      sum(col("nHoldings")).as("holdings"), sum(col("nPrecedents")).as("precedents"),
      sum(col("nEdges")).as("edges"), sum(col("nChains")).as("chains"))
      .collect().map(r => r.getInt(0) -> r).toMap

    val hashByBucket = spark.read.parquet(s"$root/triples")
      .filter(col("bucket").isin(pendingSet: _*))
      .withColumn("rh", xxhash64(concat_ws("|", col("convId"), col("subj"), col("pred"), col("obj"))))
      .groupBy(col("bucket"))
      // bit_xor: order-independent, overflow-free under ANSI mode
      .agg(expr("bit_xor(rh)").as("h"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    union.unpersist()

    val lineage = pendingBuckets.map { b =>
      lineageAgg.get(b) match {
        case Some(r) =>
          BucketLineage(
            bucket = b, stage = "extract",
            inputRows = r.getAs[Long]("input_rows"),
            outputRows = Map(
              "convs" -> r.getAs[Long]("convs"),
              "edges" -> r.getAs[Long]("edges")),
            extractionCounts = Map(
              "facts" -> r.getAs[Long]("facts"), "concepts" -> r.getAs[Long]("concepts"),
              "issues" -> r.getAs[Long]("issues"), "arguments" -> r.getAs[Long]("arguments"),
              "holdings" -> r.getAs[Long]("holdings"), "precedents" -> r.getAs[Long]("precedents"),
              "chains" -> r.getAs[Long]("chains")),
            contentHash = java.lang.Long.toHexString(hashByBucket.getOrElse(b, 0L)))
        case None => // bucket had no conversations — still committed as done
          BucketLineage(b, "extract", 0L, Map.empty, Map.empty, "0")
      }
    }

    val snap = store.commit(lineage)
    Report(snap.id, pendingBuckets, done.toList.sorted, rowCounts)
  }

  /** Read a materialized table (bucket-partitioned parquet). */
  def read(spark: SparkSession, root: String, table: String): DataFrame =
    spark.read.parquet(s"$root/$table")

  /** Stats reconstruction (run_iltur.py:625-668): when the snapshot log is
    * lost or partial, re-derive per-bucket lineage (counts + content hash)
    * from the materialized tables themselves and commit a fresh snapshot
    * covering every bucket found on disk. Returns the new snapshot. */
  def reconstructStats(spark: SparkSession, root: String): Snapshot = {
    val summaries = read(spark, root, "summaries")
    val lineageAgg = summaries.groupBy(col("bucket")).agg(
      count(lit(1)).as("convs"), sum(col("nTurns")).as("input_rows"),
      sum(col("nFacts")).as("facts"), sum(col("nConcepts")).as("concepts"),
      sum(col("nIssues")).as("issues"), sum(col("nArguments")).as("arguments"),
      sum(col("nHoldings")).as("holdings"), sum(col("nPrecedents")).as("precedents"),
      sum(col("nEdges")).as("edges"), sum(col("nChains")).as("chains"))
      .collect().map(r => r.getInt(0) -> r).toMap
    val hashByBucket = read(spark, root, "triples")
      .withColumn("rh", xxhash64(concat_ws("|",
        col("convId"), col("subj"), col("pred"), col("obj"))))
      .groupBy(col("bucket")).agg(expr("bit_xor(rh)").as("h"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val lineage = lineageAgg.keys.toList.sorted.map { b =>
      val r = lineageAgg(b)
      BucketLineage(b, "reconstruct", r.getAs[Long]("input_rows"),
        Map("convs" -> r.getAs[Long]("convs"), "edges" -> r.getAs[Long]("edges")),
        Map("facts" -> r.getAs[Long]("facts"), "concepts" -> r.getAs[Long]("concepts"),
          "issues" -> r.getAs[Long]("issues"), "arguments" -> r.getAs[Long]("arguments"),
          "holdings" -> r.getAs[Long]("holdings"), "precedents" -> r.getAs[Long]("precedents"),
          "chains" -> r.getAs[Long]("chains")),
        java.lang.Long.toHexString(hashByBucket.getOrElse(b, 0L)))
    }
    new SnapshotStore(root).commit(lineage)
  }
}
