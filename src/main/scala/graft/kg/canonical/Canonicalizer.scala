package graft.kg.canonical

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-conversation entity canonicalization.
  *
  * The reference deduplicates concepts only WITHIN one document
  * (extractor.py:4052-4104, group by concept_id + keep best anchor). At
  * corpus scale the same entities recur across conversations; this module
  * assigns every concept/precedent mention a global `canonical_id`:
  *
  *  - concepts: the ontology concept_id IS the canonical key (the broadcast
  *    alias dictionary already linked mentions to it).
  *  - precedents: each mention carries up to two keys — a name key
  *    ("case:" + normalized case name) and a citation key ("cit:" + type +
  *    normalized citation string). Mentions observed with BOTH keys create
  *    candidate-match edges; connected components over the name↔citation
  *    bipartite graph (union-find) merge e.g. "Maneka Gandhi v. Union of
  *    India" with "AIR 1978 SC 597" wherever either appears alone. The
  *    canonical id is the lexicographically smallest key in the component
  *    (deterministic under any partitioning).
  *
  * Hot entities (famous precedents appearing in most conversations) make the
  * component label and the final groupBy skewed — mitigated by AQE skew-join
  * handling plus the two-phase (salted) aggregation in `entityStats`.
  *
  * CONTRACT — one live invocation per session: each top-level call
  * (`canonicalTriples` / `canonicalPrecedents` / `entityStats`) unpersists
  * the caches backing the PREVIOUS invocation's returned frame. Run each
  * returned DataFrame's action(s) to completion before the next invocation
  * on the same session; a frame held across invocations stays correct but
  * silently recomputes its lineage (no cache) when acted on later. Do not
  * interleave concurrent invocations on one session.
  */
object Canonicalizer {

  private def normName(c: org.apache.spark.sql.Column) =
    lower(regexp_replace(trim(c), "\\s+", " "))

  /** Per-session registry of the DataFrames this module has persisted.
    * persist() registers a CacheManager entry the session strong-references
    * for its lifetime, so without cleanup every canonicalTriples /
    * canonicalPrecedents invocation leaked one (Bench re-enters 5+ times per
    * session, kg_* queries per rep). Each top-level call releases the
    * PREVIOUS invocation's caches on entry — the consumer has acted on them
    * by then in every call pattern we have (Verify/Bench run one query to
    * completion before the next); a straggler plan merely recomputes.
    * Stopped sessions are evicted so a long-lived JVM cycling sessions does
    * not grow driver memory. */
  private val pinned = new java.util.IdentityHashMap[SparkSession, List[DataFrame]]()

  private def pin(spark: SparkSession, df: DataFrame): DataFrame = pinned.synchronized {
    val it = pinned.entrySet().iterator()
    while (it.hasNext) if (it.next().getKey.sparkContext.isStopped) it.remove()
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pinned.put(spark, p :: Option(pinned.get(spark)).getOrElse(Nil))
    p
  }

  /** Unpersist every DataFrame this module cached for `spark`. Called
    * automatically on re-entry; callers may also invoke it once their final
    * action on a returned frame completes. */
  def releaseCaches(spark: SparkSession): Unit = pinned.synchronized {
    Option(pinned.remove(spark)).getOrElse(Nil).foreach(_.unpersist(false))
  }

  /** Per-mention keys for precedent nodes: (convId, id, nameKey?, citKey). */
  def precedentKeys(nodes: DataFrame): DataFrame =
    nodes.filter(col("nodeType") === "precedent")
      .select(
        col("convId"), col("id"),
        when(col("caseName").isNotNull,
          concat(lit("case:"), normName(col("caseName")))).as("name_key"),
        concat(lit("cit:"), col("citationType"), lit(":"),
          normName(col("citation"))).as("cit_key"))

  /** Mention → canonical_id for every precedent node.
    *
    * Job shape: ONE action here (runAuto's bounded take; the final join is
    * lazy). `keys` persists lazily instead of an eager localCheckpoint, and
    * the candidate edges are NOT pre-distinct'ed — runAuto distincts its
    * input anyway, so the upstream distincts were two redundant shuffles of
    * the mention stream per run. Persisted via `pin`: the previous
    * invocation's cache entries are unpersisted on re-entry (see `pinned`). */
  def canonicalPrecedents(spark: SparkSession, nodes: DataFrame): DataFrame = {
    releaseCaches(spark)
    val keys = pin(spark, precedentKeys(nodes))
    val pairEdges = keys.filter(col("name_key").isNotNull)
      .select(col("name_key").as("src"), col("cit_key").as("dst"))
    // self-edges keep citation-only keys present in the component table
    val selfEdges = keys.select(col("cit_key").as("src"), col("cit_key").as("dst"))
    val comps = ConnectedComponents.runAuto(spark, pairEdges.union(selfEdges))
    keys
      .join(comps.withColumnRenamed("id", "cit_key"), Seq("cit_key"), "left")
      .select(col("convId"), col("id"),
        coalesce(col("component"), col("cit_key")).as("canonical_id"))
  }

  /** Mention → canonical_id for every concept node (broadcast-dictionary key). */
  def canonicalConcepts(nodes: DataFrame): DataFrame =
    nodes.filter(col("nodeType") === "concept")
      .select(col("convId"), col("id"),
        concat(lit("concept:"), col("conceptId")).as("canonical_id"))

  /** Full mention→canonical mapping (precedents ∪ concepts; other node kinds
    * are conversation-local by nature and keep conv-scoped ids). */
  def mentionMap(spark: SparkSession, nodes: DataFrame): DataFrame =
    canonicalPrecedents(spark, nodes).union(canonicalConcepts(nodes))

  /** Rewrite the triple table onto canonical entity ids (the cross-document
    * analog of rewire_edges_after_dedup, extractor.py:4107-4116).
    *
    * Shuffle shape: the mapping is conversation-local, so BOTH resolution
    * joins key on (convId, endpoint). Co-partitioning edges and mapping by
    * convId alone satisfies the clustering requirement of both joins
    * (HashPartitioning on a subset of the join keys), so subj and obj
    * resolve with TWO exchanges total — the naive plan re-shuffled the edge
    * stream and the mapping once per endpoint (four exchanges), which at
    * corpus scale doubles the largest shuffle of the pipeline. */
  def canonicalTriples(spark: SparkSession, nodes: DataFrame, edges: DataFrame): DataFrame = {
    // persist (lazy, via pin — released on the next invocation) rather than
    // an eager localCheckpoint: the mapping materializes inside the
    // consumer's own job, and the shared repartition node below is reused by
    // both the subj and obj branches
    val mapping = pin(spark, mentionMap(spark, nodes))
      .repartition(col("convId"))
    val subjMap = mapping.withColumnRenamed("id", "source")
      .withColumnRenamed("canonical_id", "subj_canonical")
    val objMap = mapping.withColumnRenamed("id", "target")
      .withColumnRenamed("canonical_id", "obj_canonical")
    edges
      .repartition(col("convId"))
      .join(subjMap, Seq("convId", "source"), "left")
      .join(objMap, Seq("convId", "target"), "left")
      .select(
        col("convId").as("conv_id"),
        coalesce(col("subj_canonical"),
          concat(col("convId"), lit("/"), col("source"))).as("subj"),
        col("relation").as("pred"),
        coalesce(col("obj_canonical"),
          concat(col("convId"), lit("/"), col("target"))).as("obj"))
  }

  /** Per-canonical-entity mention counts via two-phase SALTED aggregation:
    * hot entities (a doctrine cited in most conversations) would skew a
    * single groupBy at 10^12-turn scale, so phase 1 pre-aggregates on
    * (entity, salt) and phase 2 combines the S partial rows per entity. */
  def entityStats(spark: SparkSession, nodes: DataFrame, salts: Int = 16): DataFrame = {
    val mapping = mentionMap(spark, nodes)
    mapping
      .withColumn("salt", pmod(hash(col("convId")), lit(salts)))
      .groupBy(col("canonical_id"), col("salt"))
      .agg(count(lit(1)).as("partial_mentions"),
        approx_count_distinct(col("convId")).as("partial_convs"))
      .groupBy(col("canonical_id"))
      .agg(sum(col("partial_mentions")).as("n_mentions"),
        sum(col("partial_convs")).as("n_convs_approx"))
  }
}
