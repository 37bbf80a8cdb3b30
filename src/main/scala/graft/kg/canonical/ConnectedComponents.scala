package graft.kg.canonical

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over a string-keyed edge list via
  * iterative min-label propagation — the union-find of the north rule's
  * salt-keyed canonicalization, expressed as DataFrame joins so Catalyst/AQE
  * (incl. skew-join splitting for hot entities) plan the physical execution.
  *
  * Converges in O(component diameter) rounds; canonicalization graphs are
  * near-bipartite (mention-key ↔ mention-key through shared entities), so
  * diameters are small. `localCheckpoint` every round truncates lineage, the
  * standard guard for iterative DataFrame jobs. No GraphFrames dependency.
  */
object ConnectedComponents {

  /** Diagnostics from the most recent [[runAuto]]/[[run]] in this JVM —
    * read by scale probes/reports, never by the query path. `edges` is the
    * distinct directed edge count observed by the strategy gate (exact on
    * the local branch; localThreshold+1 means the bounded take overflowed
    * and the distributed loop ran). `iterations` is 0 for the local
    * union-find. */
  final case class RunStats(strategy: String, edges: Long, iterations: Int)
  @volatile private[graft] var lastStats: RunStats = RunStats("none", 0L, 0)

  /** edges(src, dst) → components(id, component), choosing the strategy by
    * the DISTINCT edge count: candidate-match graphs are orders of magnitude
    * smaller than the corpus (distinct entity keys, not mention rows), so up
    * to `localThreshold` distinct edges a driver-side union-find + broadcast
    * beats ~10 iterative shuffle rounds of fixed driver latency; beyond it
    * the distributed min-label loop takes over. Both produce identical
    * smallest-reachable-id labels. */
  def runAuto(spark: SparkSession, edges: DataFrame,
              localThreshold: Long = 2000000L): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    // ONE bounded job decides the strategy AND feeds the local path:
    // take(threshold+1) caps driver memory (vs a count job + a checkpoint
    // job + a collect job — fixed per-job latency was the dominant cost of
    // small canonicalization graphs at high core counts). Only the rare
    // over-threshold graph pays a recompute when the distributed loop
    // re-evaluates the distinct (then pinned via localCheckpoint inside run).
    val cap = math.min(localThreshold, Int.MaxValue - 8L).toInt
    val taken = sym.take(cap + 1)
    if (taken.length <= cap) {
      lastStats = RunStats("local", taken.length.toLong, 0)
      runLocal(spark, taken.map(r => (r.getString(0), r.getString(1))))
    } else {
      val out = run(spark, sym)
      lastStats = lastStats.copy(edges = taken.length.toLong)
      out
    }
  }

  /** Driver-side union-find over a (small, distinct) edge list. */
  private def runLocal(spark: SparkSession, pairs: Array[(String, String)]): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for ((a, b) <- pairs) {
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        // min-id root keeps labels identical to the distributed variant
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val rows = parent.keys.toSeq.sorted.map(k => (k, find(k)))
    rows.toDF("id", "component")
  }

  /** edges(src, dst) → components(id, component) where component is the
    * lexicographically smallest reachable id (deterministic label). Isolated
    * ids appear iff present as a self-edge or endpoint.
    *
    * Each round combines one hop of neighbor-min propagation with one
    * POINTER-JUMPING step (relabel to the label's own label — labels are
    * always node ids, so the lookup is a self-join). Jumping compresses
    * label chains geometrically: convergence is O(log diameter) rounds, so
    * a degenerate 10^6-node path needs ~20 rounds, not 10^6 — the property
    * that makes the distributed branch safe for arbitrary candidate graphs
    * at corpus scale, not just the small-diameter ones canonicalization
    * usually produces. */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 64): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint()

    var comps = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()

    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // candidate label for each dst: the component of each neighbor src
      val candidates = sym
        .join(comps.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("component")).as("nbr"))
      val hop = comps.join(candidates, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr"), col("component"))).as("component"))
      // pointer jump: component := component(component) — monotone (labels
      // only decrease), halves label-chain length every round
      val jump = hop.select(col("id").as("component"), col("component").as("comp2"))
      val next = hop.join(jump, Seq("component"), "left")
        .select(col("id"),
          coalesce(col("comp2"), col("component")).as("component"))
        .localCheckpoint()
      changed = next.alias("n").join(comps.alias("c"), "id")
        .filter(col("n.component") =!= col("c.component")).count()
      comps = next
      iter += 1
    }
    if (changed > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"ConnectedComponents.run did NOT converge in $maxIter rounds — labels may be non-minimal")
    lastStats = RunStats("distributed", -1L, iter) // edges unknown here; runAuto fills it
    comps
  }
}
