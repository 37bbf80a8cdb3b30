package graft

import graft.kg.gen.TranscriptGen
import graft.kg.pipeline.KgPipeline
import graft.kg.table.{BucketLineage, Materializer, SnapshotStore}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SparkPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def transcriptsDF(n: Int) = {
    import spark.implicits._
    TranscriptGen.turns(n, 12).toDF()
  }

  test("triplesDirect is invariant to input partitioning") {
    val df = transcriptsDF(40)
    val a = KgPipeline.triplesDirect(spark, df.repartition(1))
      .collect().map(_.toString).sorted
    val b = KgPipeline.triplesDirect(spark, df.repartition(13))
      .collect().map(_.toString).sorted
    assert(a.nonEmpty)
    assert(a.toSeq == b.toSeq)
  }

  test("shuffle-free pre-partitioned extraction equals the shuffled path") {
    val df = transcriptsDF(60)
    val path = Files.createTempDirectory("graft_prepart").toString + "/t"
    KgPipeline.writeConversationPartitioned(df, path, nFiles = 7)
    val pre = spark.read.parquet(path)
    val a = KgPipeline.triplesDirect(spark, pre, prePartitioned = true)
      .collect().map(_.toString).sorted
    val b = KgPipeline.triplesDirect(spark, df)
      .collect().map(_.toString).sorted
    assert(a.nonEmpty && a.toSeq == b.toSeq)
    // and the pre-partitioned plan really has no exchange
    val plan = KgPipeline.triplesDirect(spark, pre, prePartitioned = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("readConversationPartitioned pins 1 file/task; raw reads can split conversations") {
    import spark.implicits._
    val df = transcriptsDF(60)
    val dir = Files.createTempDirectory("graft_split").toString + "/t"
    // the production layout, but with TINY parquet row groups so files carry
    // many row groups (the 100-TB shape, where files exceed one row group)
    df.repartition(2, col("conv_id"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx"), col("text"))
      .write.option("parquet.block.size", "2048").parquet(dir)
    val (oldMax, oldOpen) = (
      spark.conf.get("spark.sql.files.maxPartitionBytes"),
      spark.conf.get("spark.sql.files.openCostInBytes"))
    try {
      // adversarial session confs: byte-range splits bisect the files
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val raw = spark.read.parquet(dir)
      assert(raw.rdd.getNumPartitions > 2, "expected the raw read to split files")
      // the trusting read on a SPLIT file emits >1 graph for some conv_id —
      // this is the silent-correctness cliff the pinned reader exists to close
      val rawConvs = KgPipeline
        .summariesDirect(spark, raw, prePartitioned = true)
        .toDF().select(col("convId")).collect().map(_.getString(0))
      assert(rawConvs.length > rawConvs.distinct.length,
        "adversarial split no longer bisects conversations; tighten the confs")
      // the pinned reader is immune: overrides the confs, one whole file per task
      val pinned = KgPipeline.readConversationPartitioned(spark, dir)
      assert(pinned.rdd.getNumPartitions == 2)
      val a = KgPipeline.triplesDirect(spark, pinned, prePartitioned = true)
        .collect().map(_.toString).sorted
      val b = KgPipeline.triplesDirect(spark, df).collect().map(_.toString).sorted
      assert(a.nonEmpty && a.toSeq == b.toSeq)
      // and the materializer's integrity guard catches the split read
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val root = Files.createTempDirectory("graft_split_mat").toString
      val ex = intercept[IllegalArgumentException] {
        Materializer.run(spark, spark.read.parquet(dir), root,
          nBuckets = 4, prePartitioned = true)
      }
      assert(ex.getMessage.contains("integrity"))
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", oldMax)
      spark.conf.set("spark.sql.files.openCostInBytes", oldOpen)
    }
  }

  test("materializer writes all tables, commits snapshot with lineage") {
    val root = Files.createTempDirectory("graft_mat").toString
    val report = Materializer.run(spark, transcriptsDF(60), root, nBuckets = 8)
    assert(report.snapshotId == 0)
    assert(report.bucketsCommitted.size == 8)
    for (t <- Materializer.Tables) {
      val df = Materializer.read(spark, root, t)
      assert(df.count() > 0, s"table $t empty")
      assert(df.columns.contains("bucket"))
    }
    val store = new SnapshotStore(root)
    assert(store.completedBuckets == (0 until 8).toSet)
    val lin = store.snapshots.head.lineage
    assert(lin.map(_.extractionCounts.getOrElse("holdings", 0L)).sum >= 50)
    assert(lin.forall(_.contentHash.nonEmpty))
  }

  test("resume skips committed buckets and is idempotent") {
    val root = Files.createTempDirectory("graft_resume").toString
    val df = transcriptsDF(60)
    // pre-commit buckets 0..3 as if a prior run finished them
    val store = new SnapshotStore(root)
    store.commit((0 until 4).map(b => BucketLineage(b, "extract", 0, Map.empty, Map.empty, "x")))
    val report = Materializer.run(spark, df, root, nBuckets = 8)
    assert(report.bucketsSkipped == (0 until 4).toList)
    assert(report.bucketsCommitted == (4 until 8).toList)
    // only pending buckets materialized
    val triples = Materializer.read(spark, root, "triples")
    val buckets = triples.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(buckets.subsetOf((4 until 8).toSet))
    // second run: nothing to do
    val again = Materializer.run(spark, df, root, nBuckets = 8)
    assert(again.bucketsCommitted.isEmpty)
    assert(new SnapshotStore(root).completedBuckets == (0 until 8).toSet)
  }

  test("corrupt snapshot manifests are skipped (self-healing recovery)") {
    val root = Files.createTempDirectory("graft_corrupt").toString
    val store = new SnapshotStore(root)
    store.commit(Seq(BucketLineage(0, "extract", 1, Map("convs" -> 1L), Map.empty, "h")))
    // corrupt manifest injected into the log
    val bad = java.nio.file.Paths.get(root, "_graft_log", "snapshot-1.json")
    Files.write(bad, "{not json".getBytes("UTF-8"))
    val reread = new SnapshotStore(root)
    assert(reread.snapshots.map(_.id) == Seq(0L))
    assert(reread.completedBuckets == Set(0))
    // next commit continues past the corrupt id
    val snap = reread.commit(Seq(BucketLineage(1, "extract", 1, Map.empty, Map.empty, "h")))
    assert(snap.id == 2)
  }

  test("connected components: min-label over a small graph") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("x", "y"), ("z", "z"))
      .toDF("src", "dst")
    for (variant <- Seq("distributed", "auto")) {
      val comps = (if (variant == "auto")
        graft.kg.canonical.ConnectedComponents.runAuto(spark, edges)
      else graft.kg.canonical.ConnectedComponents.run(spark, edges))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(comps("a") == "a" && comps("b") == "a" && comps("c") == "a", variant)
      assert(comps("x") == "x" && comps("y") == "x", variant)
      assert(comps("z") == "z", variant)
    }
  }

  test("distributed CC on a skewed graph equals driver union-find (forced paths)") {
    import spark.implicits._
    // skewed candidate graph: one hot hub with 3000 spokes (the
    // famous-precedent shape), a 150-node path (worst-case diameter for
    // min-label propagation — converges only via pointer jumping), plus
    // disjoint small components
    val hub = (1 to 3000).map(i => ("hub", f"s$i%05d"))
    val path = (1 until 150).map(i => (f"p$i%04d", f"p${i + 1}%04d"))
    val rings = (0 until 50).flatMap(r =>
      (0 until 4).map(i => (f"r$r%03d_$i", f"r$r%03d_${(i + 1) % 4}")))
    val edges = (hub ++ path ++ rings).toDF("src", "dst")
    // force the DISTRIBUTED branch (threshold 0) vs the driver union-find
    val dist = graft.kg.canonical.ConnectedComponents.runAuto(spark, edges, localThreshold = 0)
      .collect().map(r => r.getString(0) -> r.getString(1)).sortBy(_._1)
    val local = graft.kg.canonical.ConnectedComponents.runAuto(spark, edges, localThreshold = Long.MaxValue)
      .collect().map(r => r.getString(0) -> r.getString(1)).sortBy(_._1)
    assert(dist.length == local.length && dist.length == 3000 + 150 + 200 + 1)
    assert(dist.toSeq == local.toSeq)
    // spot-check labels: hub component labeled by the min id ("hub"),
    // path labeled end-to-end by p0001
    val m = dist.toMap
    assert(m("s03000") == "hub" && m("p0150") == "p0001")
  }

  test("canonicalization merges name and citation keys across conversations") {
    import spark.implicits._
    // conv A cites with name+citation; conv B cites the bare citation;
    // conv C cites the bare name (as an ECHR-style v. pattern is IN-invisible,
    // use the same name+another reporter to bridge)
    val turns = Seq(
      graft.kg.model.Turn("cA", 0, "user",
        "As held in Maneka Gandhi v. Union of India, AIR 1978 SC 597, the procedure must be fair. We hold that the order fails. The appeal is allowed.", null, null),
      graft.kg.model.Turn("cB", 0, "user",
        "Following the ratio in AIR 1978 SC 597, fairness governs. We hold that the order fails. The appeal is allowed.", null, null),
      graft.kg.model.Turn("cC", 0, "user",
        "As held in Maneka Gandhi v. Union of India, (1978) 1 SCC 248, fairness is required. We hold that the order fails. The appeal is allowed.", null, null)
    ).toDF()
    val nodes = KgPipeline.nodesDirect(spark, turns).toDF()
    val canon = graft.kg.canonical.Canonicalizer
      .canonicalPrecedents(spark, nodes).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    // all three conversations' precedent mentions share one canonical id
    assert(canon.size == 3, canon.toString)
    assert(canon.values.toSet.size == 1, canon.toString)
  }

  test("canonical triples rewrite precedent/concept endpoints") {
    import spark.implicits._
    val df = transcriptsDF(20)
    val nodes = KgPipeline.nodesDirect(spark, df).toDF()
    val edges = KgPipeline.edgesDirect(spark, df).toDF()
    val ct = graft.kg.canonical.Canonicalizer.canonicalTriples(spark, nodes, edges)
    assert(ct.count() == edges.count())
    val objs = ct.select("obj").collect().map(_.getString(0))
    assert(objs.exists(_.startsWith("cit:")) || objs.exists(_.startsWith("case:")))
    assert(objs.exists(_.startsWith("concept:")) ||
      ct.select("subj").collect().map(_.getString(0)).exists(_.startsWith("concept:")))
  }

  test("canonical triple rewrite co-partitions: endpoint joins add no exchange") {
    // the mapping is conv-local, so one repartition(convId) per side must
    // satisfy BOTH the (convId, source) and (convId, target) joins
    // (HashPartitioning on a subset of the join keys) — the subj and obj
    // joins themselves may not introduce further exchanges, and the
    // mapping-side exchange must be reused across the two branches
    import spark.implicits._
    val df = transcriptsDF(20)
    val nodes = KgPipeline.nodesDirect(spark, df).toDF()
    val edges = KgPipeline.edgesDirect(spark, df).toDF()
    val ct = graft.kg.canonical.Canonicalizer.canonicalTriples(spark, nodes, edges)
    ct.count() // materialize so AQE finalizes the plan
    val plan = ct.queryExecution.executedPlan.toString
    val joins = "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(plan).size
    assert(joins >= 2, s"expected both endpoint joins in plan:\n${plan.take(3000)}")
    // exchanges introduced by hashpartitioning(convId...) only — none keyed
    // by (convId, source) or (convId, target)
    assert(!plan.contains("hashpartitioning(convId, source") &&
      !plan.contains("hashpartitioning(convId, target"),
      s"endpoint join added its own exchange:\n${plan.take(3000)}")
    assert(plan.contains("ReusedExchange") || plan.contains("InMemoryTableScan") ||
      "Exchange hashpartitioning\\(convId".r.findAllIn(plan).size <= 2,
      s"mapping exchange not shared:\n${plan.take(3000)}")
  }

  test("quality scores are in [1,10] and edge validity is 1.0 post-repair") {
    val df = transcriptsDF(25)
    val nodes = KgPipeline.nodesDirect(spark, df).toDF()
    val edges = KgPipeline.edgesDirect(spark, df).toDF()
    val q = graft.kg.query.GraphQuality.score(nodes, edges).collect()
    assert(q.nonEmpty)
    for (r <- q) {
      val sc = r.getAs[Double]("quality_score")
      assert(sc >= 1.0 && sc <= 10.0, r.toString)
      assert(r.getAs[Double]("edge_validity") == 1.0, r.toString)
      assert(r.getAs[Double]("anchor_quality") > 0.5)
    }
  }

  test("stats reconstruction recreates lineage from the tables alone") {
    val root = Files.createTempDirectory("graft_reconstruct").toString
    Materializer.run(spark, transcriptsDF(30), root, nBuckets = 4)
    val orig = new SnapshotStore(root).snapshots.head
    // simulate total log loss
    import scala.jdk.CollectionConverters._
    Files.list(java.nio.file.Paths.get(root, "_graft_log")).iterator().asScala
      .foreach(Files.delete)
    assert(new SnapshotStore(root).snapshots.isEmpty)
    val rebuilt = Materializer.reconstructStats(spark, root)
    assert(rebuilt.buckets.toSet == orig.buckets.toSet)
    val origHashes = orig.lineage.map(l => l.bucket -> l.contentHash).toMap
    for (l <- rebuilt.lineage if l.inputRows > 0)
      assert(l.contentHash == origHashes(l.bucket), s"bucket ${l.bucket}")
  }

  test("GraphStore point lookups prune to one bucket partition") {
    val root = Files.createTempDirectory("graft_store").toString
    Materializer.run(spark, transcriptsDF(40), root, nBuckets = 8)
    val store = new graft.kg.table.GraphStore(spark, root, nBuckets = 8)
    val convId = "conv_000005"
    val n = store.nodes(convId)
    assert(n.count() > 0)
    assert(n.select("convId").distinct().collect().map(_.getString(0)).toSeq == Seq(convId))
    // partition pruning: the physical plan carries a bucket partition filter
    val plan = n.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan.take(800))
    // the facade graph ops work on the pruned slices
    assert(store.holdingSupport(convId).count() >= 1)
    assert(store.tierHistogram().count() >= 1)
    val h = store.nodes(convId).filter(col("nodeType") === "holding")
      .select("id").first().getString(0)
    // removing the holding itself breaks nothing upstream (it IS the target)
    assert(store.counterfactual(convId, "f1").columns.toSeq ==
      Seq("conv_id", "holding_id"))
  }

  test("allTables tagged-union branches equal the typed per-table projections") {
    // pins the columnar MatRow union (Materializer + the kg_* query memo)
    // against the original Dataset[ConvGraph] flatMap projections: same
    // rows, same multiset, for every branch
    val df = transcriptsDF(25)
    val g = KgPipeline.graphs(spark, df).persist()
    val union = KgPipeline.allTables(g).toDF()
    def branch(name: String) =
      union.filter(col(name).isNotNull).select(col(name + ".*"))
        .collect().map(_.toString).sorted.toSeq
    assert(branch("node") == KgPipeline.nodes(g).toDF().collect().map(_.toString).sorted.toSeq)
    assert(branch("edge") == KgPipeline.edges(g).toDF().collect().map(_.toString).sorted.toSeq)
    assert(branch("js") == KgPipeline.justificationSets(g).toDF().collect().map(_.toString).sorted.toSeq)
    assert(branch("chain") == KgPipeline.chains(g).toDF().collect().map(_.toString).sorted.toSeq)
    assert(branch("member") == KgPipeline.clusterMembers(g).toDF().collect().map(_.toString).sorted.toSeq)
    assert(branch("requirement") == KgPipeline.requirements(g).toDF().collect().map(_.toString).sorted.toSeq)
    assert(branch("summary") == KgPipeline.summaries(g).toDF().collect().map(_.toString).sorted.toSeq)
    g.unpersist()
  }

  test("materialized triples equal the direct-path triples") {
    val root = Files.createTempDirectory("graft_eq").toString
    val df = transcriptsDF(30)
    Materializer.run(spark, df, root, nBuckets = 4)
    val mat = Materializer.read(spark, root, "triples")
      .select("convId", "subj", "pred", "obj")
      .collect().map(_.toString).sorted
    val direct = KgPipeline.triplesDirect(spark, df)
      .collect().map(t => s"[${t.convId},${t.subj},${t.pred},${t.obj}]").sorted
    assert(mat.toSeq == direct.toSeq)
  }
}
