package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter for local
    // iteration (the driver always passes exactly 2 args → full run)
    val onlyFilter: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => onlyFilter.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // --- dual-engine self-check over the oracle-infeasible kg_* family ---
    // Recomputes the kg_* projections with the pure-JVM single-thread
    // extractor (no Spark plumbing) and asserts multiset-equality against
    // (a) the ACTUAL kg_* query outputs on the exact memo input and (b) a
    // 1,200-conversation sample → outDir/dual_engine.json (committed as
    // DUAL_ENGINE.json; see DualEngineCheck). 14 turns/conv mirrors
    // SparkEntry.transcripts — a drift there makes this check scream
    // rather than silently verify the wrong input.
    try if (onlyFilter.isEmpty) {
      import graft.kg.eval.DualEngineCheck
      val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
      val memoN = math.max(20, (nDocs / 5).toInt)
      val memoSpark = DualEngineCheck.fromSpark(
        SparkEntry.queries("kg_triples")(spark, sfDir),
        SparkEntry.queries("kg_node_histogram")(spark, sfDir),
        SparkEntry.queries("kg_relation_histogram")(spark, sfDir),
        SparkEntry.queries("kg_tier_histogram")(spark, sfDir),
        SparkEntry.queries("kg_orphans")(spark, sfDir))
      val memo = DualEngineCheck.compare(memoN, memoSpark, DualEngineCheck.pure(memoN, 14))
      // extended pass: the remaining 7 kg_* projections, against the ACTUAL
      // query outputs (distributed CC/salted-agg/join layers vs plain
      // collections + min-label union-find)
      val memo2 = DualEngineCheck.compare2(memoN,
        DualEngineCheck.fromSpark2(
          SparkEntry.queries("kg_canonical_triples")(spark, sfDir),
          SparkEntry.queries("kg_entity_stats")(spark, sfDir),
          SparkEntry.queries("kg_quality_scores")(spark, sfDir),
          SparkEntry.queries("kg_holding_support")(spark, sfDir),
          SparkEntry.queries("kg_conceptset_retrieval")(spark, sfDir),
          SparkEntry.queries("kg_linearize")(spark, sfDir),
          SparkEntry.queries("kg_json_export")(spark, sfDir)),
        DualEngineCheck.pure2(memoN, 14))
      val sampleN = 1200
      val sample = DualEngineCheck.compare(sampleN,
        DualEngineCheck.spark(spark, sampleN, 14), DualEngineCheck.pure(sampleN, 14))
      val js = s"""{"memo":${memo.json},"memo_extended":${memo2.json},""" +
        s""""sample":${sample.json},""" +
        s""""all_equal":${memo.allEqual && memo2.allEqual && sample.allEqual}}"""
      Files.writeString(Paths.get(s"$outDir/dual_engine.json"), js)
      println(s"[verify] dual-engine: $js")
      if (!(memo.allEqual && memo2.allEqual && sample.allEqual))
        System.err.println("[verify] DUAL-ENGINE MISMATCH — kg_* Spark output diverges from the pure-JVM extractor")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] dual-engine check failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }
    spark.stop()
  }
}
