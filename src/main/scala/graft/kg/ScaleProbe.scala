package graft.kg
import graft.kg.gen.TranscriptGen
import org.apache.spark.sql.SparkSession
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val nConvs = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val path = s"/tmp/graft_scale_p_$nConvs"
    if (!new java.io.File(path + "/_SUCCESS").exists()) {
      // generate in parallel ON EXECUTORS (driver-side gen of 2M turns is
      // slow), then lay out conversation-contiguously (production shape)
      graft.kg.pipeline.KgPipeline.writeConversationPartitioned(
        spark.range(nConvs).repartition(128)
          .flatMap(i => TranscriptGen.conversation(f"conv_$i%06d", 20))
          .toDF(), path, nFiles = 128)
    }
    val tr = graft.kg.pipeline.KgPipeline.readConversationPartitioned(spark, path)
    println(s"turns: ${tr.count()}")
    val out = java.nio.file.Files.createTempDirectory("graft_scale_mat").toString
    val t0 = System.nanoTime()
    val report = graft.kg.table.Materializer.run(spark, tr, out, nBuckets = 128,
      prePartitioned = true,
      integrityCheck = sys.env.get("SPARK_GRAFT_NO_GUARD").isEmpty)
    val sec = (System.nanoTime() - t0) / 1e9
    val triples = report.rows.getOrElse("triples", 0L)
    println(f"MATERIALIZE $nConvs convs in $sec%.1f s => ${nConvs / sec}%.1f convs/s, $triples triples => ${triples / sec}%.1f triples/s")
    println("lineage buckets: " + new graft.kg.table.SnapshotStore(out).snapshots.head.lineage.size)
    spark.stop()
  }
}
