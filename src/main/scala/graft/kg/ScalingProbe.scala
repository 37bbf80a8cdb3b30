package graft.kg

import graft.kg.extract.DocExtractor
import graft.kg.gen.TranscriptGen
import graft.kg.pipeline.KgPipeline
import org.apache.spark.sql.SparkSession

/** Ad-hoc scaling diagnosis: per-core-count repeats + a pure single-thread
  * extraction baseline to separate extraction compute from Spark overhead. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val nConvs = args.headOption.map(_.toInt).getOrElse(20000)

    // pure single-thread baseline (no Spark)
    val convs = (0 until 2000).map(i => f"conv_$i%06d")
    val t0 = System.nanoTime()
    var trip = 0L
    for (cid <- convs) {
      val turns = TranscriptGen.conversation(cid, 14).map(t => (t.turn_idx, t.text))
      trip += DocExtractor.extract(cid, turns).edges.size
    }
    val pureSec = (System.nanoTime() - t0) / 1e9
    println(f"PURE 1-thread: 2000 convs in $pureSec%.2f s => ${2000 / pureSec}%.1f convs/s, $trip triples")

    val path = s"/tmp/graft_probe40_$nConvs"
    for (cores <- List(2, 8, 32)) {
      val spark = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", (cores * 4).toString)
        .config("spark.local.dir", "/dev/shm/spark-tmp")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      if (!new java.io.File(path + "/_SUCCESS").exists())
        TranscriptGen.turns(nConvs, 40).toDF().repartition(64).write.mode("overwrite").parquet(path)
      // warmup
      KgPipeline.triplesDirect(spark, spark.read.parquet(path).limit(28000)).count()
      val stages = new scala.collection.mutable.ArrayBuffer[(Int, String, Long, Int)]
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          stages += ((i.stageId, i.name.takeWhile(_ != '\n').take(40),
            i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L), i.numTasks))
        }
      })
      for (rep <- 1 to 3) {
        val tr = spark.read.parquet(path)
        stages.clear()
        val s0 = System.nanoTime()
        val n = KgPipeline.triplesDirect(spark, tr).count()
        val sec = (System.nanoTime() - s0) / 1e9
        println(f"SPARK cores=$cores rep=$rep: $nConvs convs in $sec%.2f s => ${nConvs / sec}%.1f convs/s ($n edges)")
        Thread.sleep(300)
        stages.foreach { case (id, nm, ms, nt) => println(f"   stage $id%4d $nm%-40s ${ms}ms tasks=$nt") }
      }
      spark.stop()
    }
  }
}
