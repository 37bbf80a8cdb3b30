package graft.kg.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Deployable streaming job: watch a directory for new transcript parquet
  * files, extract each conversation once its turn stream goes quiet, append
  * triples to a parquet sink. The checkpointLocation makes the query resume
  * exactly-once across restarts (the streaming counterpart of the batch
  * snapshot log).
  *
  * {{{
  * spark-submit --class graft.kg.streaming.StreamMain <jar> \
  *   <input dir> <output dir> <checkpoint dir> [gapMinutes] [jurisdiction]
  * }}}
  * Locally: `sbt "runMain graft.kg.streaming.StreamMain in out ckpt 30 in --once"`
  * (--once uses Trigger.AvailableNow and exits when caught up).
  */
object StreamMain {

  val TranscriptSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType), StructField("turn_idx", IntegerType),
    StructField("role", StringType), StructField("text", StringType),
    StructField("tool", StringType), StructField("ts", TimestampType)))

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: StreamMain <input dir> <output dir> <checkpoint dir> [gapMinutes] [jurisdiction] [--once]")
    val Array(in, out, ckpt) = args.take(3)
    val gapMinutes = args.lift(3).filterNot(_.startsWith("--")).map(_.toInt).getOrElse(30)
    val jurisdiction = args.lift(4).filterNot(_.startsWith("--")).getOrElse("in")
    val once = args.contains("--once")

    val builder = SparkSession.builder().appName("graft-stream")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = (if (sys.env.contains("SPARK_GRAFT_LOCAL") || once)
      builder.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val turns = spark.readStream.schema(TranscriptSchema).parquet(in)
    val triples = TranscriptStream.triples(spark, turns, jurisdiction, gapMinutes)

    val writer = triples.writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
    val q = (if (once) writer.trigger(Trigger.AvailableNow()) else writer).start()
    q.awaitTermination()
    spark.stop()
  }
}
