package graft.kg
import graft.kg.gen.TranscriptGen
import org.apache.spark.sql.SparkSession
object StreamDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/tmp/graft_stream_in"
    // 10 convs with ts far in the past + one heartbeat conv far later so the
    // watermark passes every session gap
    val turns = TranscriptGen.turns(10, 10)
    val late = TranscriptGen.conversation("conv_zzzzzz", 4).map(t =>
      t.copy(ts = new java.sql.Timestamp(t.ts.getTime + 86400000L)))
    (turns ++ late).toDF().write.mode("overwrite").parquet(dir)
    spark.stop()
  }
}
