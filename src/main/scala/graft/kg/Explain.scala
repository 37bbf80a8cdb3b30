package graft.kg
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    println("=== q02 filter+project (pushdown check) ===")
    graft.SparkEntry.queries("q02_filter_project")(spark, dir).explain("formatted")
    println("=== q07 join_agg (broadcast check) ===")
    graft.SparkEntry.queries("q07_join_agg")(spark, dir).explain("formatted")
    println("=== extraction (shuffle shape) ===")
    import spark.implicits._
    val t = graft.kg.gen.TranscriptGen.turns(50, 10).toDF()
    t.write.mode("overwrite").parquet("/tmp/exp_tr")
    graft.kg.pipeline.KgPipeline.triplesDirect(spark, spark.read.parquet("/tmp/exp_tr")).explain("formatted")
    spark.stop()
  }
}
