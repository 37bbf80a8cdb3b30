import org.apache.spark.sql.SparkSession
object WinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").appName("winprobe")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text").collect()
    val out = new java.io.PrintWriter("/tmp/winnow_sizes.txt")
    rows.foreach { r =>
      val w = graft.data.TextAnalysis.winnow(r.getAs[String]("text"))
      out.println(s"${r.getAs[Long]("doc_id")},${w.length}")
    }
    out.close()
    spark.stop()
  }
}
