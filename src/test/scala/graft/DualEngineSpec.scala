package graft

import graft.kg.eval.DualEngineCheck
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** sbt-gated version of Verify's dual-engine self-check: the Spark pipeline
  * (conv_id exchange + sort + consecutive-run grouping + encoders) and the
  * pure-JVM single-thread extractor loop must agree exactly — triples as a
  * multiset plus all four histogram projections the kg_* queries publish. */
class DualEngineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dual-engine")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("Spark pipeline output == pure-JVM extractor on 300 conversations") {
    val n = 300
    val result = DualEngineCheck.compare(n,
      DualEngineCheck.spark(spark, n, 14), DualEngineCheck.pure(n, 14))
    assert(result.triples > 0)
    assert(result.allEqual, result.json)
  }
}
