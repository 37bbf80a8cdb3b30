package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks on the driver-facing SparkEntry surface that need no
  * SparkSession. */
class SparkEntrySpec extends AnyFunSuite {

  test("every oracleSql entry has exactly one oracleGrade line and vice versa") {
    assert(SparkEntry.oracleGrade.keySet == SparkEntry.oracleSql.keySet,
      "grade/oracle key sets differ: " +
        ((SparkEntry.oracleGrade.keySet diff SparkEntry.oracleSql.keySet) ++
          (SparkEntry.oracleSql.keySet diff SparkEntry.oracleGrade.keySet)))
    val grades = SparkEntry.oracleGrade.values.toSet
    assert(grades == Set("closed-form SQL mirror", "published-script replay pin"))
    // the replay-pin set is exactly the three queries whose constants come
    // from offline runs of the published scripts (round-6 VERDICT)
    assert(SparkEntry.oracleGrade.collect {
      case (k, "published-script replay pin") => k
    }.toSet == Set("q79_blinding", "q80_confidence_sweep", "q83_bootstrap_ci"))
  }

  test("every oracle key is a registered query") {
    assert((SparkEntry.oracleSql.keySet diff SparkEntry.queries.keySet).isEmpty)
  }
}
