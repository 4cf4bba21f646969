package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: key alignment between `queries` and
  * `oracleSql`, and the t1 smoke (entry returns rows on sf0.001).
  */
class ContractSpec extends AnyFunSuite {
  val spark = TestSpark.spark

  test("every oracleSql key has a queries implementation") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys with no query impl: $orphans")
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query analyzes (schema resolvable)") {
    // analysis only — execution is the driver's Verify pass
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, TestSpark.sf)
      assert(df.schema.fields.nonEmpty, s"$name produced empty schema")
    }
  }
}
