package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** `pipeline_curate_v6`'s DAY-COMPOSITION LAW (VERDICT r18 #4): the
  * seen-store associativity contract (DedupSpec pins it for the
  * minhash stage alone) lifted to the WHOLE incremental pipeline —
  * curating day-1's captured churn against version 0, then day-2's
  * against version 1, must equal curating the two-day churn once
  * against version 0, through every stage including the final
  * cumulative budget mix.
  */
class PipelineSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(col("doc_id")).collect().map(_.getLong(0)).toSet

  test("day-(N) ∘ day-(N−1) ≡ two-day batch at the pre-mix survivor " +
      "set (per-doc stages are day-local given the seen-store)") {
    val tbl = TextOps.plantCorpusDays(spark, sf)
    val day1 = ids(TextOps.curateDayFromCdf(spark, sf, tbl, 0, 1, 97))
    val day2 = ids(TextOps.curateDayFromCdf(spark, sf, tbl, 1, 2, 97))
    // the two-day batch is the SAME function over the spanning range:
    // capturedChanges(0, 2) inserts vs the version-0 seen-store
    val batch = ids(TextOps.curateDayFromCdf(spark, sf, tbl, 0, 2, 97))
    assert(day1.nonEmpty && day2.nonEmpty, "degenerate day split")
    assert(day1.intersect(day2).isEmpty,
      "a doc surfaced on both days — churn attribution is broken")
    assert(day1 ++ day2 === batch)
  }

  test("the whole pipeline including the cumulative mix: " +
      "pipeline_curate_v6 ≡ the one-batch v4 chain at the same budget") {
    val v6 = TextOps.pipelineCurateV6(spark, sf, budget = 2000L)
    val v4 = TextOps.pipelineCurateV4(spark, sf, budget = 2000L)
    assert(v6.exceptAll(v4).count() === 0
      && v4.exceptAll(v6).count() === 0)
    assert(v6.count() > 0)
  }
  test("pipeline_takedown: no taken-down doc ships, and the shipped " +
      "set changes iff a shipped doc was taken down (the conditional " +
      "re-balance law; full re-mix equality is the sf0.01 oracle)") {
    // a BINDING budget (the declared 2000 is not contended at the
    // tiny spec fixture): the law needs an excluded doc to re-admit
    val td = TextOps.pipelineTakedown(spark, sf, budget = 300L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(td.nonEmpty)
    assert(td.forall(_ % 41 != 5), "a taken-down doc shipped")
    val v6 = TextOps.pipelineCurateV6(spark, sf, budget = 300L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // the conditional re-balance law: IF a shipped doc was taken down
    // the freed budget must re-admit (or the prefix simply ends — both
    // only when the budget actually bound); if NO shipped doc was
    // taken down, the shipped set must be EXACTLY unchanged (delete
    // propagation is a no-op precisely then). Full re-mix equality is
    // the sf0.01 oracle's job (hash-gated, where the budget binds).
    val removedShipped = v6.count(_ % 41 == 5)
    if (removedShipped > 0)
      assert(td !== v6, "a shipped doc was taken down but nothing changed")
    else assert(td === v6,
      "no shipped doc was taken down, yet the shipped set changed")
  }
}
