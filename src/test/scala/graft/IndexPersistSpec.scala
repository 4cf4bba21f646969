package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimSearch

/** `simsearch_index_persisted`: the index-as-artifact round trip must
  * serve the ivfpq values from the persisted parquet alone — corpus
  * embeddings never re-enter the serve plan, and the probed cells
  * prune the index scan's partitions.
  */
class IndexPersistSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("persisted index serves simsearch_ivfpq's values; the serve " +
      "plan reads the artifact, not the corpus embeddings") {
    val df = SimSearch.simsearchIndexPersisted(spark, sf)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    val want = SimSearch.simsearchIvfPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(got === want, "round trip must be value-lossless")
    assert(got.nonEmpty)

    val ep = df.queryExecution.executedPlan
    val scans = SpecUtil.collectPlan(ep) {
      case f: FileSourceScanExec => f
    }
    // the serve side reads the ARTIFACT
    val idx = scans.filter(_.metadata.get("Location")
      .exists(_.contains("simsearch_index_persisted")))
    assert(idx.nonEmpty, s"expected a persisted-index scan:\n$ep")
    // corpus embeddings never re-enter: every embeddings.parquet scan
    // left in the plan is QUERY-side (bounded by the pushed vec_id
    // predicate — the nQueries=10 query set and nothing more)
    scans.filterNot(idx.contains).foreach { f =>
      assert(f.metadata.get("PushedFilters")
        .exists(_.contains("LessThan(vec_id,10)")),
        s"non-index scan must be the bounded query side:\n$f")
    }
    // the cell probe prunes the index DIRECTORIES at runtime (dynamic
    // partition pruning off the broadcast probe join)
    assert(idx.exists(_.partitionFilters
      .exists(_.toString.contains("dynamicpruning"))),
      s"expected dynamic partition pruning on the index scan, got " +
        s"${idx.map(_.partitionFilters)}:\n$ep")
  }

  test("incremental index: delta append under yesterday's codebooks " +
      "equals the full-corpus encode (batch-associativity contract)") {
    val inc = SimSearch.simsearchIndexIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    // the full rebuild under the SAME pinned (store-side) codebooks:
    // ivfPqOver with store-derived codebooks over the whole corpus
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val store = emb.filter(org.apache.spark.sql.functions
      .col("vec_id") % 10 < 8)
    val full = SimSearch.ivfPqOver(emb,
        SimSearch.ivfCodebook(store, 127),
        SimSearch.ivfCodebook(store, 61).take(256),
        k = 5, nQueries = 10, m = 4, nProbe = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(inc === full,
      "append maintenance must equal a full rebuild under the pinned quantizers")
    assert(inc.nonEmpty)
    // non-vacuous: some delta vector (vec_id % 10 >= 8) surfaced as a
    // result candidate — the appended files are actually served
    assert(inc.exists(_._2 % 10 >= 8),
      "no delta vector ever surfaced — the append was never read")
  }
}
