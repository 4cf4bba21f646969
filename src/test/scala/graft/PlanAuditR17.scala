package graft

import org.apache.spark.sql.SparkSession

/** Round-17 plan audit (builder tooling, not a test): prints the
  * join/exchange/scan skeleton of the new operators' executed plans so
  * the shapes can be checked against their scale claims (blobs never
  * shuffle, band joins keyed, serves cell-probed, corpus never
  * self-products). Run: sbt "Test/runMain graft.PlanAuditR17"
  */
object PlanAuditR17 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.install(spark)
    val sf = "/root/testdata/sf0.001"
    val qs = Seq("multimodal_audio_dedup",
      "multimodal_audio_dedup_incremental",
      "multimodal_video_dedup_incremental",
      "graph_closeness", "lake_branch", "simsearch_index_rebuild")
    for (q <- qs) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, sf)
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") ||
          l.contains("PushedFilters") || l.contains("HashJoin") ||
          l.contains("SortMergeJoin") || l.contains("NestedLoop") ||
          l.contains("Cartesian") || l.contains("Scan parquet") ||
          l.contains("Window"))
        .foreach(l => println("  " + l.trim.take(170)))
    }
    spark.stop()
  }
}
