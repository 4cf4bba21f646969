package graft

import org.apache.spark.sql.SparkSession
import graft.operators.{GraphOps, TextOps}

/** Scale probes for the round-11 continuation operators (results in
  * SCALE.md), run over the REAL fixture tables at sf0.01 vs sf0.1 — a
  * true 10× corpus step. All three operators' only corpus-sized work
  * is scan/explode/keyed-agg pipelines, so wall time should track the
  * corpus ~linearly while output stays fixed (top-k / node-bounded) or
  * budget-bounded (mix_budget's per-language prefix is ~constant rows,
  * so its window input grows but its output doesn't).
  */
object Round11bProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warmup (session + codegen init)
    TextOps.ngramPmi(spark, "/root/testdata/sf0.001").count()
    TextOps.mixBudget(spark, "/root/testdata/sf0.001").count()
    GraphOps.graphPagerank(spark, "/root/testdata/sf0.001").count()

    Seq(("1x", "/root/testdata/sf0.01"), ("10x", "/root/testdata/sf0.1"))
      .foreach { case (tag, dir) =>
        def time(name: String, f: => Long): Unit = {
          val t0 = System.nanoTime()
          val rows = f
          println(f"R11BPROBE $tag $name ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$rows")
        }
        time("ngram_pmi", TextOps.ngramPmi(spark, dir).count())
        time("mix_budget", TextOps.mixBudget(spark, dir).count())
        time("graph_pagerank", GraphOps.graphPagerank(spark, dir).count())
      }
    spark.stop()
  }
}
