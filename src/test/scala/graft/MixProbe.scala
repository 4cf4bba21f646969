package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway attribution probe for the mix-family bench rows. */
object MixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TextOps
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
    // warm the scan
    time("warm_scan")(docs.count())
    val t = docs.select(col("doc_id"), col("lang"),
      size(split(TextOps.normText(col("text")), " ")).cast("long")
        .as("n_tokens"))
    time("tokenize_once")(t.count())
    time("tokenize_agg")(t.groupBy(col("lang")).count().count())
    time("mix_budget_approx")(TextOps.mixBudgetApprox(spark, sfDir).count())
    time("mix_temperature_1")(TextOps.mixTemperature(spark, sfDir).count())
    time("mix_temperature_2")(TextOps.mixTemperature(spark, sfDir).count())
    time("mix_curriculum_approx_1")(
      TextOps.mixCurriculumApprox(spark, sfDir).count())
    time("mix_curriculum_approx_2")(
      TextOps.mixCurriculumApprox(spark, sfDir).count())
    time("mix_epochs")(TextOps.mixEpochs(spark, sfDir).count())
    spark.stop()
  }
}
