package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimSearch

/** Scratch attribution for ivfpq's 10x probe wall (not part of sbt
  * test — run via Test/runMain).
  */
object IvfPqBreakdown {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("ipq").toString
    spark.range(200000L).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        d => ((((col("id") * 1315423911L + d * 2654435761L) % 1999)
          .cast("float") - 999f) / 999f).cast("float")).as("embedding"))
      .write.parquet(s"$dir/v")
    val v = spark.read.parquet(s"$dir/v")
    def t(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"IPQ $tag ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    val coarse = SimSearch.ivfCodebook(v, 997)
    val pqCb = SimSearch.ivfCodebook(v, 127).take(256)
    println(s"coarse=${coarse.length} pq=${pqCb.length}")
    t("warm")(v.count())
    t("coarse_assign")(SimSearch.ivfAssignCorpus(v, coarse).count())
    t("coarse_assign2")(SimSearch.ivfAssignCorpus(v, coarse).count())
    t("pq_codes")(SimSearch.pqCodesDebug(v, pqCb, 4).count())
    t("pq_codes2")(SimSearch.pqCodesDebug(v, pqCb, 4).count())
    t("full_ivfpq")(SimSearch.ivfPqOver(v, coarse, pqCb, 5, 10, 4, 2).count())
    t("full_pq")(SimSearch.pqOverCodebook(v, pqCb, 5, 10, 4).count())
    t("full_ivfpq2")(SimSearch.ivfPqOver(v, coarse, pqCb, 5, 10, 4, 2).count())
    t("full_pq2")(SimSearch.pqOverCodebook(v, pqCb, 5, 10, 4).count())
    spark.stop()
  }
}
