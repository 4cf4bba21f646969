package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Round-14 attribution probe: where do ann_recall's sequential driver
  * jobs come from? (VERDICT r13 "What's wrong" #1: 5.6 s wall on 2.0 s
  * cpu — scheduling gaps, the pagerank disease.)
  */
object Round14Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def phase(name: String)(body: => Unit): Unit = {
      Thread.sleep(200) // let listener drain
      val j0 = jobs.get(); val t0 = System.nanoTime()
      body
      Thread.sleep(200)
      println(f"PROBE $name jobs=${jobs.get() - j0} wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    import graft.operators.SimSearch
    phase("warm")(SparkEntry.queries("agg_group_sum")(spark, sfDir).count())
    phase("ann_recall_full")(SimSearch.annRecall(spark, sfDir).count())
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    phase("stride_codebook")(SimSearch.ivfCodebook(emb, 127))
    phase("kmeans_fit")(SimSearch.ivfCodebookKmeans(emb, 4))
    phase("lsh_count")(SimSearch.simsearchLsh(spark, sfDir).count())
    phase("ivf_count")(SimSearch.simsearchIvf(spark, sfDir).count())
    phase("ivf_learned_count")(SimSearch.simsearchIvfLearned(spark, sfDir).count())
    phase("ann_recall_again")(SimSearch.annRecall(spark, sfDir).count())
    spark.stop()
  }
}
