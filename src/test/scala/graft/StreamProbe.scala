package graft
import org.apache.spark.sql.SparkSession

/** Throwaway attribution probe for the streaming _ok harness rows. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    // warm
    time("warm")(graft.sources.Tables.events(spark, sfDir).count())
    args.foreach { name =>
      (1 to 2).foreach { i =>
        time(s"${name}_$i")(SparkEntry.queries(name)(spark, sfDir).count())
      }
    }
    spark.stop()
  }
}
