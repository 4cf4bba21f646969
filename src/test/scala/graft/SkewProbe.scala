package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** Skew-join head-to-head (VERDICT r3 #9 / r4 #6): measure PER-TASK time
  * distributions — not just wall clock — for the same skewed join under
  * (a) a plain shuffle join with AQE off, (b) AQE's native skew split
  * (OptimizeSkewedJoin), and (c) the library's deterministic salted join
  * (Joins.saltedEquiJoin) with AQE off. Results recorded in SCALE.md.
  *
  * Fixture: 20M-row fact with 90% of rows on ONE key (hotter than any
  * Zipf the test data has), 10k-key dim, broadcast disabled so the join
  * must shuffle — the shape where a hot key serializes one reduce task.
  *
  * All three variants must produce the identical aggregate (printed) —
  * the probe is only meaningful if the mitigation preserves the result.
  *
  * Run: sbt "Test/runMain graft.SkewProbe"
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val N = 20000000L
    def large(): DataFrame =
      spark.range(0, N, 1, 64).select(
        when(pmod(col("id"), lit(100)) < 90, 0L)
          .otherwise(pmod(xxhash64(col("id")), lit(10000L))).as("k"),
        col("id").as("v"))
    def small(): DataFrame =
      spark.range(0, 10000L, 1, 8).select(col("id").as("k"),
        (col("id") * 7 % 997).as("w"))

    val tasks = TrieMap[Int, ArrayBuffer[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.getOrElseUpdate(e.stageId, ArrayBuffer()) +=
          e.taskInfo.duration
        ()
      }
    })

    def runVariant(name: String, aqe: Boolean, skewJoin: Boolean)
        (mk: => DataFrame): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
      // defaults (256m / factor 5) are tuned for cluster-scale shuffles;
      // scale them to this fixture so the optimization actually engages
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      tasks.clear()
      val t0 = System.nanoTime()
      val res = mk.agg(sum(col("v") % 1000 * col("w"))).collect()(0).getLong(0)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener drain
      // the skewed stage is the one with the largest single task; print
      // the top 2 stages by max-task so the join stage is identifiable
      val byMax = tasks.toSeq.sortBy(-_._2.max).take(2)
      val head = f"$name%-14s wall=$wall%6.1fs agg=$res"
      val stages = byMax.map { case (sid, durs) =>
        val ds = durs.sorted.toIndexedSeq
        def pct(p: Double) = ds(((ds.size - 1) * p).toInt)
        f"stage$sid: n=${ds.size}%3d p50=${pct(0.5)}%6dms " +
          f"p95=${pct(0.95)}%6dms max=${ds.last}%6dms"
      }.mkString("  |  ")
      println(s"$head  $stages")
    }

    // A: plain shuffle join, no AQE — the hot key serializes one task
    runVariant("plain_smj", aqe = false, skewJoin = false) {
      large().join(small(), "k")
    }
    // B: AQE native skew handling splits the hot partition at runtime
    runVariant("aqe_skewjoin", aqe = true, skewJoin = true) {
      large().join(small(), "k")
    }
    // C: the library's salted join — deterministic pre-planned split,
    // works even where AQE can't see the skew (e.g. non-sort-merge
    // plans or aggregation-before-join shapes)
    runVariant("salted_32", aqe = false, skewJoin = false) {
      graft.operators.Joins.saltedEquiJoin(
        large(), small(), "k", "v", buckets = 32)
    }
    spark.stop()
  }
}
