package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** As-of-family hot-user probe (VERDICT r7 #6): the as-of joins carry
  * the last non-null order key over `Window.partitionBy(user)
  * .orderBy(ts)` — the right 100 TB shape for a normal key
  * distribution, but ONE pathological user (a bot account with 10⁸
  * events) serializes that user's whole timeline into a single window
  * task. AQE cannot split it: skew-join handling only rewrites joins,
  * and a window partition is semantically indivisible to the planner.
  *
  * This probe plants a hot user owning half the fixture and measures
  * per-task time distributions for
  *   (a) `single_window`  — the declared operators' shape, and
  *   (b) `range_split`    — the mitigation documented in Joins.scala:
  *       bucket each user's timeline into fixed time ranges, run the
  *       carry per (user, bucket) — the hot timeline becomes B parallel
  *       tasks — then close the seams with a per-(user, bucket) rollup
  *       (one row per bucket: its last non-null carry) over which a
  *       second, tiny window computes each bucket's carry-IN from all
  *       preceding buckets; the final value is
  *       coalesce(within-bucket carry, bucket carry-in). Two extra
  *       narrow shuffles of the SAME keyed layout + one rollup ≪ the
  *       serialized hot partition it removes.
  *
  * Both variants must produce the identical aggregate — printed so the
  * probe is self-checking. Results recorded in SCALE.md.
  *
  * Run: sbt "Test/runMain graft.AsOfSkewProbe"
  */
object AsOfSkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 8M rows: user 0 owns the first 4M timestamps (the bot), 1000 cold
    // users share the rest. ts = id (unique, so the window order is
    // total); every 10th row is an "order" carrying a key, the rest are
    // queries that must inherit the latest preceding order key.
    val N = 8000000L
    val hotN = 4000000L
    def rows(): DataFrame =
      spark.range(0, N, 1, 64).select(
        when(col("id") < hotN, 0L)
          .otherwise(pmod(xxhash64(col("id")), lit(1000L)) + 1L).as("ukey"),
        col("id").as("ts"),
        when(pmod(col("id"), lit(10)) === 0, col("id")).as("o_key"))

    val tasks = TrieMap[Int, ArrayBuffer[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.getOrElseUpdate(e.stageId, ArrayBuffer()) +=
          e.taskInfo.duration
        ()
      }
    })

    def runVariant(name: String)(mk: => DataFrame): Unit = {
      tasks.clear()
      val t0 = System.nanoTime()
      // bounded checksum (ANSI mode: a raw sum of 8M longs would
      // overflow): both variants must agree exactly
      val res = mk.agg(
        sum(coalesce(col("carry"), lit(-1L)) % 1000000L).as("chk"),
        count(col("carry")).as("n")).collect()(0)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val byMax = tasks.toSeq.sortBy(-_._2.max).take(2)
      val head = f"$name%-14s wall=$wall%6.1fs chk=${res.getLong(0)} n=${res.getLong(1)}"
      val stages = byMax.map { case (sid, durs) =>
        val ds = durs.sorted.toIndexedSeq
        def pct(p: Double) = ds(((ds.size - 1) * p).toInt)
        f"stage$sid: n=${ds.size}%3d p50=${pct(0.5)}%6dms " +
          f"p95=${pct(0.95)}%6dms max=${ds.last}%6dms"
      }.mkString("  |  ")
      println(s"$head  $stages")
    }

    // (a) the declared as-of shape: one window partition per user —
    // user 0's 4M-row timeline is ONE task
    runVariant("single_window") {
      val w = Window.partitionBy("ukey").orderBy(col("ts").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rows().withColumn("carry",
        last(col("o_key"), ignoreNulls = true).over(w))
    }

    // (b) range-split + boundary carry: bucket = ts / W (W sized so the
    // hot timeline splits ~32 ways), within-bucket carry in parallel,
    // seam closed by a carry-in computed over the tiny per-bucket rollup
    runVariant("range_split") {
      val W = hotN / 32
      val bucketed = rows().withColumn("bucket", (col("ts") / W).cast("long"))
      val wIn = Window.partitionBy("ukey", "bucket").orderBy(col("ts").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val within = bucketed.withColumn("w_carry",
        last(col("o_key"), ignoreNulls = true).over(wIn))
      // one row per (user, bucket): the bucket's closing carry — max of
      // (ts, o_key) structs over non-null keys = last non-null by time
      val rollup = bucketed
        .groupBy(col("ukey"), col("bucket"))
        .agg(max(when(col("o_key").isNotNull,
          struct(col("ts"), col("o_key")))).as("last_in_bucket"))
      val wSeam = Window.partitionBy("ukey").orderBy(col("bucket").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val carryIn = rollup.withColumn("carry_in",
        last(col("last_in_bucket.o_key"), ignoreNulls = true).over(wSeam))
        .select(col("ukey"), col("bucket"), col("carry_in"))
      within.join(carryIn, Seq("ukey", "bucket"))
        .withColumn("carry", coalesce(col("w_carry"), col("carry_in")))
    }

    spark.stop()
  }
}
