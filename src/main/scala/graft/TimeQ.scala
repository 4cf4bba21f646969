package graft

import org.apache.spark.sql.SparkSession

/** Time named declared queries in isolation, N repetitions each — the
  * optimization-round microbench (full-run context excluded, so a row
  * whose cost differs here vs. graft.Bench is being slowed by RUN
  * CONTEXT — JIT/code-cache pressure, memo state — not by its plan).
  *
  * Usage: runMain graft.TimeQ <reps> <query> [query ...]
  *   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as graft.Bench.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQ <reps> <query> [query ...]")
    val reps = args(0).toInt
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Scratch.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", java.nio.file.Files
        .createTempDirectory("graft_timeq_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.install(spark)
    // SPARK_GRAFT_JOBLOG=1: per-job trace (start→end wall, job group /
    // description) — finds driver-side gaps between jobs that per-task
    // metrics can't see
    if (sys.env.contains("SPARK_GRAFT_JOBLOG")) {
      val t0 = System.nanoTime()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val starts =
            new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          override def onJobStart(
              e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            starts.put(e.jobId, System.nanoTime())
            ()
          }
          override def onJobEnd(
              e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val s = starts.remove(e.jobId)
            val now = System.nanoTime()
            val dur = if (s == null) -1 else (now - s) / 1000000
            println(f"[job] id=${e.jobId} at=${(now - t0) / 1000000}ms dur=${dur}ms")
          }
        })
    }
    SparkEntry.queries("agg_group_sum")(spark, sfDir).count() // session warm
    val clock = org.apache.spark.graft.Instrument.install(spark.sparkContext)
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => System.err.println(s"[timeq] unknown query: $n")
        case Some(fn) =>
          // SPARK_GRAFT_PRECOMPILE=1: compile-only codegen warm before
          // rep1 (r20 opt round) — measures how much of the bench-cold
          // rep1 cost is Janino compilation the CodegenWarm cache
          // priming removes. Plan construction here must be pure for
          // the query (see SparkEntry.pureConstruction).
          if (sys.env.contains("SPARK_GRAFT_PRECOMPILE")) {
            val t0 = System.nanoTime()
            val nf = CodegenWarm.precompile(fn(spark, sfDir))
            println(f"[timeq] $n precompile frags=$nf took=${
              (System.nanoTime() - t0) / 1e9}%.3fs")
          }
          (1 to reps).foreach { r =>
            org.apache.spark.graft.Instrument.drain(spark.sparkContext)
            val task0 = clock.runMs.get(); val cpu0 = clock.cpuMs.get()
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            val wall = (System.nanoTime() - t0) / 1e9
            org.apache.spark.graft.Instrument.drain(spark.sparkContext)
            println(f"[timeq] $n rep$r wall=$wall%.3f task=${
              clock.runMs.get() - task0}ms cpu=${clock.cpuMs.get() - cpu0}ms")
          }
      }
    }
    spark.stop()
  }
}
