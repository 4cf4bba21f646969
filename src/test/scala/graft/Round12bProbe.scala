package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Aggregates, EventWindows, SimSearch, TextOps}

/** Round-12 late-session stress probe (results in SCALE.md): the four
  * new operator families at 10–50× fixture scale, checking the scale
  * claims their scaladocs make.
  *
  *  - `dq_drift`-shaped KS on a 1M-doc synthetic corpus: the cumulative
  *    window must run over the value-DOMAIN-sized rollup (asserted via
  *    the executed WindowExec's input row metric), never the corpus.
  *  - `ts_drift` on a 50× replicated events frame: per-(type, day)
  *    comparison frames stay bin-domain-sized.
  *  - `embedding_covariance` on 200k synthetic 64-dim vectors: the
  *    Round12Probe ANN lesson (literal/plan blowups appear only at
  *    scale) applied to the new aggregate; wall is the d²/2-per-row
  *    update cost, the shuffle one 2145-long buffer per partition.
  *  - `mix_temperature` on the 1M-doc corpus: the bounded-collect lang
  *    rollup + the same pruned window as mix_weighted.
  */
object Round12bProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("graft_r12bp").toString

    // --- dq_drift shape at 20k / 200k / 1M docs -----------------------
    def docs(n: Long): DataFrame = {
      val dir = s"$base/d$n"
      if (!new java.io.File(dir).exists()) {
        spark.range(n).select(col("id").as("doc_id"),
          element_at(array(lit("en"), lit("de"), lit("es"), lit("fr"),
            lit("zh")), (col("id") % 5 + 1).cast("int")).as("lang"),
          element_at(array((0 until 8).map(i => lit(s"src$i")): _*),
            (col("id") % 8 + 1).cast("int")).as("source"),
          // ~300 distinct lengths, shifted by cohort so KS is non-zero
          (col("id") % 300 + (col("id") % 8) * 10).as("n_chars"))
          .write.parquet(dir)
      }
      spark.read.parquet(dir)
    }
    def dqDriftDocs(d: DataFrame): DataFrame = {
      // the operator body over an arbitrary (lang, n_chars, source)
      // frame — mirrors Aggregates.dqDrift, which is fixture-bound
      import org.apache.spark.sql.expressions.Window
      val isA = col("source").isin("src0", "src1", "src2", "src3")
      val counts = d.select(col("lang"), col("n_chars"),
          when(isA, lit(1L)).otherwise(lit(0L)).as("ia"),
          when(isA, lit(0L)).otherwise(lit(1L)).as("ib"))
        .groupBy(col("lang"), col("n_chars"))
        .agg(sum(col("ia")).as("ca"), sum(col("ib")).as("cb"))
      val cum = Window.partitionBy(col("lang")).orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy(col("lang"))
      counts
        .withColumn("cuma", sum(col("ca")).over(cum))
        .withColumn("cumb", sum(col("cb")).over(cum))
        .withColumn("ta", sum(col("ca")).over(tot))
        .withColumn("tb", sum(col("cb")).over(tot))
        .withColumn("dd",
          abs(col("cuma") * col("tb") - col("cumb") * col("ta")))
        .groupBy(col("lang"))
        .agg(max(col("dd")).as("ks_num"),
          max(col("ta")).as("n_a"), max(col("tb")).as("n_b"))
        .orderBy(col("lang").asc)
    }
    dqDriftDocs(docs(5000L)).count() // warm
    Seq(("1x", 20000L), ("10x", 200000L), ("50x", 1000000L)).foreach {
      case (tag, n) =>
        val d = docs(n)
        val t0 = System.nanoTime()
        val q = dqDriftDocs(d)
        val rows = q.collect().length.toLong
        val t1 = System.nanoTime()
        // executed metric: the windows consume the (lang, value) rollup
        // (SortExec/WindowExec carry no row metric — read the rollup
        // aggregate feeding each window: its output IS the window input)
        val winInputs = SpecUtil.collectPlan(q.queryExecution.executedPlan) {
          case w: org.apache.spark.sql.execution.window.WindowExec =>
            SpecUtil.collectPlan(w.child) {
              case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
                a.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
            }.headOption.getOrElse(-1L)
        }
        val bound = 5L * 400L
        println(f"R12BPROBE $tag dq_drift ${(t1 - t0) / 1e9}%.2f s " +
          s"langs=$rows win_inputs=$winInputs bound=$bound " +
          s"ok=${winInputs.forall(v => v >= 0 && v <= bound)}")
    }

    // --- ts_drift at 1× vs 50× events ---------------------------------
    val sfDir = "/root/testdata/sf0.001"
    val ev1 = graft.sources.Tables.events(spark, sfDir)
    val ev50dir = s"$base/ev50"
    if (!new java.io.File(ev50dir).exists()) {
      val reps = (0 until 50).map(lit(_))
      ev1.select(col("ts"), col("event_type"),
          explode(array(reps: _*)).as("rep"))
        .select(col("ts"), col("event_type"),
          (rand(42) * 320).as("value"))
        .write.parquet(ev50dir)
    }
    def tsDriftEvents(e: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val c = e.groupBy(col("event_type"), to_date(col("ts")).as("day"),
          floor(col("value")).cast("long").as("bin"))
        .agg(count(lit(1)).as("cnt"))
      val cur = c.select(col("event_type"), col("day").as("pair_day"),
        col("bin"), col("cnt").as("cc"), lit(0L).as("cp"))
      val prev = c.select(col("event_type"),
        date_add(col("day"), 1).as("pair_day"),
        col("bin"), lit(0L).as("cc"), col("cnt").as("cp"))
      val u = cur.unionByName(prev)
        .groupBy(col("event_type"), col("pair_day"), col("bin"))
        .agg(sum(col("cc")).as("cc"), sum(col("cp")).as("cp"))
      val wv = Window.partitionBy(col("event_type"), col("pair_day"))
        .orderBy(col("bin").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy(col("event_type"), col("pair_day"))
      u.withColumn("cumc", sum(col("cc")).over(wv))
        .withColumn("cump", sum(col("cp")).over(wv))
        .withColumn("tc", sum(col("cc")).over(wt))
        .withColumn("tp", sum(col("cp")).over(wt))
        .withColumn("dd",
          abs(col("cumc") * col("tp") - col("cump") * col("tc")))
        .groupBy(col("event_type"), col("pair_day"))
        .agg(max(col("dd")).as("ks_num"), max(col("tc")).as("n_cur"),
          max(col("tp")).as("n_prev"))
        .filter(col("n_cur") > 0 && col("n_prev") > 0)
    }
    Seq(("1x", ev1.select(col("ts"), col("event_type"), col("value"))),
        ("50x", spark.read.parquet(ev50dir))).foreach { case (tag, e) =>
      val t0 = System.nanoTime()
      val q = tsDriftEvents(e)
      val rows = q.collect().length.toLong
      val t1 = System.nanoTime()
      val winInputs = SpecUtil.collectPlan(q.queryExecution.executedPlan) {
        case w: org.apache.spark.sql.execution.window.WindowExec =>
          SpecUtil.collectPlan(w.child) {
            case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
              a.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
          }.headOption.getOrElse(-1L)
      }
      // 5 types × ≤31 pair-days × ≤330 bins
      val bound = 5L * 31L * 330L
      println(f"R12BPROBE $tag ts_drift ${(t1 - t0) / 1e9}%.2f s " +
        s"pairs=$rows win_inputs=$winInputs bound=$bound " +
        s"ok=${winInputs.forall(v => v >= 0 && v <= bound)}")
    }

    // --- embedding_covariance at 5k / 50k / 200k vectors --------------
    def vecs(n: Long): DataFrame = {
      val dir = s"$base/v$n"
      if (!new java.io.File(dir).exists()) {
        spark.range(n).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)),
            i => ((col("id") * 31 + i * 17 + i * i * 7) % 1000 / 1000.0 - 0.5)
              .cast("float")).as("embedding"))
          .write.parquet(dir)
      }
      spark.read.parquet(dir)
    }
    def covOf(e: DataFrame): DataFrame = {
      import spark.implicits._
      val d = 64
      val pairs = for { i <- 0 until d; j <- i until d } yield (i, j)
      val pairsDf = broadcast(pairs.zipWithIndex
        .map { case ((i, j), k) => (k, i, j) }.toDF("pos", "i", "j"))
      e.agg(graft.functions.ImperativeAggs
          .vectorMoments(col("embedding"), d).as("c"))
        .select(posexplode(col("c")).as(Seq("pos", "cov")))
        .join(pairsDf, Seq("pos"))
        .select(col("i"), col("j"), col("cov"))
    }
    covOf(vecs(2000L)).count() // warm
    Seq(("1x", 5000L), ("10x", 50000L), ("40x", 200000L)).foreach {
      case (tag, n) =>
        val t0 = System.nanoTime()
        val rows = covOf(vecs(n)).count()
        val t1 = System.nanoTime()
        println(f"R12BPROBE $tag embedding_covariance ${(t1 - t0) / 1e9}%.2f s " +
          s"pairs=$rows vecs=$n")
    }

    // --- mix_temperature at 1M docs (with text) -----------------------
    def textDocs(n: Long): DataFrame = {
      val dir = s"$base/t$n"
      if (!new java.io.File(dir).exists()) {
        val vocab = array((0 until 2000).map(i => lit(s"w$i")): _*)
        spark.range(n).select(col("id").as("doc_id"),
          element_at(array(lit("en"), lit("de"), lit("es"), lit("fr"),
            lit("zh")), (col("id") % 5 + 1).cast("int")).as("lang"),
          array_join(transform(sequence(lit(0), lit(39)),
            i => element_at(vocab,
              ((col("id") * 31 + i * 17 + i * i * 7) % 2000 + 1)
                .cast("int"))), " ").as("text"))
          .write.parquet(dir)
      }
      spark.read.parquet(dir)
    }
    TextOps.mixTemperatureDocs(textDocs(5000L), 10000L).count() // warm
    Seq(("1x", 20000L), ("50x", 1000000L)).foreach { case (tag, n) =>
      val t0 = System.nanoTime()
      val rows = TextOps.mixTemperatureDocs(textDocs(n), 100000L).count()
      val t1 = System.nanoTime()
      println(f"R12BPROBE $tag mix_temperature ${(t1 - t0) / 1e9}%.2f s " +
        s"rows=$rows docs=$n")
    }

    // fixture-query sanity at the end (unchanged semantics)
    println("R12BPROBE fixture dq_drift rows=" +
      Aggregates.dqDrift(spark, sfDir).count() +
      " ts_drift rows=" + EventWindows.tsDrift(spark, sfDir).count() +
      " cov rows=" + SimSearch.embeddingCovariance(spark, sfDir).count())
    spark.stop()
  }
}
