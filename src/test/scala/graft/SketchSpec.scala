package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ThetaAggs

/** Theta sketch aggregate + set-algebra expressions (`agg_theta_sketch`)
  * and the re-aggregatable rollup family's merge semantics.
  */
class SketchSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("theta sketch is exact below nominal entries and merge-invariant across partitionings") {
    // 300 distinct ids across 2 groups, well under 2^12 → exact regime
    val rows = (0L until 600L).map(i => (if (i % 2 == 0) "a" else "b", i % 300))
    val df = rows.toDF("g", "id")
    def ests(parts: Int): Map[String, Long] =
      df.repartition(parts)
        .groupBy(col("g")).agg(ThetaAggs.thetaSketch(col("id")).as("sk"))
        .select(col("g"), round(ThetaAggs.thetaEstimate(col("sk")))
          .cast("long").as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    // estimates are exact AND identical under 1, 7, and 32 partitions
    // (merge order varies; the sketch must not care)
    assert(ests(1) === exact)
    assert(ests(7) === exact)
    assert(ests(32) === exact)
  }

  test("theta intersection/union equal exact set ops in the exact regime") {
    val a = (0L until 400L).map(("a", _))
    val b = (200L until 700L).map(("b", _))
    val sk = (a ++ b).toDF("g", "id")
      .groupBy(col("g")).agg(ThetaAggs.thetaSketch(col("id")).as("sk"))
    val skA = sk.filter(col("g") === "a").select(col("sk").as("sk_a"))
    val skB = sk.filter(col("g") === "b").select(col("sk").as("sk_b"))
    val r = skA.crossJoin(skB).select(
      round(ThetaAggs.thetaIntersectEstimate(col("sk_a"), col("sk_b")))
        .cast("long").as("inter"),
      round(ThetaAggs.thetaUnionEstimate(col("sk_a"), col("sk_b")))
        .cast("long").as("union")).head()
    assert(r.getLong(0) === 200L) // [200,400)
    assert(r.getLong(1) === 700L) // [0,700)
  }

  test("theta estimation mode: 200k distinct ids within ±5% at lgK=12") {
    // far beyond 2^12 retained entries → genuine estimation; the bound
    // here is ~3 standard errors (1/sqrt(2^12) ≈ 1.6% per sketch)
    val n = 200000L
    val est = spark.range(n).select(col("id"))
      .agg(ThetaAggs.thetaSketch(col("id")).as("sk"))
      .select(ThetaAggs.thetaEstimate(col("sk")).as("est"))
      .head().getDouble(0)
    assert(math.abs(est - n) / n < 0.05, s"estimate $est vs exact $n")
  }

  test("agg_minhash_union: two-level partial merge equals the direct per-lang signature") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val nPerm = 128
    val withSig = docs
      .withColumn("sh", graft.functions.ShingleKernel
        .shingleHashes(col("text"), 3))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", graft.operators.MinHashDedup
        .minhashFromHashes(col("sh"), nPerm))
    def sigMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val direct = sigMap(withSig.groupBy(col("lang"))
      .agg(graft.functions.ImperativeAggs.minSig(col("sig"), nPerm)
        .as("s")))
    val twoLevel = sigMap(withSig.groupBy(col("lang"), col("source"))
      .agg(graft.functions.ImperativeAggs.minSig(col("sig"), nPerm)
        .as("p"))
      .groupBy(col("lang"))
      .agg(graft.functions.ImperativeAggs.minSig(col("p"), nPerm)
        .as("s")))
    assert(twoLevel === direct)
  }

  test("agg_minhash_union: every pair's estimate sits inside the declared 0.1 contract") {
    val out = graft.operators.MinHashDedup
      .aggMinhashUnion(spark, TestSpark.sf).collect()
    assert(out.length === 10)
    assert(out.forall(_.getBoolean(4)),
      out.filterNot(_.getBoolean(4)).mkString(", "))
    // anchors are real: at least one pair shares vocabulary
    assert(out.exists(_.getLong(2) > 0))
  }

  test("agg_theta_sketch emits all 10 event-type pairs with exact counts at fixture scale") {
    val out = graft.operators.Aggregates
      .aggThetaSketch(spark, TestSpark.sf).collect()
    assert(out.length === 10)
    // spot-check one pair against exact distinct counting
    val ev = graft.sources.Tables.events(spark, TestSpark.sf)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val row = out.find(r => r.getString(0) == "click" && r.getString(1) == "purchase").get
    assert(row.getLong(2) === (ev("click") & ev("purchase")).size.toLong)
    assert(row.getLong(3) === (ev("click") | ev("purchase")).size.toLong)
  }
}
