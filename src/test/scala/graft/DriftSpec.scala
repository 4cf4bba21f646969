package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Aggregates

/** `dq_drift` contract: the windowed exact-integer KS statistic equals a
  * literal two-sample KS computed independently on the driver, and the
  * cumulative window runs over the AGGREGATED (lang, value) frame —
  * value-domain-sized per language — never the raw corpus.
  */
class DriftSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  val sf = TestSpark.sf

  /** Literal two-sample KS on raw samples: max over observed values of
    * |ecdfA − ecdfB|, as the exact rational (num, denomA, denomB).
    */
  private def ksLiteral(a: Seq[Int], b: Seq[Int]): (Long, Long, Long) = {
    val xs = (a ++ b).distinct.sorted
    val (ta, tb) = (a.size.toLong, b.size.toLong)
    val num = xs.map { x =>
      val ca = a.count(_ <= x).toLong
      val cb = b.count(_ <= x).toLong
      math.abs(ca * tb - cb * ta)
    }.max
    (num, ta, tb)
  }

  test("dq_drift equals the literal two-sample KS on the fixture") {
    import scala.jdk.CollectionConverters._
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars"), col("source"))
      .collectAsList().asScala
    val cohortA = Set("src0", "src1", "src2", "src3")
    val byLang = docs.groupBy(_.getString(0))
    val got = Aggregates.dqDrift(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    byLang.foreach { case (lang, rows) =>
      val a = rows.filter(r => cohortA(r.getString(2)))
        .map(_.getLong(1).toInt).toSeq
      val b = rows.filterNot(r => cohortA(r.getString(2)))
        .map(_.getLong(1).toInt).toSeq
      assert(got(lang) === ksLiteral(a, b),
        s"KS mismatch for lang=$lang")
    }
    assert(got.keySet === byLang.keySet)
  }

  test("dq_drift KS equals literal KS on randomized cohorts (property)") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { trial =>
      // shifted distributions so the statistic is non-trivial
      val a = Seq.fill(30 + rnd.nextInt(100))(rnd.nextInt(40))
      val b = Seq.fill(30 + rnd.nextInt(100))(10 + rnd.nextInt(60))
      val (num, ta, tb) = ksLiteral(a, b)
      // same formulation the operator uses, over a one-lang frame
      import spark.implicits._
      val df = (a.map(v => ("x", v, 1L, 0L)) ++ b.map(v => ("x", v, 0L, 1L)))
        .toDF("lang", "n_chars", "ia", "ib")
      import org.apache.spark.sql.expressions.Window
      val cum = Window.partitionBy($"lang").orderBy($"n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy($"lang")
      val got = df.groupBy($"lang", $"n_chars")
        .agg(sum($"ia").as("ca"), sum($"ib").as("cb"))
        .withColumn("cuma", sum($"ca").over(cum))
        .withColumn("cumb", sum($"cb").over(cum))
        .withColumn("ta", sum($"ca").over(tot))
        .withColumn("tb", sum($"cb").over(tot))
        .select(max(abs($"cuma" * $"tb" - $"cumb" * $"ta")).as("num"),
          max($"ta").as("ta"), max($"tb").as("tb"))
        .as[(Long, Long, Long)].head()
      assert(got === ((num, ta, tb)), s"trial $trial")
    }
  }

  test("dq_drift windows over the aggregated frame, not the corpus") {
    val df = Aggregates.dqDrift(spark, sf)
    df.collect()
    val ep = df.queryExecution.executedPlan
    // every WindowExec in the plan must have an aggregate below it
    // (the per-(lang, value) rollup) — a window whose subtree lacks an
    // aggregate would be running over raw corpus rows
    val wins = SpecUtil.collectPlan(ep) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, s"expected the cumulative window:\n$ep")
    wins.foreach { w =>
      val aggsBelow = SpecUtil.collectPlan(
        w.asInstanceOf[org.apache.spark.sql.execution.SparkPlan]) {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }
      assert(aggsBelow.nonEmpty,
        s"window must sit above the (lang, value) rollup:\n$ep")
    }
  }
}
