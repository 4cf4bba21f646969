package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Joins

/** `join_point_in_polygon` — the even–odd ray-cast containment kernel.
  * Pins (a) genuine non-convex semantics (the L-shape notch is OUT even
  * though the bounding box and convex hull both contain it), (b)
  * brute-force equality against an independent scalar ray-cast on the
  * sf0.001 fixture, and (c) Column-vs-generated-SQL renderer
  * equivalence over a dense point grid — the single-source-of-truth
  * guarantee the oracle relies on.
  */
class PointInPolygonSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  // independent scalar implementation (deliberately written from the
  // textbook crossing-number algorithm, not from the operator)
  private def insideRef(px: Double, py: Double,
      verts: Seq[(Double, Double)]): Boolean = {
    var c = 0
    var i = 0
    val n = verts.size
    while (i < n) {
      val (xi, yi) = verts(i)
      val (xj, yj) = verts((i + 1) % n)
      if ((yi > py) != (yj > py) &&
        px < (xj - xi) * (py - yi) / (yj - yi) + xi) c += 1
      i += 1
    }
    c % 2 == 1
  }

  private val lshape = Joins.polygons.find(_._2 == "lshape").get._3
  private val pentagon = Joins.polygons.find(_._2 == "pentagon").get._3

  test("L-shape notch is excluded (bounding box / convex hull would include it)") {
    // notch region: lon < 5.005, lat > 52.505 — inside the bbox
    // (2.005..8.005 × 51.005..54.505) but outside the polygon
    val pts = Seq(
      (3.0, 53.0, false), // in the notch — the discriminating case
      (3.0, 52.0, true),  // bottom strip of the L
      (6.0, 53.5, true),  // upper arm of the L
      (9.0, 53.0, false), // east of the polygon
      (3.0, 55.0, false)) // north of the polygon
    val df = pts.toDF("lon", "lat", "expected")
      .withColumn("got", Joins.pointInPolygon(col("lon"), col("lat"), lshape))
    val wrong = df.filter(col("got") =!= col("expected")).collect()
    assert(wrong.isEmpty, s"misclassified: ${wrong.mkString(", ")}")
    // and the reference implementation agrees on all five
    pts.foreach { case (lon, lat, exp) =>
      assert(insideRef(lon, lat, lshape) === exp, s"ref at ($lon,$lat)")
    }
  }

  test("declared query equals an independent brute-force ray-cast (sf0.001)") {
    val got = Joins.joinPointInPolygon(spark, TestSpark.sf)
      .select("poly_id", "c_custkey").as[(Int, Long)].collect().toSet
    // test-only collect: 150 fixture customers
    val coords = spark.read.parquet(s"${TestSpark.sf}/customer.parquet")
      .select(col("c_custkey"),
        (lit(45.0) + (col("c_custkey") * 11 % 1000).cast("double") / 100.0)
          .as("clat"),
        ((col("c_custkey") * 17 % 2000).cast("double") / 100.0).as("clon"))
      .as[(Long, Double, Double)].collect()
    val want = (for {
      (pid, _, verts) <- Joins.polygons
      (ck, lat, lon) <- coords
      if insideRef(lon, lat, verts)
    } yield (pid, ck)).toSet
    assert(got === want)
    assert(want.nonEmpty, "vacuous fixture — no point in any polygon")
    // both polygons must be non-vacuous at every fixture SF by
    // placement; at sf0.001 that is the docstring's lattice claim
    assert(Joins.polygons.map(_._1).forall(pid => want.exists(_._1 == pid)),
      s"some polygon matches nothing at sf0.001: $want")
  }

  test("generated SQL predicate agrees with the Column form on a dense grid") {
    // 60×60 grid over the full coordinate domain, both renderings
    // evaluated by Spark — pins that pointInPolygonSql unrolls the
    // exact same arithmetic the declared query executes (the oracle's
    // single-source-of-truth premise)
    val grid = spark.range(3600).select(
      ((col("id") % 60).cast("double") * 0.35 + 0.01).as("lon"),
      (lit(45.0) + (col("id") / 60).cast("double") * 0.17 + 0.01).as("lat"))
    Seq(pentagon, lshape).foreach { verts =>
      val both = grid
        .withColumn("col_form", Joins.pointInPolygon(col("lon"), col("lat"), verts))
        .withColumn("sql_form", expr(Joins.pointInPolygonSql("lon", "lat", verts)))
      assert(both.filter(col("col_form") =!= col("sql_form")).count() === 0)
      assert(both.filter(col("col_form")).count() > 0, "vacuous grid slice")
    }
  }
}
