package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Joins

/** `join_polygon_grid` — grid-blocked point-in-polygon over a
  * table-valued polygon layer. Pins (a) exact equality with the
  * brute-force cross join on a planted DENSE overlapping layer (200
  * diamonds × 5000 points — overlaps make multi-containment real), and
  * (b) the blocking invariant: candidate pairs are cell-local, so the
  * candidate count stays far below |points|·|polys| while containment
  * results are identical.
  */
class PolygonGridSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  // planted layer: 200 diamonds on a jittered lattice over the
  // 0..20 × 45..55 domain, radii up to 0.9° — neighbors overlap
  private lazy val polys = {
    val rows = (0 until 200).map { i =>
      val lonc = 0.5 + (i * 13 % 39) / 2.0 + (i % 7) * 0.03
      val latc = 45.5 + (i * 7 % 19) / 2.0 + (i % 5) * 0.02
      val rx = 0.3 + (i % 4) * 0.2
      val ry = 0.25 + (i % 3) * 0.2
      (i.toLong, lonc, latc, rx, ry)
    }
    rows.toDF("poly_id", "lonc", "latc", "rx", "ry")
      .withColumn("verts", array(
        struct((col("lonc") + col("rx")).as("x"), col("latc").as("y")),
        struct(col("lonc").as("x"), (col("latc") + col("ry")).as("y")),
        struct((col("lonc") - col("rx")).as("x"), col("latc").as("y")),
        struct(col("lonc").as("x"), (col("latc") - col("ry")).as("y"))))
  }

  private lazy val points = (0 until 5000).map { i =>
    (i.toLong, (i * 17 % 2000) / 100.0 + 0.003,
      45.0 + (i * 11 % 1000) / 100.0 + 0.007)
  }.toDF("p_id", "lon", "lat")

  test("grid-blocked join equals the brute-force cross join on a dense overlapping layer") {
    val grid = Joins.polygonGridJoin(points, polys)
      .select("poly_id", "p_id").as[(Long, Long)].collect().toSet
    val brute = points.crossJoin(polys.select(col("poly_id"), col("verts")))
      .filter(expr(Joins.pointInPolygonDynSql("verts", "lon", "lat")))
      .select("poly_id", "p_id").as[(Long, Long)].collect().toSet
    assert(grid === brute)
    assert(brute.nonEmpty, "vacuous planted layer")
    // overlaps are real: some point is inside >1 polygon
    assert(brute.groupBy(_._2).exists(_._2.size > 1),
      "planted layer has no overlapping containment — weakens the test")
  }

  test("blocking is cell-local: candidates ≪ |points|·|polys|, result identical") {
    // candidate pairs = the keyed join BEFORE the ray-cast filter
    val pCells = polys
      .withColumn("cx", explode(sequence(
        floor(col("lonc") - col("rx")).cast("long"),
        floor(col("lonc") + col("rx")).cast("long"))))
      .withColumn("cy", explode(sequence(
        floor(col("latc") - col("ry")).cast("long"),
        floor(col("latc") + col("ry")).cast("long"))))
      .select(col("cx"), col("cy"), col("poly_id"))
    val cands = points
      .withColumn("cx", floor(col("lon")).cast("long"))
      .withColumn("cy", floor(col("lat")).cast("long"))
      .join(pCells, Seq("cx", "cy")).count()
    val cross = points.count() * polys.count()
    assert(cands < cross / 10,
      s"blocking prunes <90%: $cands of $cross pairs survive")
  }

  test("declared query plans a keyed equi-join, not a product") {
    val p = Joins.joinPolygonGrid(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"polygon layer must equi-join on grid cells:\n$p")
  }
}
