package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Joins

/** Round-11 hot-cell guard for `join_spatial_grid` (VERDICT r10 #4): a
  * planted city-dense cell must (a) still produce exactly the
  * brute-force result and (b) have its candidate generation split from
  * one coarse-cell mega key onto many fine-cell keys. Measured on the
  * executed [[Joins.spatialCandidates]] frames, not a spec-side copy of
  * the grid arithmetic.
  */
class SpatialHotCellSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  // mirror of the operator's cell sizing, used ONLY to PLACE the city
  // wall-to-wall inside exactly one coarse cell (measurements below run
  // on the operator's own frames)
  private val R = 6371.0088
  private val latCell = math.toDegrees(50.0 / R) * 1.0001
  private val lonCell = math.toDegrees(2.0 * math.asin(
    math.sin(50.0 / (2.0 * R)) / math.cos(math.toRadians(55.0)))) * 1.0001

  private lazy val (sup, cust) = {
    val lat0 = 111.0 * latCell + 0.005
    val lon0 = 13.0 * lonCell + 0.005
    val latW = latCell - 0.01
    val lonW = lonCell - 0.01
    // city: 800 suppliers + 4000 customers spread across the full cell
    // (~50x55 km - corner pairs fall OUT of radius, so the verification
    // filter stays falsifiable); background: sparse cold cells
    val citySup = (0 until 800).map { i =>
      (i.toLong, lat0 + (i * 7 % 997) / 997.0 * latW,
        lon0 + (i * 13 % 983) / 983.0 * lonW)
    }
    val bgSup = (0 until 200).map { i =>
      (1000L + i, 45.0 + (i * 37 % 1000) / 100.0, (i * 41 % 2000) / 100.0)
    }
    val cityCust = (0 until 4000).map { i =>
      (100000L + i, lat0 + (i * 11 % 991) / 991.0 * latW,
        lon0 + (i * 17 % 977) / 977.0 * lonW)
    }
    val bgCust = (0 until 500).map { i =>
      (200000L + i, 45.0 + (i * 29 % 1000) / 100.0, (i * 31 % 2000) / 100.0)
    }
    ((citySup ++ bgSup).toDF("s_id", "slat", "slon"),
      (cityCust ++ bgCust).toDF("c_id", "clat", "clon"))
  }

  test("hot-path result equals the brute-force cross join") {
    val dPhi = (radians(col("clat")) - radians(col("slat"))) / 2.0
    val dLam = (radians(col("clon")) - radians(col("slon"))) / 2.0
    val dist = lit(2.0 * R) * asin(sqrt(
      pow(sin(dPhi), 2.0) +
        cos(radians(col("slat"))) * cos(radians(col("clat"))) *
          pow(sin(dLam), 2.0)))
    val brute = sup.crossJoin(cust).filter(dist <= 50.0)
      .select(col("s_id"), col("c_id"), round(dist, 6).as("d"))
    val got = Joins.spatialGridJoin(sup, cust, 50.0, 1024, 55.0)
      .select(col("s_id"), col("c_id"), round(col("dist_km"), 6).as("d"))
    assert(got.count() === brute.count())
    assert(got.count() > 100000L, "city pairs should dominate")
    assert(got.except(brute).isEmpty && brute.except(got).isEmpty)
  }

  test("a hot cell's candidates split onto fine-cell keys with a bounded max key") {
    def maxPerKey(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(col("fine"), col("j1"), col("j2")).count()
        .agg(max(col("count"))).as[Long].head()
    val capped = Joins.spatialCandidates(sup, cust, 50.0, 1024, 55.0).cache()
    val uncapped = Joins.spatialCandidates(sup, cust, 50.0,
      Int.MaxValue, 55.0).cache()
    // with no cap every candidate is a coarse-path candidate; the city
    // cell is one mega join key
    assert(uncapped.filter(col("fine")).count() === 0L)
    assert(capped.filter(col("fine")).count() > 0L,
      "planted city did not trip the hot path")
    // the guard's point: the biggest join-key task shrinks by the
    // fine-grid fan-out (expected ~16x for a full-cell city; assert 4x
    // so cell-boundary slivers can't flake the test)
    val mk = maxPerKey(capped)
    val mkAll = maxPerKey(uncapped)
    assert(mk * 4 <= mkAll,
      s"hot path did not split the mega key: capped=$mk uncapped=$mkAll")
    // refinement must not inflate total candidates (fine path prunes
    // the coarse 3x3 fringe; tiny overlap tolerance for cell edges)
    assert(capped.count() <= (uncapped.count() * 1.1).toLong,
      s"fine path inflated candidates: ${capped.count()} vs ${uncapped.count()}")
    capped.unpersist(); uncapped.unpersist()
  }

  test("all-cold corpus never routes through the fine path") {
    val bg = Joins.spatialCandidates(
      sup.filter(col("s_id") >= 1000L), cust.filter(col("c_id") >= 200000L),
      50.0, 1024, 55.0)
    assert(bg.filter(col("fine")).count() === 0L)
  }
}
