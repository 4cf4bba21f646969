package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.Windows

/** Randomized GROUPS-frame semantics property (VERDICT r10 #2): the
  * dense_rank+RANGE emulation `win_groups_frame` executes must equal a
  * LITERAL peer-group evaluator on random partitions with duplicate
  * order keys and random frame widths. DuckDB 1.0 has no GROUPS frames,
  * so the cross-engine oracle pins only the arithmetic — this property
  * pins the frame mode itself. Each trial batches dozens of generated
  * partitions into one Spark query (10 trials × 25–40 partitions ≈
  * 300+ cases), and every trial plants tie-cluster-at-edge partitions
  * beside the random ones.
  */
class GroupsFrameProperties extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  /** rows: (partition, orderKey, value, rowId). Literal semantics: a
    * row's frame is every row whose orderKey's peer-group index (within
    * the partition's sorted distinct orderKeys) lies in [g-k, g].
    */
  private def brute(rows: Seq[(Int, Int, Long, Long)], k: Int)
      : Map[Long, (Long, Long)] =
    rows.groupBy(_._1).flatMap { case (_, rs) =>
      val gIdx = rs.map(_._2).distinct.sorted.zipWithIndex.toMap
      rs.map { case (_, ord, _, id) =>
        val g = gIdx(ord)
        val frame = rs.filter(x => gIdx(x._2) >= g - k && gIdx(x._2) <= g)
        id -> ((frame.map(_._3).sum, frame.size.toLong))
      }
    }

  test("emulation equals the literal peer-group evaluator on random partitions") {
    val genPartition: Gen[List[(Int, Long)]] = for {
      n <- Gen.choose(1, 16)
      ordDomain <- Gen.choose(1, 5) // tiny key domain => dense ties
      rows <- Gen.listOfN(n, for {
        o <- Gen.choose(1, ordDomain)
        v <- Gen.choose(-50L, 50L)
      } yield (o, v))
    } yield rows
    val genCase: Gen[(Int, List[List[(Int, Long)]])] = for {
      k <- Gen.choose(0, 4)
      nPart <- Gen.choose(25, 40)
      ps <- Gen.listOfN(nPart, genPartition)
    } yield (k, ps)

    // planted beside every random batch: a single giant peer group, tie
    // clusters at both partition edges, and a strictly increasing run
    val planted: List[List[(Int, Long)]] = List(
      List.fill(6)((7, 3L)),
      List((1, 1L), (1, 2L), (2, 4L), (3, 8L), (3, 16L), (3, 32L)),
      List((5, 1L), (5, 1L), (6, 2L), (7, 4L), (7, 4L)),
      (1 to 8).map(i => (i, i.toLong)).toList)

    val prop = Prop.forAll(genCase) { case (k, randomParts) =>
      val parts = randomParts ++ planted
      val rows = parts.zipWithIndex.flatMap { case (p, pi) =>
        p.zipWithIndex.map { case ((o, v), ri) =>
          (pi, o, v, pi.toLong * 1000 + ri)
        }
      }
      val df = rows.toDF("p", "o", "v", "id")
      val got = Windows.groupsFrameK(df, "p", "o", "v", k)
        .select(col("id"), col("grp_sum").cast("long"), col("grp_cnt"))
        .as[(Long, Long, Long)].collect()
        .map { case (id, s, c) => id -> ((s, c)) }.toMap
      got == brute(rows, k)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }
}
