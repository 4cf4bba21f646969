package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimSearch

/** The declared learned-codebook path (`simsearch_ivf_kmeans`, VERDICT
  * r13 #4): deterministic integer Lloyd. Pins (1) cell recovery /
  * balance under clustered data — the actual SemDeDup/IVF production
  * configuration the stride sample cannot deliver; (2) the exactness
  * claim behind the augmented-dimension kernel trick — the compiled
  * float/double assignment must agree with pure Long arithmetic on
  * every corpus row, which is what makes the DuckDB oracle able to
  * replicate the query bit-for-bit.
  */
class LloydCodebookSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("integer Lloyd recovers balanced cells on planted gaussian clusters") {
    val rnd = new scala.util.Random(17)
    val dim = 16
    val centers = Array.fill(4)(Array.fill(dim)(rnd.nextGaussian() * 0.3))
    // |values| stay < 0.6 like the fixture, so the 1e-6 quantization
    // regime matches the declared query's
    val rows = (0L until 200L).map { id =>
      val c = centers((id % 4).toInt)
      (id, c.map(m => (m + rnd.nextGaussian() * 0.05).toFloat).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val cb = SimSearch.ivfCodebookLloydInt(df, kCents = 4, nIter = 5,
      sampleStride = 1)
    assert(cb.length == 4)
    // assign every row driver-side (exact integer L2) and check the
    // cells recover the planted clusters: balanced (each ≈ 50) and pure
    def assign(x: Array[Long]): Long = {
      var best = Long.MinValue; var bestC = 0L
      cb.foreach { case (id, c) =>
        var dot = 0L; var nsq = 0L; var d = 0
        while (d < x.length) { dot += x(d) * c(d); nsq += c(d) * c(d); d += 1 }
        val s = 2L * dot - nsq
        if (s > best) { best = s; bestC = id }
      }
      bestC
    }
    val cells = rows.map { case (id, v) =>
      (id % 4, assign(v.toArray.map(f => math.floor(f.toDouble * 1e6 + 0.5).toLong)))
    }
    val sizes = cells.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.size == 4, s"expected 4 non-empty cells, got $sizes")
    assert(sizes.values.min >= 30,
      s"cells badly unbalanced under clustered data: $sizes")
    // purity: every planted cluster maps to ONE dominant cell
    val purity = cells.groupBy(_._1).values.map { grp =>
      grp.groupBy(_._2).values.map(_.size).max.toDouble / grp.size
    }
    assert(purity.forall(_ >= 0.95),
      s"Lloyd cells must recover the planted clusters (purity $purity)")
  }

  test("kernel assignment (augmented-dim float/double) == pure Long arithmetic on the fixture") {
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf)
    val cb = SimSearch.ivfCodebookLloydInt(emb, kCents = 8, nIter = 5,
      sampleStride = 5)
    // Spark side: the declared query's exact plan fragment
    val augCents: Array[Array[Double]] = cb.map { case (_, c) =>
      c.map(v => 2.0 * v) :+ -c.map(v => v.toDouble * v.toDouble).sum
    }
    val sparkCells = emb.select(col("vec_id"),
      graft.functions.VectorExpressions.nearestCentroidCol(
        concat(transform(col("embedding"),
          v => floor(v.cast("double") * lit(1e6) + lit(0.5)).cast("float")),
          array(lit(1.0f))),
        cb.map(_._1), augCents).as("cent_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver side: exact Long arithmetic, ties to lowest cent
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray
        .map(f => math.floor(f.toDouble * 1e6 + 0.5).toLong)))
    vecs.foreach { case (id, x) =>
      var best = Long.MinValue; var bestC = -1L
      cb.foreach { case (cid, c) =>
        var dot = 0L; var nsq = 0L; var d = 0
        while (d < x.length) { dot += x(d) * c(d); nsq += c(d) * c(d); d += 1 }
        val s = 2L * dot - nsq
        if (s > best) { best = s; bestC = cid }
      }
      assert(sparkCells(id) == bestC,
        s"vec $id: kernel cell ${sparkCells(id)} != exact cell $bestC")
    }
  }

  test("declared simsearch_ivf_kmeans clears a recall floor vs exact on the fixture") {
    def sets(df: org.apache.spark.sql.DataFrame) =
      df.collect().groupBy(_.getAs[Long]("q_id"))
        .view.mapValues(_.map(_.getAs[Long]("c_id")).toSet).toMap
    val exact = sets(SimSearch.knnBruteForce(spark, TestSpark.sf))
    val km = sets(SimSearch.simsearchIvfKmeans(spark, TestSpark.sf))
    val recalls = exact.map { case (q, ids) =>
      ids.intersect(km.getOrElse(q, Set.empty)).size.toDouble / ids.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.25, s"learned-codebook mean recall@5 $mean below floor")
  }
}
