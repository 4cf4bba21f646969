package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{SimSearch, TextOps}

/** `simsearch_range` / `simsearch_range_ivf` semantics (the FAISS
  * range_search contract) and `mix_epochs` upsampling arithmetic —
  * the behaviors beyond the value-level oracle gate.
  */
class RangeSearchSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  val sf = TestSpark.sf
  import spark.implicits._

  test("range search: IVF results are a subset of exact; both respect " +
      "the radius; exact matches the brute-force definition") {
    val exact = SimSearch.simsearchRange(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ivf = SimSearch.simsearchRangeIvf(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(exact.nonEmpty, "radius 0.30 must be non-vacuous at test SF")
    assert(exact.forall(_._3 >= 0.30) && ivf.forall(_._3 >= 0.30))
    assert(ivf.toSet.subsetOf(exact.toSet),
      s"cell pruning may only DROP candidates: ${ivf.toSet -- exact.toSet}")
    // the exact form agrees with knnOver's arithmetic: every knn top-5
    // hit above the radius must appear in the range result
    val knnAbove = SimSearch.knnBruteForce(spark, sf)
      .filter(col("cos_sim") >= 0.30)
      .select(col("q_id"), col("c_id"), col("cos_sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(knnAbove.toSet.subsetOf(exact.toSet))
  }

  test("range_ivf recovers planted same-cell neighbors exactly") {
    // a pinned 2-centroid codebook (the semDedupIncrementalWithCodebook
    // pattern): near-dups of base land in base's cell, so the nProbe=1
    // probe cannot miss them; the far cluster sits in the other cell
    def unit(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      val v = Array.fill(16)(r.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n).toSeq
    }
    def near(v: Seq[Float], eps: Float): Seq[Float] =
      v.updated(0, v(0) + eps)
    val base = unit(1); val other = unit(2)
    val cb = SimSearch.ivfCodebook(
      Seq((0L, base), (1L, other)).toDF("vec_id", "embedding"), 1L)
    val emb = Seq(
      (0L, base),              // the query, cell 0
      (1L, near(base, 0.02f)), // in-radius neighbor, cell 0
      (2L, near(base, 0.05f)), // in-radius neighbor, cell 0
      (3L, other),             // far cluster, cell 1 — outside radius
      (4L, near(other, 0.02f)))
      .toDF("vec_id", "embedding")
    val got = SimSearch.rangeIvfOver(emb, cb, minSim = 0.95,
        nQueries = 1, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((0L, 1L), (0L, 2L)), s"got $got")
    // and the exact form finds the same pairs (recall 1 on in-cell dups)
    val exact = SimSearch.rangeOver(emb, 0.95, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact === got)
  }

  test("mix_epochs: copy counts equal the literal floor(e) + coin rule " +
      "and per-source volume matches the epoch table") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val epochs = TextOps.DefaultEpochs.toMap
    def coin(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.map(b => f"$b%02x").mkString.substring(0, 8)
      (java.lang.Long.parseLong(hex, 16) % 100L).toInt
    }
    val expect = docs.flatMap { case (id, lang, src) =>
      val e = epochs.getOrElse(src, 0)
      val n = e / 100 + (if (coin(id) < e % 100) 1 else 0)
      (0 until n).map(c => (id, lang, src, c))
    }.toSet
    val got = TextOps.mixEpochs(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    assert(got === expect)
    // non-vacuous across the rule's branches: some source repeats
    // every doc (e >= 200) and some doc got a fractional extra copy
    val bySrc = got.groupBy(_._3).view.mapValues(_.size).toMap
    val nPerSrc = docs.groupBy(_._3).view.mapValues(_.size).toMap
    assert(bySrc.exists { case (s, n) => n >= 2 * nPerSrc(s) },
      "no source was upsampled to >= 2 full epochs")
    assert(got.exists(_._4 >= 1), "no doc ever emitted a second copy")
    // expected-volume sanity: each source's count sits between
    // floor(e) and ceil(e) epochs of its doc count
    bySrc.foreach { case (s, n) =>
      val e = epochs(s)
      assert(n >= (e / 100) * nPerSrc(s) &&
        n <= ((e + 99) / 100) * nPerSrc(s), s"source $s volume $n")
    }
  }
}
