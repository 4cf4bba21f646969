package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SimSearch

/** `simsearch_pq` — product-quantized ANN. A literal Scala reference
  * model (explicit per-subspace argmax + lookup-table sums, lowest-id
  * ties) pins the distributed formulation on deterministic pseudo-
  * random vectors; a codebook-aligned planted corpus pins exactness
  * when quantization is lossless; the fixture test pins the output
  * contract.
  */
class PqSearchSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def refPq(vecs: Seq[(Long, Array[Float])], k: Int, nQ: Int,
      stride: Long, m: Int): Seq[(Long, Long, Double, Int)] = {
    val cb = vecs.filter(_._1 % stride == 0).sortBy(_._1)
    val dim = cb.head._2.length
    val sub = dim / m
    def sdot(a: Array[Float], b: Array[Float], s: Int): Double = {
      var acc = 0.0
      var i = s * sub
      while (i < (s + 1) * sub) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def assign(v: Array[Float], s: Int): Long = {
      var best = Double.NegativeInfinity
      var bestId = -1L
      cb.foreach { case (id, c) =>
        // min L2 via the dot − ‖c‖²/2 identity (canonical PQ assignment)
        val d = sdot(v, c, s) - sdot(c, c, s) / 2
        if (d > best) { best = d; bestId = id } // first wins: lowest id
      }
      bestId
    }
    val queries = vecs.filter(_._1 < nQ)
    queries.flatMap { case (qId, q) =>
      val lut = (for (s <- 0 until m; (id, c) <- cb)
        yield (s, id) -> math.round(sdot(q, c, s) * 1e6)).toMap
      vecs.filter(_._1 != qId)
        .map { case (cId, v) =>
          val scoreU = (0 until m).map(s => lut((s, assign(v, s)))).sum
          (cId, scoreU)
        }
        .sortBy { case (cId, s) => (-s, cId) }
        .take(k).zipWithIndex
        .map { case ((cId, s), i) =>
          (qId, cId, BigDecimal(s / 1e6)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, i + 1)
        }
    }.sortBy(r => (r._1, r._4))
  }

  test("pq equals the literal reference model on pseudo-random vectors") {
    // deterministic "random" vectors from an integer mix — no RNG state
    val vecs = (0L until 60L).map { id =>
      id -> Array.tabulate(8)(d =>
        (((id * 31 + d * 17 + 7) % 19).toFloat - 9f) / 9f)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = SimSearch.pqOver(df, k = 4, nQueries = 3,
      centroidStride = 13, m = 4)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(got === refPq(vecs, 4, 3, 13, 4))
    assert(got.size === 12)
  }

  test("pq is exact on a codebook-aligned corpus (lossless quantization)") {
    // 4 centroids with per-subspace patterns whose self-dot dominates
    // (1,0) / (0,1) / (-1,0) / (0,-1): every clone assigns to its own
    // centroid, so the PQ score IS the exact dot product
    val pat = Array(Array(1f, 0f), Array(0f, 1f), Array(-1f, 0f),
      Array(0f, -1f))
    def vecOf(j: Int): Array[Float] = Array.fill(4)(pat(j)).flatten
    // ids 0..3 are the codebook (stride 1 would also include clones —
    // use stride 1 so corpus == codebook ∪ clones, all codebook-valued)
    val vecs = (0L until 20L).map(id => id -> vecOf((id % 4).toInt))
    val df = vecs.toDF("vec_id", "embedding")
    val got = SimSearch.pqOver(df, k = 19, nQueries = 1,
      centroidStride = 1, m = 4)
      .as[(Long, Long, Double, Int)].collect().toSeq
    // query 0 has pattern 0: exact dot = +4 for same-pattern clones,
    // 0 for orthogonal (patterns 1/3), -4 for opposite (pattern 2)
    val expected = vecs.drop(1)
      .map { case (cId, v) =>
        (cId, (0 until 8).map(i => vecOf(0)(i).toDouble * v(i)).sum)
      }
      .sortBy { case (cId, d) => (-d, cId) }
      .zipWithIndex.map { case ((cId, d), i) => (0L, cId, d, i + 1) }
    assert(got === expected)
  }

  test("learned per-subspace codebook lifts recall on clusterable data (quality path)") {
    // 8 cluster prototypes; corpus = prototypes under small deterministic
    // perturbation — the structure PQ is built for. The stride codebook
    // picks arbitrary members; k-means per subspace recovers the
    // prototypes, so the learned recall vs exact-dot must dominate.
    // 10 members per cluster and k = 9 (own cluster minus self): within
    // a cluster every member shares the same codes, so PQ cannot rank
    // INSIDE a cluster — sizing top-k to the cluster makes recall
    // measure cluster RETRIEVAL (what PQ is for), not tie-break luck
    val protos = (0 until 8).map { g =>
      Array.tabulate(8)(d => if (d == g) 4f else (if ((d + g) % 3 == 0) 1f else -1f))
    }
    val vecs = (0L until 80L).map { id =>
      val p = protos((id % 8).toInt)
      id -> p.zipWithIndex.map { case (v, d) =>
        v + 0.01f * (((id * 7 + d * 3) % 5).toInt - 2)
      }
    }
    val df = vecs.toDF("vec_id", "embedding")
    def exactTop(qId: Long, k: Int): Set[Long] = {
      val q = vecs(qId.toInt)._2
      vecs.filter(_._1 != qId)
        .map { case (cId, v) =>
          (cId, (0 until 8).map(i => q(i).toDouble * v(i)).sum)
        }
        .sortBy { case (cId, d) => (-d, cId) }.take(k).map(_._1).toSet
    }
    def recall(res: Seq[(Long, Long, Double, Int)], k: Int): Double = {
      val byQ = res.groupBy(_._1)
      byQ.map { case (q, rs) =>
        rs.map(_._2).toSet.intersect(exactTop(q, k)).size.toDouble / k
      }.sum / byQ.size
    }
    val k = 9
    val stride = SimSearch.pqOver(df, k, nQueries = 4,
      centroidStride = 37, m = 4)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val learned = SimSearch.pqOverCodebook(df,
      SimSearch.pqCodebookKmeans(df, kCents = 8, m = 4), k, nQueries = 4,
      m = 4)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val (rs, rl) = (recall(stride, k), recall(learned, k))
    assert(rl >= rs - 1e-9,
      s"learned codebook must not lose to the stride sample: $rl vs $rs")
    assert(rl >= 0.8, s"learned recall floor on clusterable data: $rl")
  }

  test("ivfpq: cell pruning keeps cluster recall and bounds the scored candidates") {
    // same clusterable corpus as the learned-codebook test; LEARNED
    // coarse + PQ codebooks, nProbe=1: the probe selects the query's
    // own cell, candidates are cluster-sized — and recall stays high
    // because the pruned-away vectors were never the true neighbors
    val protos = (0 until 8).map { g =>
      Array.tabulate(8)(d => if (d == g) 4f else (if ((d + g) % 3 == 0) 1f else -1f))
    }
    val vecs = (0L until 80L).map { id =>
      val p = protos((id % 8).toInt)
      id -> p.zipWithIndex.map { case (v, d) =>
        v + 0.01f * (((id * 7 + d * 3) % 5).toInt - 2)
      }
    }
    val df = vecs.toDF("vec_id", "embedding")
    val coarse = SimSearch.ivfCodebookKmeans(df, kCents = 8)
    val pqCb = SimSearch.pqCodebookKmeans(df, kCents = 8, m = 4)
    val res = SimSearch.ivfPqOver(df, coarse, pqCb, k = 9, nQueries = 4,
      m = 4, nProbe = 1)
    val rows = res.as[(Long, Long, Double, Int)].collect().toSeq
    def exactTop(qId: Long, k: Int): Set[Long] = {
      val q = vecs(qId.toInt)._2
      vecs.filter(_._1 != qId)
        .map { case (cId, v) =>
          (cId, (0 until 8).map(i => q(i).toDouble * v(i)).sum)
        }
        .sortBy { case (cId, d) => (-d, cId) }.take(k).map(_._1).toSet
    }
    val recall = rows.groupBy(_._1).map { case (q, rs) =>
      rs.map(_._2).toSet.intersect(exactTop(q, 9)).size.toDouble / 9
    }.sum / 4
    assert(recall >= 0.8, s"ivfpq recall under nProbe=1 pruning: $recall")
    // executed-metric prune pin: the cent_id cell join's output is
    // candidate-sized (m * ~cluster), never corpus-sized (m * 80 * 4)
    val cellJoinOut = SpecUtil.collectPlan(res.queryExecution.executedPlan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if (j.leftKeys ++ j.rightKeys)
            .exists(_.references.exists(_.name == "cent_id")) =>
        j.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
    }
    assert(cellJoinOut.nonEmpty && cellJoinOut.forall(_ <= 4L * 4 * 12),
      s"cell join must prune to ~cluster-sized candidates: $cellJoinOut")
  }

  test("residual encoding cuts PQ score distortion on clustered data " +
      "(same codebook budget, same candidates)") {
    // 4 far-apart cluster centers, members = center + small shared
    // offset patterns: plain PQ's codewords must encode ABSOLUTE
    // positions (4 clusters × offsets >> codebook), residual PQ only
    // the offsets — the exact situation FAISS encodes residuals for.
    // Both searchers use the SAME stride codebooks and nProbe=1, so
    // candidate sets are identical and the comparison is pure scoring.
    val centers = (0 until 4).map { g =>
      Array.tabulate(8)(d => if (d == 2 * (g % 4) || d == (g + 5) % 8)
        10f * (if (g % 2 == 0) 1 else -1) else 0f)
    }
    val vecs = (0L until 40L).map { id =>
      val c = centers((id % 4).toInt)
      val pat = ((id / 4) % 5).toInt
      id -> c.zipWithIndex.map { case (v, d) =>
        v + 0.5f * (((pat * 7 + d * 3) % 5) - 2)
      }
    }
    val df = vecs.toDF("vec_id", "embedding")
    // stride 11 lands one coarse centroid per cluster (ids 0,11,22,33)
    val coarse = SimSearch.ivfCodebook(df, 11L)
    val pqCb = SimSearch.ivfCodebook(df, 7L)
    assert(coarse.map(_._1 % 4).toSet.size === 4, "coarse must cover all clusters")
    def exactDot(q: Long, c: Long): Double = {
      val (qa, ca) = (vecs(q.toInt)._2, vecs(c.toInt)._2)
      (0 until 8).map(i => qa(i).toDouble * ca(i)).sum
    }
    def meanErr(res: Seq[(Long, Long, Double, Int)]): Double =
      res.map { case (q, c, s, _) => math.abs(s - exactDot(q, c)) }
        .sum / res.size
    val plain = SimSearch.ivfPqOver(df, coarse, pqCb, k = 9,
      nQueries = 4, m = 4, nProbe = 1)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val resid = SimSearch.ivfPqResidualOver(df, coarse, pqCb, k = 9,
      nQueries = 4, m = 4, nProbe = 1)
      .as[(Long, Long, Double, Int)].collect().toSeq
    // k=9 = the whole probed cell minus self → identical pair sets
    assert(plain.map(r => (r._1, r._2)).toSet ===
      resid.map(r => (r._1, r._2)).toSet)
    val (ep, er) = (meanErr(plain), meanErr(resid))
    assert(er < ep / 2,
      s"residual encoding must at least halve the score distortion " +
        s"here: residual=$er plain=$ep")
  }

  test("rotation cuts PQ distortion when one subspace hogs the energy " +
      "(the OPQ failure mode, planted)") {
    // all variance in dims 0..15 = subspace 0: plain PQ must encode
    // every distinction with ONE subspace's codes while three encode
    // zeros; the 27i mod 64 permutation scatters those 16 live dims
    // across all four subspaces, whose codes then compose (product
    // quantization's entire premise)
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 60L).map { id =>
      id -> Array.tabulate(64)(d =>
        if (d < 16) rnd.nextFloat() * 4 - 2 else 0f)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val cb = SimSearch.ivfCodebook(df, 7L)
    def exactDot(q: Long, c: Long): Double = {
      val (qa, ca) = (vecs(q.toInt)._2, vecs(c.toInt)._2)
      (0 until 64).map(i => qa(i).toDouble * ca(i)).sum
    }
    def meanErr(res: Seq[(Long, Long, Double, Int)]): Double =
      res.map { case (q, c, s, _) => math.abs(s - exactDot(q, c)) }
        .sum / res.size
    val k = 59 // the whole corpus minus self: same pair set both ways
    val plain = SimSearch.pqOverCodebook(df, cb, k, nQueries = 4, m = 4)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val rot = SimSearch.pqOverCodebook(
      SimSearch.rotate(df, 64, 27),
      cb.map { case (id, v, nrm) =>
        (id, Array.tabulate(64)(i => v((i * 27) % 64)), nrm)
      }, k, nQueries = 4, m = 4)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(plain.map(r => (r._1, r._2)).toSet ===
      rot.map(r => (r._1, r._2)).toSet)
    val (ep, er) = (meanErr(plain), meanErr(rot))
    assert(er < ep,
      s"rotation must cut distortion on subspace-concentrated energy: " +
        s"rotated=$er plain=$ep")
  }

  test("eigen-allocation rotation beats the fixed permutation on an " +
      "adversarial energy layout (the OPQ-PCA win, planted)") {
    // plant ALL energy in exactly the input dims the FIXED pi
    // (out[i] = in[27i mod 64]) gathers into subspace 0 — the layout
    // where the fixed rotation degenerates back to one-subspace
    // concentration, while the PCA-learned dealing spreads the live
    // dims round-robin (4 per subspace) by |loading| rank
    val liveDims = (0 until 16).map(i => (27 * i) % 64).toSet
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 60L).map { id =>
      id -> Array.tabulate(64)(d =>
        if (liveDims(d)) rnd.nextFloat() * 4 - 2 else 0f)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val cb = SimSearch.ivfCodebook(df, 7L)
    def exactDot(q: Long, c: Long): Double = {
      val (qa, ca) = (vecs(q.toInt)._2, vecs(c.toInt)._2)
      (0 until 64).map(i => qa(i).toDouble * ca(i)).sum
    }
    def meanErr(res: Seq[(Long, Long, Double, Int)]): Double =
      res.map { case (q, c, s, _) => math.abs(s - exactDot(q, c)) }
        .sum / res.size
    val k = 59
    def runWithPerm(perm: Array[Int]) = SimSearch.pqOverCodebook(
      df.select(col("vec_id"), array((0 until 64).map(j =>
        element_at(col("embedding"), perm(j) + 1)): _*).as("embedding")),
      cb.map { case (id, v, nrm) =>
        (id, Array.tabulate(64)(j => v(perm(j))), nrm)
      }, k, nQueries = 4, m = 4)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val fixedPerm = Array.tabulate(64)(i => (27 * i) % 64)
    val v = SimSearch.pcaDirectionOf(df, 64, 20)
    // the learned ranking must identify exactly the live dims
    val top16 = (0 until 64).sortBy(i => (-BigInt(v(i)).abs, i)).take(16)
    assert(top16.toSet === liveDims,
      "PCA |loadings| must rank the live dims first")
    val eigen = SimSearch.eigenAllocPerm(v, 4)
    (0 until 4).foreach { g =>
      val live = (0 until 16).count(t => liveDims(eigen(g * 16 + t)))
      assert(live === 4, s"subspace $g must get 4 live dims, got $live")
    }
    val (eFixed, eEigen) =
      (meanErr(runWithPerm(fixedPerm)), meanErr(runWithPerm(eigen)))
    assert(eEigen < eFixed,
      "the learned dealing must beat the fixed permutation on its " +
        s"adversarial layout: eigen=$eEigen fixed=$eFixed")
  }

  test("rerank recall dominates plain PQ (exact re-rank of a superset " +
      "shortlist can only surface more true neighbors)") {
    val sf = TestSpark.sf
    val exact = SimSearch.knnBruteForce(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(rows: Array[(Long, Long)]): Double = {
      val byQ = rows.groupBy(_._1)
      byQ.map { case (q, rs) =>
        rs.map(_._2).toSet.intersect(exact(q)).size.toDouble /
          exact(q).size
      }.sum / byQ.size
    }
    val pq = SimSearch.simsearchPq(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rr = SimSearch.simsearchRerank(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (rp, rrr) = (recall(pq), recall(rr))
    // every true neighbor the 20-candidate shortlist contains beats
    // every non-neighbor under the exact metric, so rerank's top-5
    // holds at least the shortlist's true hits — and pq's top-5 is a
    // subset of that shortlist: recall(rerank) >= recall(pq), always
    assert(rrr >= rp - 1e-9, s"rerank lost recall: $rrr vs pq $rp")
  }

  test("fixture output contract (sf0.001): 10 queries x top-5, no self-hits") {
    val rows = SimSearch.simsearchPq(spark, TestSpark.sf)
      .as[(Long, Long, Double, Int)].collect()
    assert(rows.length === 50)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._4).sorted.toList === (1 to 5).toList)
      assert(rs.forall(_._2 != q), s"query $q retrieved itself")
    }
  }
}
