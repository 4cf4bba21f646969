package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SimSearch

/** `simsearch_hybrid` — fixed-point RRF fusion of BM25 and cosine kNN.
  * A planted corpus pins the exact fusion arithmetic (including the
  * 1e6-unit floor divisions deciding a rank-sum near-tie), and a
  * fixture walk pins the self-consistency invariant: every output
  * row's rrf_score must be recomputable from its own (lex_rn, vec_rn).
  */
class HybridSearchSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("planted corpus: RRF fuses the two rank lists exactly") {
    // q = doc 0. Lexical: doc 1 repeats the query text (BM25 rank 1),
    // doc 3 shares one term (rank 2), doc 2 shares none (absent).
    // Dense: doc 2 is nearest (rank 1), doc 3 second, doc 1 orthogonal
    // (rank 3 — brute-force kNN lists every corpus vector).
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha beta gamma"),
      (2L, "zeta eta theta"),
      (3L, "alpha delta epsilon")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f)),
      (2L, Array(1f, 0.05f, 0f)),
      (3L, Array(0.9f, 0.3f, 0f))).toDF("vec_id", "embedding")
    val out = SimSearch.hybridOver(docs, emb, k = 10, nQueries = 1,
      nList = 20)
      .select("c_id", "lex_rn", "vec_rn", "rrf_score", "rn")
      .as[(Long, Int, Int, Double, Int)].collect().toList
    // expected fixed-point RRF in 1e-6 units:
    //   doc1: 1e6/61 + 1e6/63 = 16393 + 15873 = 32266  (lex 1, vec 3)
    //   doc3: 1e6/62 + 1e6/62 = 16129 + 16129 = 32258  (lex 2, vec 2)
    //   doc2:       0 + 1e6/61 = 16393                 (absent, vec 1)
    // doc1 vs doc3 is an 8-millionths near-tie — floating-point RRF
    // with a different op order could flip it; fixed-point cannot.
    assert(out === List(
      (1L, 1, 3, 0.032266, 1),
      (3L, 2, 2, 0.032258, 2),
      (2L, 0, 1, 0.016393, 3)))
  }

  test("fixture output is self-consistent and well-formed (sf0.001)") {
    val rows = SimSearch.simsearchHybrid(spark, TestSpark.sf)
      .as[(Long, Long, Int, Int, Double, Int)].collect()
    assert(rows.length === 100) // 10 queries × k=10
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._6).sorted.toList === (1 to 10).toList,
        s"query $q ranks not contiguous")
    }
    rows.foreach { case (q, c, lexRn, vecRn, score, _) =>
      assert(c !== q, s"query $q retrieved itself")
      val u = (if (lexRn > 0) 1000000L / (60 + lexRn) else 0L) +
        (if (vecRn > 0) 1000000L / (60 + vecRn) else 0L)
      assert(math.abs(score - u / 1e6) < 1e-9,
        s"($q,$c): rrf_score $score != recomputed ${u / 1e6}")
      assert(u > 0, s"($q,$c) in neither rank list")
    }
    // fused order within each query follows (rrf desc, c_id asc)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(r => (-r._5, r._2)).map(_._2).toList
      assert(rs.sortBy(_._6).map(_._2).toList === sorted,
        s"query $q fused order broken")
    }
  }

  test("lsh variant: same contract, both retrievers genuinely represented (sf0.001)") {
    val rows = SimSearch.simsearchHybridLsh(spark, TestSpark.sf)
      .as[(Long, Long, Int, Int, Double, Int)].collect()
    assert(rows.length === 100)
    rows.foreach { case (q, c, lexRn, vecRn, score, _) =>
      assert(c !== q)
      val u = (if (lexRn > 0) 1000000L / (60 + lexRn) else 0L) +
        (if (vecRn > 0) 1000000L / (60 + vecRn) else 0L)
      assert(math.abs(score - u / 1e6) < 1e-9, s"($q,$c)")
    }
    // the fusion is only meaningful if BOTH rank lists reach the output
    // — a vacuous dense side would make this the lexical ranker with
    // extra steps (the reason the declared variant buckets at 6 bits)
    assert(rows.count(_._4 > 0) >= 10, "dense (lsh) side near-vacuous")
    assert(rows.count(_._3 > 0) >= 10, "lexical side near-vacuous")
  }
}
