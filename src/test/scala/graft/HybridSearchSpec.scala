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
    // default df cap (800 per-mille): "alpha" is df 3/4 = 750‰ — under
    // the cap, so the shipped configuration leaves this corpus intact;
    // the cap's own behavior has a dedicated planted test below
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

  test("ivf variant: same contract, both retrievers genuinely represented (sf0.001)") {
    val rows = SimSearch.simsearchHybridIvf(spark, TestSpark.sf)
      .as[(Long, Long, Int, Int, Double, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, c, lexRn, vecRn, score, _) =>
      assert(c !== q)
      val u = (if (lexRn > 0) 1000000L / (60 + lexRn) else 0L) +
        (if (vecRn > 0) 1000000L / (60 + vecRn) else 0L)
      assert(math.abs(score - u / 1e6) < 1e-9, s"($q,$c)")
    }
    assert(rows.count(_._4 > 0) >= 10, "dense (ivf) side near-vacuous")
    assert(rows.count(_._3 > 0) >= 10, "lexical side near-vacuous")
  }

  test("df cap drops a stop word from the lexical side (planted, 500 per-mille)") {
    // same corpus as the fusion test: "alpha" df=3/4 (>50% — dropped),
    // "beta"/"gamma" df=2/4 (=50% — kept, boundary inclusive). doc3's
    // only shared term was alpha, so it leaves the lexical list and
    // ranks on its dense position alone; doc1 still leads on beta+gamma
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
      nList = 20, maxDfPerMille = 500)
      .select("c_id", "lex_rn", "vec_rn", "rrf_score", "rn")
      .as[(Long, Int, Int, Double, Int)].collect().toList
    // doc1: 1e6/61 + 1e6/63 = 32266; doc2: 0 + 1e6/61 = 16393;
    // doc3: 0 + 1e6/62 = 16129 (alpha's contribution gone)
    assert(out === List(
      (1L, 1, 3, 0.032266, 1),
      (2L, 0, 1, 0.016393, 2),
      (3L, 0, 2, 0.016129, 3)))
  }

  test("hot-term probe: a stop word's corpus-sized postings never enter the joins (1x/2x)") {
    // VERDICT r11 #2, the join_fuzzy 2x-data shape: every doc contains
    // the stop word "the" (df = N) plus one of 50 rare terms (df =
    // N/50). Query = doc 0 ("the r0"). Without the cap, the posting
    // join fans one key out to the whole corpus — and DOUBLES with it;
    // with the 500-per-mille cap the stop term is pruned on the
    // vocab-sized qTerms ⋈ df frame, so the largest join output stays
    // rare-posting-sized at both scales.
    def corpus(n: Int) = {
      val docs = (0 until n).map(i => (i.toLong, s"the r${i % 50}"))
        .toDF("doc_id", "text")
      val emb = (0 until n).map(i => (i.toLong, Array(1f)))
        .toDF("vec_id", "embedding")
      (docs, emb)
    }
    val noDense = (_: org.apache.spark.sql.DataFrame) =>
      Seq.empty[(Long, Long, Int)].toDF("q_id", "c_id", "rn")
    // only TERM-keyed joins: the corpus-definition join (docs ⋈ emb on
    // id) is corpus-sized by definition and not under test
    def maxTermJoinOut(mille: Int, n: Int): Long = {
      val (docs, emb) = corpus(n)
      val df = SimSearch.hybridOver(docs, emb, k = 10, nQueries = 1,
        nList = 20, dense = noDense, maxDfPerMille = mille)
      df.collect()
      SpecUtil.collectPlan(df.queryExecution.executedPlan) {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec
            if (j.leftKeys ++ j.rightKeys)
              .exists(_.references.exists(_.name == "term")) =>
          j.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
      }.max
    }
    val n = 400
    val uncapped1x = maxTermJoinOut(1000, n)
    val uncapped2x = maxTermJoinOut(1000, 2 * n)
    val capped1x = maxTermJoinOut(800, n) // the DEFAULT cap
    val capped2x = maxTermJoinOut(800, 2 * n)
    // uncapped: the stop term floods — corpus-sized and corpus-tracking
    assert(uncapped1x >= n && uncapped2x >= 2 * n,
      s"probe not hot: uncapped join outputs $uncapped1x / $uncapped2x")
    // capped: bounded by the rare term's postings (n/50), both scales
    assert(capped1x <= n / 50 + 10 && capped2x <= 2 * n / 50 + 10,
      s"cap leaked postings: $capped1x / $capped2x (corpus $n / ${2 * n})")
  }
}
