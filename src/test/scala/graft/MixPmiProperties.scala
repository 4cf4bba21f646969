package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.{GraphOps, TextOps}

/** Randomized properties for the round-11 continuation operators (the
  * GroupsFrameProperties treatment): `mix_budget`/`mix_budget_approx`
  * against an independent selection model, `ngram_pmi` against a
  * brute-force local calculator, and `solvePagerank` against a plain
  * double-arithmetic power iteration on random graphs.
  */
class MixPmiProperties extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("mix_budget == mix_budget_approx == the reference model on random corpora") {
    val genCase = for {
      n <- Gen.choose(1, 70)
      docs <- Gen.listOfN(n, for {
        lang <- Gen.oneOf("en", "de", "zh")
        ntok <- Gen.choose(0, 12) // 0 => empty text (counts as 1 token)
      } yield (lang, ntok))
      budget <- Gen.choose(1L, 150L)
      buckets <- Gen.oneOf(4, 16, 64)
    } yield (docs, budget, buckets)

    val prop = Prop.forAll(genCase) { case (docs, budget, buckets) =>
      val rows = docs.zipWithIndex.map { case ((lang, ntok), i) =>
        (i.toLong, lang, (1 to ntok).map(j => s"w$j").mkString(" "))
      }
      val df = rows.toDF("doc_id", "lang", "text")
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))
      val exact = TextOps.mixBudgetDocs(df, budget).collect().map(key).toSeq
      val approx = TextOps.mixBudgetApproxDocs(df, budget, buckets)
        .collect().map(key).toSeq
      // independent model: split(normText) counts an empty doc as 1 token
      val ref = rows.map { case (id, lang, text) =>
        (id, lang, math.max(1L, text.split(" ").count(_.nonEmpty).toLong))
      }.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
        val ordered = ds.sortBy(d => (SpecUtil.md5Rank(d._1), d._1))
        val cums = ordered.scanLeft(0L)(_ + _._3)
        ordered.zip(cums).collect { case ((id, lg, nt), before)
          if before < budget => (id, lg, nt, before + nt) }
      }.sortBy(_._1)
      exact == ref && approx == ref
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, result.status.toString)
  }

  test("mix_weighted (pruned window) == the per-language model on random corpora") {
    val genCase = for {
      n <- Gen.choose(1, 70)
      docs <- Gen.listOfN(n, for {
        lang <- Gen.oneOf("en", "de", "zh")
        ntok <- Gen.choose(0, 12)
      } yield (lang, ntok))
      total <- Gen.choose(1L, 300L)
      wEn <- Gen.choose(0, 700)
      wDe <- Gen.choose(0, 1000 - 700) // zh deliberately unlisted half the time
      listZh <- Gen.oneOf(true, false)
      buckets <- Gen.oneOf(1, 4, 16, 64) // 1 = effectively unpruned
    } yield (docs, total,
      Seq("en" -> wEn, "de" -> wDe) ++
        (if (listZh) Seq("zh" -> (1000 - wEn - wDe)) else Nil),
      buckets)

    val prop = Prop.forAll(genCase) { case (docs, total, weights, buckets) =>
      val rows = docs.zipWithIndex.map { case ((lang, ntok), i) =>
        (i.toLong, lang, (1 to ntok).map(j => s"w$j").mkString(" "))
      }
      val df = rows.toDF("doc_id", "lang", "text")
      val got = TextOps.mixWeightedDocs(df, total, weights, buckets)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSeq
      val budgets = weights.map { case (lg, w) => lg -> total * w / 1000 }
        .toMap.withDefaultValue(0L)
      val ref = rows.map { case (id, lang, text) =>
        (id, lang, math.max(1L, text.split(" ").count(_.nonEmpty).toLong))
      }.groupBy(_._2).toSeq.flatMap { case (lg, ds) =>
        val ordered = ds.sortBy(d => (SpecUtil.md5Rank(d._1), d._1))
        val cums = ordered.scanLeft(0L)(_ + _._3)
        ordered.zip(cums).collect { case ((id, lgg, nt), before)
          if before < budgets(lg) => (id, lgg, nt, before + nt) }
      }.sortBy(_._1)
      got == ref
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, result.status.toString)
  }

  test("mix_temperature == the smoothed-weight per-language model on random corpora") {
    val genCase = for {
      n <- Gen.choose(1, 70)
      docs <- Gen.listOfN(n, for {
        lang <- Gen.oneOf("en", "de", "zh")
        ntok <- Gen.choose(0, 12)
      } yield (lang, ntok))
      total <- Gen.choose(1L, 300L)
      buckets <- Gen.oneOf(1, 4, 16, 64)
    } yield (docs, total, buckets)

    val prop = Prop.forAll(genCase) { case (docs, total, buckets) =>
      val rows = docs.zipWithIndex.map { case ((lang, ntok), i) =>
        (i.toLong, lang, (1 to ntok).map(j => s"w$j").mkString(" "))
      }
      val df = rows.toDF("doc_id", "lang", "text")
      val got = TextOps.mixTemperatureDocs(df, total, buckets)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSeq
      // independent model: ⌊√n_l⌋ weights, integer shares, hash prefix
      val toks = rows.map { case (id, lang, text) =>
        (id, lang, math.max(1L, text.split(" ").count(_.nonEmpty).toLong))
      }
      val totals = toks.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val ws = totals.map { case (lg, t) =>
        lg -> math.floor(math.sqrt(t.toDouble)).toLong }
      val sumW = ws.values.sum
      val budgets = ws.map { case (lg, w) => lg -> total * w / sumW }
        .withDefaultValue(0L)
      val ref = toks.groupBy(_._2).toSeq.flatMap { case (lg, ds) =>
        val ordered = ds.sortBy(d => (SpecUtil.md5Rank(d._1), d._1))
        val cums = ordered.scanLeft(0L)(_ + _._3)
        ordered.zip(cums).collect { case ((id, lgg, nt), before)
          if before < budgets(lg) => (id, lgg, nt, before + nt) }
      }.sortBy(_._1)
      got == ref
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, result.status.toString)
  }

  test("mix_temperature on an EMPTY corpus returns the empty schedule " +
      "instead of dividing by zero (advisor finding: sumW == 0)") {
    val empty = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "lang", "text")
    val got = TextOps.mixTemperatureDocs(empty, 10000L)
    assert(got.columns.toSeq ===
      Seq("doc_id", "lang", "n_tokens", "cum_tokens"))
    assert(got.count() === 0L)
  }

  test("ngram_pmi equals a brute-force local calculator on random corpora") {
    val genCase = for {
      vocab <- Gen.choose(2, 6)
      nDocs <- Gen.choose(1, 40)
      docs <- Gen.listOfN(nDocs,
        Gen.choose(0, 8).flatMap(len =>
          Gen.listOfN(len, Gen.choose(0, vocab - 1).map(i => s"t$i"))))
      minCount <- Gen.choose(1, 3)
    } yield (docs, minCount)

    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    val prop = Prop.forAll(genCase) { case (docs, minCount) =>
      val df = docs.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TextOps.ngramPmiDocs(df, minCount, k = 1000).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
      // brute force with the SAME IEEE expression tree
      val toks = docs.map(_.filter(_.nonEmpty))
      val allTok = toks.flatten
      val c1 = allTok.groupBy(identity).map { case (w, xs) =>
        w -> xs.size.toLong
      }
      val bigrams = toks.flatMap(ts => ts.zip(ts.drop(1)))
      val n1 = allTok.size.toDouble
      val n2 = bigrams.size.toDouble
      val ref = bigrams.groupBy(identity).toSeq
        .map { case ((w1, w2), xs) => (w1, w2, xs.size.toLong) }
        .filter(_._3 >= minCount)
        .map { case (w1, w2, c12) =>
          val pmi = round6(math.log((c12.toDouble / n2) /
            ((c1(w1).toDouble / n1) * (c1(w2).toDouble / n1))))
          (w1, w2, c12, c1(w1), c1(w2), pmi)
        }
        .sortBy { case (w1, w2, _, _, _, pmi) => (-pmi, w1, w2) }
      got == ref
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, result.status.toString)
  }

  test("solvePagerank tracks a double-arithmetic power iteration on random graphs") {
    val genCase = for {
      n <- Gen.choose(1, 15)
      nEdges <- Gen.choose(0, 40)
      edges <- Gen.listOfN(nEdges, for {
        u <- Gen.choose(0, n - 1)
        v <- Gen.choose(0, n - 1)
        w <- Gen.choose(1L, 20L)
      } yield ((u.toLong, v.toLong), w))
    } yield (n, edges.toMap.toSeq.map { case ((u, v), w) => (u, v, w) })

    val prop = Prop.forAll(genCase) { case (n, edges) =>
      val nodes = (0L until n.toLong).toSeq
      val got = GraphOps.solvePagerank(edges, nodes, 5)
        .map { case (v, p) => v -> p / 1e12 }.toMap
      // plain double reference (no fixed point)
      val out = edges.groupBy(_._1).map { case (u, es) =>
        u -> es.map(_._3).sum.toDouble
      }
      var p = nodes.map(_ -> 1.0 / n).toMap
      for (_ <- 1 to 5) {
        val s = scala.collection.mutable.Map[Long, Double]()
          .withDefaultValue(0.0)
        edges.foreach { case (u, v, w) => s(v) += p(u) * (w / out(u)) }
        val dm = p.collect { case (u, pu) if !out.contains(u) => pu }.sum
        p = nodes.map(v => v -> (0.15 / n + 0.85 * (s(v) + dm / n))).toMap
      }
      val close = nodes.forall(v => math.abs(got(v) - p(v)) < 1e-7)
      val mass = got.values.sum
      close && mass <= 1.0 + 1e-12 && mass > 1.0 - 1e-6
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(result.passed, result.status.toString)
  }
}
