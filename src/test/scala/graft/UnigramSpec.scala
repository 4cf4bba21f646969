package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.UnigramTrain

/** Unigram-LM trainer (`unigram_train`): the Spark DP must equal a
  * LITERAL Scala reference implementation (same seed, scores, Viterbi
  * tie rule) on randomized corpora, segmentations must reconstruct
  * their words, and the EM prune must drop exactly the unused seeds.
  */
class UnigramSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  /** Literal reference: mirrors UnigramTrain.trainWords stage for
    * stage, with scores computed through the same Spark expression so
    * ln/round arithmetic is shared (the DP and counts — the logic under
    * test — are independent re-implementations).
    */
  private def reference(words: Map[String, Long])
      : (Map[String, (Long, Long)], Map[String, Seq[String]]) = {
    val sub = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      for (i <- 0 until w.length; n <- 1 to 3 if i + n <= w.length)
        sub.updateWith(w.substring(i, i + n))(c => Some(c.getOrElse(0L) + f))
    }
    val singles = sub.filter(_._1.length == 1)
    val multis = sub.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(64)
    val vocab = (singles ++ multis).toMap
    val total = vocab.values.sum
    // same engine arithmetic for the transcendental step
    val score = vocab.toSeq.toDF("piece", "c")
      .select(col("piece"),
        (round(log(col("c").cast("double") / total.toDouble), 6)
          .cast("decimal(18,6)") * 1000000).cast("long").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    def viterbi(w: String): Seq[String] = {
      val L = w.length
      val dp = new Array[Long](L + 1); val back = new Array[Int](L + 1)
      for (i <- 1 to L) {
        var best = Long.MinValue; var bj = -1
        for (n <- 1 to 3; j = i - n if j >= 0) {
          score.get(w.substring(j, i)).foreach { s =>
            val v = dp(j) + s
            if (v > best) { best = v; bj = j } // strict >, shortest first
          }
        }
        dp(i) = best; back(i) = bj
      }
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = L
      while (i > 0) { val j = back(i); out.prepend(w.substring(j, i)); i = j }
      out.toSeq
    }
    val segs = words.keys.map(w => w -> viterbi(w)).toMap
    val em = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { case (w, f) =>
      segs(w).foreach(p =>
        em.updateWith(p)(c => Some(c.getOrElse(0L) + f)))
    }
    (em.map { case (p, c) => p -> ((vocab(p), c)) }.toMap, segs)
  }

  private def trainOn(words: Map[String, Long]) = {
    val lw = words.toSeq.map { case (w, f) => ("xx", w, f) }
      .toDF("lang", "word", "wfl")
    UnigramTrain.trainWords(lw)
  }

  test("Spark trainer equals the literal reference on randomized corpora") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val words = (1 to 40).map { _ =>
        val len = 2 + rnd.nextInt(9)
        val w = (0 until len)
          .map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
        w -> (1L + rnd.nextInt(50))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val (scored, seg) = trainOn(words)
      val (refEm, refSegs) = reference(words)
      // segmentations match the reference DP exactly
      val gotSegs = seg.collect()
        .map(r => (r.getString(0), r.getSeq[String](2))).toMap
      assert(gotSegs.keySet === refSegs.keySet)
      gotSegs.foreach { case (w, ps) =>
        assert(ps === refSegs(w), s"trial $trial word $w")
        assert(ps.mkString === w, s"pieces must reconstruct $w")
      }
      // piece table: seed counts match; EM counts match; prune = unused
      val seedMap = scored.map(r => (r._1, r._2)).toMap
      refEm.foreach { case (p, (seedC, _)) =>
        assert(seedMap(p) === seedC, s"trial $trial seed count $p")
      }
      val emGot = seg.select(col("wf"), explode(col("pieces")).as("p"))
        .groupBy("p").agg(sum("wf")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(emGot === refEm.map { case (p, (_, c)) => p -> c },
        s"trial $trial EM counts")
      seg.unpersist()
    }
  }

  test("fixture invariants: coverage, prune, and fertility arithmetic") {
    val sf = TestSpark.sf
    val train = graft.SparkEntry.queries("unigram_train")(spark, sf)
      .collect()
    assert(train.nonEmpty)
    assert(train.forall(_.getLong(2) > 0), "pruned pieces must not appear")
    assert(train.exists(_.getString(0).length >= 2),
      "EM must keep at least one multi-char piece on the fixture")
    val fert = graft.SparkEntry.queries("unigram_fertility")(spark, sf)
      .collect()
    fert.foreach { r =>
      val (w, p, f) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(f === ((p * 20000 + w) / (2 * w)).toDouble / 10000,
        s"fertility rounding for ${r.getString(0)}")
      assert(f >= 1.0, "a word is at least one piece")
    }
  }
}
