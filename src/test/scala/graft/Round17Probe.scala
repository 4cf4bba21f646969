package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{GraphOps, Multimodal, WordpieceTrain}
import graft.sources.Tables

/** Round-17 scale probes (VERDICT r16 #6 — extend the SCALE.md evidence
  * to the r16/r17 operator families; results recorded in SCALE.md):
  *
  * 1. `multimodal_video_dedup` frames 10× under fixed assets: the
  *    signature is per-frame, so a 10× longer clip carries ~10× the
  *    sub-fingerprints — but they explode INSIDE the asset row, the
  *    signature distinct carries (id, 8 bytes), and the band join
  *    stays bucket-bounded. Asserted: the declared n_a equals the
  *    frame arithmetic ((len−252)/100+1) at both lengths (frames grow
  *    exactly linearly in clip length) and the planted re-encoded
  *    pair is found at both lengths — clip length changes COST
  *    linearly, never the verdict.
  *
  * 2. `wordpiece_train` distinct-word frame under 10× tokens (the
  *    unigram Heaps row's sibling): the trainer's only
  *    corpus-proportional stage is the ONE word-count pass; all k
  *    merge iterations run on the DISTINCT-word frame. The fixture
  *    vocabulary saturates, so tokens grow ~10× while the word frame
  *    is CONSTANT — natural text would give V ∝ N^0.4..0.6, still
  *    sublinear.
  *
  * 3. `graph_kcore` pinned sweeps vs fixpoint under ~10×/25× edges:
  *    peeling is monotone, so the pinned 4 sweeps equal the true
  *    fixpoint (sweep-5 equality) at EVERY graph size — the
  *    convergence guarantee is structural, not size-dependent; wall
  *    scales with the edge frame, not the sweep count.
  *
  * 4. `graph_closeness` state is seed-sample-bounded: settled
  *    (vertex, seed) pairs on a fixed path graph scale ∝ 1/seedMod —
  *    10× sparser seeds ⇒ ~10× less state at the same |V|, which is
  *    exactly why sampled-seed closeness is the form that scales.
  *
  * Run: sbt "Test/runMain graft.Round17Probe"
  */
object Round17Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROBE $name%-40s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }

    // ---- 1. video dedup: frames 10x under fixed assets ---------------
    def randText(seed: Long, n: Int): String = {
      val rnd = new scala.util.Random(seed)
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }
    for (len <- Seq(800, 8000)) {
      val base = randText(1000L + len, len)
      val reenc = base.updated(400, 'z').updated(401, 'z')
      val clips = ((1L, base) +: (2L, reenc) +:
        (3L to 40L).map(i => (i, randText(i, len))))
        .toDF("asset_id", "s")
        .select(col("asset_id"), lit("video/mp4").as("mime"),
          encode(col("s"), "UTF-8").as("blob"))
        .localCheckpoint(true)
      val rows = timed(s"video_dedup len=$len (40 clips)") {
        Multimodal.videoDedupAssets(clips, 3).collect()
      }
      val expFrames = (len - 252) / 100 + 1
      println(s"PROBE   pairs=${rows.length} n_a=${rows.headOption
        .map(_.getLong(2))} expected_frames=$expFrames")
      assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet
        .contains((1L, 2L)), s"planted pair lost at len=$len")
      val planted = rows.find(r =>
        r.getLong(0) == 1L && r.getLong(1) == 2L).get
      assert(planted.getLong(2) == expFrames.toLong,
        s"n_a=${planted.getLong(2)} != frame arithmetic $expFrames")
      GraphOps.unpersistCheckpoint(clips)
    }

    // ---- 2. wordpiece_train: 10x tokens vs the distinct-word frame ---
    val wordCounts = scala.collection.mutable.Map[String, (Long, Long)]()
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val tokens = Tables.documents(spark, dir)
        .select(explode(split(
          graft.operators.TextOps.normText(col("text")), " ")).as("w"))
        .filter(col("w") =!= "").count()
      val words = WordpieceTrain.wordCounts(spark, dir)
        .localCheckpoint(true)
      val nWords = words.count()
      println(f"PROBE $sf tokens=$tokens%,d distinct_words=$nWords%,d")
      val (merges, st) = timed(s"wordpiece trainWords $sf") {
        WordpieceTrain.trainWords(words, 6)
      }
      println(s"PROBE   merges=${merges.size}")
      wordCounts(sf) = (tokens, nWords)
      GraphOps.unpersistCheckpoint(st)
      GraphOps.unpersistCheckpoint(words)
    }
    val (t1, w1) = wordCounts("sf0.01")
    val (t10, w10) = wordCounts("sf0.1")
    assert(t10 > 8 * t1, s"token volume did not scale: $t1 -> $t10")
    assert(w10 == w1, s"fixture vocab expected saturated: $w1 -> $w10")

    // ---- 3. kcore: pinned sweeps = fixpoint at every size ------------
    // the Round16 basket convention: ~5 items/order, pool = orders/25
    def baskets(nOrders: Long): DataFrame = {
      val pool = math.max(200L, nOrders / 25L)
      spark.range(nOrders * 5).select(
        (col("id") / 5).cast("long").as("ok"),
        (((col("id") * 2654435761L + (col("id") % 5) * 97L)
          % pool + pool) % pool).as("pk"))
    }
    for (n <- Seq(15000L, 150000L, 375000L)) {
      val edges = GraphOps.coPurchaseEdges(baskets(n), 2L)
      val ne = edges.count()
      val c4 = timed(s"graph_kcore sweeps=4 orders=$n") {
        GraphOps.kcoreEnum(edges, k = 3, sweeps = 4)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val c5 = GraphOps.kcoreEnum(edges, k = 3, sweeps = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"PROBE   edges=$ne core_vertices=${c4.size}")
      assert(c4 == c5,
        s"pinned 4 sweeps not the fixpoint at orders=$n")
      GraphOps.unpersistCheckpoint(edges)
    }

    // ---- 4. closeness: state tracks the seed sample, not |V| ---------
    def pathEdges(n: Long): DataFrame =
      spark.range(n - 1).select(col("id").as("u"),
        (col("id") + 1).as("v")).localCheckpoint(true)
    val pairTotals = (for (seedMod <- Seq(17L, 170L)) yield {
      val edges = pathEdges(20000L)
      val agg = timed(s"graph_closeness n=20000 seedMod=$seedMod") {
        GraphOps.closenessEnum(edges, seedMod, maxDepth = 12)
          .agg(count(lit(1)).as("verts"),
            sum(col("n_seeds")).as("pairs")).head()
      }
      println(s"PROBE   vertices=${agg.getLong(0)} " +
        s"settled_pairs=${agg.getLong(1)}")
      GraphOps.unpersistCheckpoint(edges)
      agg.getLong(1)
    }).toSeq
    val ratio = pairTotals(0).toDouble / pairTotals(1)
    assert(ratio > 7.0 && ratio < 13.0,
      s"settled pairs must scale ~1/seedMod: $pairTotals ratio=$ratio")

    spark.stop()
  }
}
