package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{GraphOps, Multimodal, UnigramTrain}
import graft.sources.Tables

/** Round-16 scale probes (VERDICT r15 #8 — extend the SCALE.md evidence
  * to the r15 operator families; results recorded in SCALE.md):
  *
  * 1. `phash_incremental` under store ≫ delta: the daily-ingest claim is
  *    that work is DELTA-bucket-bounded — the store side contributes a
  *    linear scan of 8-byte hashes (banding) plus bucket-sized candidate
  *    rows, never a store×delta product. Store scaled 1× → 10× with a
  *    FIXED delta; candidate volume should grow ≈ linearly in store
  *    (bucket occupancy 4·|store|/65536 per delta band row) and wall
  *    should stay scan-dominated.
  *
  * 2. `unigram_train` Heaps sublinearity: the trainer's only
  *    corpus-proportional stage is the ONE (lang, word) frequency pass;
  *    everything after runs on the DISTINCT-word frame, which Heaps' law
  *    keeps sublinear (V ∝ N^β, β≈0.4–0.6 for natural text). Measured:
  *    token volume 10× (sf0.01 → sf0.1) vs distinct-word growth vs
  *    train wall.
  *
  * 3. `graph_sssp` frontier rounds vs diameter: BFS cost is
  *    rounds × per-round-floor, with rounds = seed-set eccentricity —
  *    NOT vertex count. Planted path graphs: (a) vertices 10×, seed
  *    spacing fixed → rounds flat; (b) vertices fixed, seed spacing
  *    10× → rounds 10×. Rounds observed as max(dist) in the output.
  *
  * Run: sbt "Test/runMain graft.Round16Probe"
  */
object Round16Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PROBE $name%-36s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }

    // ---- 1. phash_incremental: store 1x vs 10x, fixed delta ----------
    // store copies get a copy-unique blob PREFIX so every copy's segment
    // windows (hence its dHash) differ — a duplicated-blob store would
    // measure pathological identical-hash buckets, not scaling
    val assets0 = Multimodal.syntheticAssets(spark, "/root/testdata/sf0.1")
      .select(col("asset_id"), col("mime"),
        decode(col("blob"), "UTF-8").as("s"))
    def storeOf(mult: Int): DataFrame =
      (0 until mult).map { i =>
        assets0.select((col("asset_id") * 100 + i).as("asset_id"),
          col("mime"),
          encode(concat(lit(s"storecopy${i}x "), col("s")), "UTF-8")
            .as("blob"))
      }.reduce(_ unionByName _)
    val delta = assets0.filter(col("asset_id") % 5 === 0)
      .select((col("asset_id") * 100 + 99).as("asset_id"), col("mime"),
        encode(concat(lit("deltamark "), col("s")), "UTF-8").as("blob"))
      .localCheckpoint(true)
    println(s"PROBE delta assets = ${delta.count()}")
    val survByMult = (for (mult <- Seq(1, 10)) yield {
      val store = storeOf(mult).localCheckpoint(true)
      println(s"PROBE store assets (${mult}x) = ${store.count()}")
      val survivors = timed(s"phash_incremental store=${mult}x") {
        Multimodal.phashIncrementalAssets(store, delta, 3).count()
      }
      println(s"PROBE   survivors = $survivors")
      GraphOps.unpersistCheckpoint(store)
      survivors
    }).toSeq
    GraphOps.unpersistCheckpoint(delta)
    // the mutated copies share no 252-char prefix with any delta asset,
    // so the survivor set is decided by the 1x base alone — a store
    // scale-up that changed it would mean phantom candidates
    assert(survByMult.distinct.size == 1,
      s"survivors drifted with store size: $survByMult")

    // ---- 2. unigram_train: token volume 10x vs distinct words --------
    val wordCounts = scala.collection.mutable.Map[String, (Long, Long)]()
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val tokens = Tables.documents(spark, dir)
        .select(explode(split(graft.operators.TextOps.normText(col("text")),
          " ")).as("w"))
        .filter(col("w") =!= "").count()
      val lw = UnigramTrain.langWordCounts(spark, dir)
        .localCheckpoint(true)
      val words = lw.select(col("word")).distinct().count()
      println(f"PROBE $sf tokens=$tokens%,d distinct_words=$words%,d")
      val (scored, seg) = timed(s"unigram trainWords $sf") {
        UnigramTrain.trainWords(lw)
      }
      println(s"PROBE   vocab pieces = ${scored.size}")
      wordCounts(sf) = (tokens, words)
      GraphOps.unpersistCheckpoint(seg)
      GraphOps.unpersistCheckpoint(lw)
    }
    // Heaps sublinearity in its extreme form on this fixture: the
    // synthetic corpus SATURATES its vocabulary, so the distinct-word
    // frame (the only input every post-pass training stage sees) is
    // CONSTANT while token volume grows ~10x — natural text would give
    // V ∝ N^0.4..0.6, still sublinear
    val (t1, w1) = wordCounts("sf0.01"); val (t10, w10) = wordCounts("sf0.1")
    assert(t10 > 8 * t1, s"token volume did not scale: $t1 -> $t10")
    assert(w10 == w1,
      s"fixture vocab expected saturated: $w1 -> $w10")

    // ---- 3. graph_sssp: rounds track eccentricity, not vertex count --
    // planted path graph: edges i—i+1; seeds at multiples of `seedMod`,
    // so eccentricity ≈ seedMod/2 regardless of N
    def pathEdges(n: Long): DataFrame =
      spark.range(n - 1).select(col("id").as("u"), (col("id") + 1).as("v"),
        lit(2L).as("co")).localCheckpoint(true)
    val eccs = (for ((n, seedMod, cap) <- Seq((10000L, 17L, 12),
        (100000L, 17L, 12), (10000L, 170L, 120))) yield {
      val edges = pathEdges(n)
      val out = timed(s"graph_sssp n=$n seedMod=$seedMod") {
        GraphOps.ssspEnum(edges, seedMod, cap)
          .agg(count(lit(1)).as("n"), max(col("dist")).as("ecc")).head()
      }
      println(s"PROBE   reached=${out.getLong(0)} " +
        s"rounds(max dist)=${out.getInt(1)}")
      GraphOps.unpersistCheckpoint(edges)
      (n, seedMod, out.getLong(0), out.getInt(1))
    }).toSeq
    // rounds = seed-set eccentricity, NOT vertex count: 10x vertices at
    // the same seed spacing keep the same round count; 10x the spacing
    // multiplies rounds regardless of n
    assert(eccs(0)._4 == eccs(1)._4,
      s"rounds changed with vertex count: $eccs")
    assert(eccs(2)._4 > 10 * eccs(0)._4,
      s"rounds did not track seed spacing: $eccs")

    // ---- 4. wedge family (jaccard / clustcoef) at 1x/5x/25x orders --
    // the Round12c basket convention: ~5 items/order, pool = orders/25
    // so popular co-pairs repeat; the wedge join is bounded by the
    // co-count-floored EDGE graph (grows with the part pool, not the
    // basket count) — same scaling class as graph_triangles
    def baskets(nOrders: Long): DataFrame = {
      val pool = math.max(200L, nOrders / 25L)
      spark.range(nOrders * 5).select(
        (col("id") / 5).cast("long").as("ok"),
        (((col("id") * 2654435761L + (col("id") % 5) * 97L)
          % pool + pool) % pool).as("pk"))
    }
    for (n <- Seq(15000L, 75000L, 375000L)) {
      val edges = GraphOps.coPurchaseEdges(baskets(n), 2L)
      val ne = edges.count()
      val nj = timed(s"graph_jaccard orders=$n") {
        GraphOps.jaccardEnum(edges, 0.25).count()
      }
      val nc = timed(s"graph_clustcoef orders=$n") {
        GraphOps.clustcoefEnum(edges).count()
      }
      println(s"PROBE   edges=$ne jaccard_pairs=$nj cc_vertices=$nc")
      GraphOps.unpersistCheckpoint(edges)
    }
    spark.stop()
  }
}
