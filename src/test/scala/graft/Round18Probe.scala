package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{GraphOps, Multimodal, SimSearch}
import graft.sources.{LakeIO, Tables}

/** Round-18 scale probes (the established per-round obligation —
  * VERDICT r17 #6: extend SCALE.md evidence to the r17 operator
  * families; results recorded in SCALE.md):
  *
  * 1. `multimodal_audio_dedup` frames 10× under fixed assets: the
  *    Haitsma–Kalker transition fingerprint is per frame-PAIR, so a
  *    10× longer clip carries ~10× the sub-fingerprints — but both
  *    windows substring inside the asset's own row, the signature
  *    distinct carries (id, 8 bytes), and the band join stays
  *    bucket-bounded. Asserted: n_a equals the transition arithmetic
  *    (len−252)/100 at both lengths AND the planted re-encoded pair
  *    is found at both — clip length changes COST linearly, never
  *    the verdict.
  *
  * 2. `stream_index_append` 10× delta at a FIXED store: per-batch
  *    cost is the delta's own row-local encode + an append of
  *    |delta| × m code rows — asserted EXACTLY (appended rows =
  *    |delta| × m at both delta sizes) — and the store partition's
  *    files are byte-identical untouched after both ingests (same
  *    names, same mtimes): ingest never rewrites the store,
  *    so a 1000× store costs a streamed batch nothing extra.
  *
  * 3. `stream_cdf_apply` (the consumer) 10× TABLE at fixed churn: the
  *    captured feed a replica consumes is churn-sized, not
  *    table-sized — asserted exactly (the same 2·|updates| feed rows
  *    at 1× and 10× the table), so the per-batch fold ships only the
  *    delta at any table size; the replica rewrite is the documented
  *    parquet-native price.
  *
  * Run: sbt "Test/runMain graft.Round18Probe"
  */
object Round18Probe {
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
      println(f"PROBE $name%-44s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }

    // ---- 1. audio dedup: transitions 10x under fixed assets ----------
    def randText(seed: Long, n: Int): String = {
      val rnd = new scala.util.Random(seed)
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }
    for (len <- Seq(800, 8000)) {
      val base = randText(2000L + len, len)
      val reenc = base.updated(400, 'z').updated(401, 'z')
      val clips = ((1L, base) +: (2L, reenc) +:
        (3L to 40L).map(i => (i, randText(i, len))))
        .toDF("asset_id", "s")
        .select(col("asset_id"), lit("audio/wav").as("mime"),
          encode(col("s"), "UTF-8").as("blob"))
        .localCheckpoint(true)
      val rows = timed(s"audio_dedup len=$len (40 clips)") {
        Multimodal.audioDedupAssets(clips, 3).collect()
      }
      val expFrames = (len - 252) / 100
      println(s"PROBE   pairs=${rows.length} n_a=${rows.headOption
        .map(_.getLong(2))} expected_transitions=$expFrames")
      assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet
        .contains((1L, 2L)), s"planted pair lost at len=$len")
      val planted = rows.find(r =>
        r.getLong(0) == 1L && r.getLong(1) == 2L).get
      assert(planted.getLong(2) == expFrames.toLong,
        s"n_a=${planted.getLong(2)} != transition arithmetic $expFrames")
      GraphOps.unpersistCheckpoint(clips)
    }

    // ---- 2. index ingest: 10x delta at a FIXED, never-rewritten store
    val sf01 = "/root/testdata/sf0.01"
    val m = 4
    val emb = Tables.embeddings(spark, sf01)
      .select(col("vec_id"), col("embedding"))
    val store = emb.filter(col("vec_id") % 10 < 8)
    val (coarse, pqCb) = SimSearch.storeCodebooks(store)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r18_ingest").toString
    val index = s"$dir/index"
    SimSearch.encodeIvfPq(store, coarse, pqCb, m)
      .withColumn("ingest", lit(-1L))
      .write.partitionBy("ingest", "cent_id").parquet(index)
    def storeFiles(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$index/ingest=-1"))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified()).toMap
    }
    val storeBefore = storeFiles()
    val deltaA = emb.filter(col("vec_id") % 10 >= 8 && col("vec_id") < 50)
    val deltaB = emb.filter(col("vec_id") % 10 >= 8 && col("vec_id") >= 50)
    val (nA, nB) = (deltaA.count(), deltaB.count())
    val n0 = spark.read.parquet(index).count()
    timed(s"index ingest delta=$nA") {
      graft.streaming.Streams.ingestIndexBatch(
        deltaA, index, coarse, pqCb, m, batchId = 0L)
    }
    val n1 = spark.read.parquet(index).count()
    timed(s"index ingest delta=$nB (~10x)") {
      graft.streaming.Streams.ingestIndexBatch(
        deltaB, index, coarse, pqCb, m, batchId = 1L)
    }
    val n2 = spark.read.parquet(index).count()
    println(s"PROBE   store_rows=$n0 +batchA=${n1 - n0} (exp ${nA * m})" +
      s" +batchB=${n2 - n1} (exp ${nB * m})")
    assert(n1 - n0 == nA * m && n2 - n1 == nB * m,
      "per-batch appended rows must be exactly |delta| x m")
    assert(storeFiles() == storeBefore,
      "the store partition's files must be untouched by streamed ingest")
    assert(nB >= 8 * nA, s"delta sizes not ~10x apart: $nA vs $nB")

    // ---- 3. CDF consumer: feed is churn-sized, never table-sized -----
    def table(n: Long): DataFrame =
      spark.range(n).select(col("id").as("k"),
        (col("id") % 997).cast("double").as("x"))
    val feedSizes = for (n <- Seq(20000L, 200000L)) yield {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_r18_cdf_$n").toString
      val v0 = table(n)
      // fixed churn regardless of table size: update keys 0..99
      val v1 = v0.withColumn("x",
        when(col("k") < 100, col("x") + 1.0).otherwise(col("x")))
      LakeIO.saveVersionCdf(v0.repartition(8), root, Seq("k"))
      timed(s"saveVersionCdf table=$n churn=100") {
        LakeIO.saveVersionCdf(v1.repartition(8), root, Seq("k"))
      }
      val feed = LakeIO.capturedChanges(spark, root, 0, 1)
      val rows = feed.count()
      // the fold's remove-set is the churn keys, not the table
      val removed = feed.filter(
        col("_change_type").isin("delete", "update_preimage"))
        .select(col("k")).distinct().count()
      println(s"PROBE   table=$n feed_rows=$rows removed_keys=$removed")
      assert(removed == 100L, s"remove set must be churn-sized: $removed")
      rows
    }
    assert(feedSizes.distinct.size == 1 && feedSizes.head == 200L,
      s"captured feed must be churn-sized at every table size: $feedSizes")

    // ---- 4. betweenness: work tracks the PIVOT SAMPLE, not |V| -------
    // fixed 20,001-vertex path, depth cap 4; on a path every σ = 1, so
    // the total contribution rows are EXACTLY Σ_pairs (d_st − 1):
    //   seedMod=2: (S−1) diff-2 pairs ×1 + (S−2) diff-4 pairs ×3
    //   seedMod=4: (S4−1) diff-4 pairs ×3  (diff-8 exceeds the cap)
    def pathEdges(n: Long): DataFrame =
      spark.range(n).select(col("id").as("u"),
        (col("id") + 1).as("v")).localCheckpoint(true)
    val contribTotals = for (seedMod <- Seq(2L, 4L)) yield {
      val edges = pathEdges(20000L)
      val total = timed(s"graph_betweenness path=20001 seedMod=$seedMod") {
        GraphOps.betweennessEnum(edges, seedMod, maxDepth = 4)
          .agg(sum(col("n_pairs"))).head().getLong(0)
      }
      println(s"PROBE   contrib_rows=$total")
      GraphOps.unpersistCheckpoint(edges)
      total
    }
    val s2c = 20000L / 2 + 1   // seeds at mod 2
    val s4c = 20000L / 4 + 1   // seeds at mod 4
    assert(contribTotals(0) == (s2c - 1) + 3 * (s2c - 2),
      s"seedMod=2 contribs: ${contribTotals(0)}")
    assert(contribTotals(1) == 3 * (s4c - 1),
      s"seedMod=4 contribs: ${contribTotals(1)}")
    val bratio = contribTotals(0).toDouble / contribTotals(1)
    assert(bratio > 2.0 && bratio < 4.0,
      s"halving the pivot sample must cut contrib work ~8/3x: $bratio")

    spark.stop()
  }
}
