package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimSearch

/** `simsearch_index_persisted`: the index-as-artifact round trip must
  * serve the ivfpq values from the persisted parquet alone — corpus
  * embeddings never re-enter the serve plan, and the probed cells
  * prune the index scan's partitions.
  */
class IndexPersistSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("persisted index serves simsearch_ivfpq's values; the serve " +
      "plan reads the artifact, not the corpus embeddings") {
    val df = SimSearch.simsearchIndexPersisted(spark, sf)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    val want = SimSearch.simsearchIvfPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(got === want, "round trip must be value-lossless")
    assert(got.nonEmpty)

    val ep = df.queryExecution.executedPlan
    val scans = SpecUtil.collectPlan(ep) {
      case f: FileSourceScanExec => f
    }
    // the serve side reads the ARTIFACT
    val idx = scans.filter(_.metadata.get("Location")
      .exists(_.contains("simsearch_index_persisted")))
    assert(idx.nonEmpty, s"expected a persisted-index scan:\n$ep")
    // corpus embeddings never re-enter: every embeddings.parquet scan
    // left in the plan is QUERY-side (bounded by the pushed vec_id
    // predicate — the nQueries=10 query set and nothing more)
    scans.filterNot(idx.contains).foreach { f =>
      assert(f.metadata.get("PushedFilters")
        .exists(_.contains("LessThan(vec_id,10)")),
        s"non-index scan must be the bounded query side:\n$f")
    }
    // the cell probe prunes the index DIRECTORIES at runtime (dynamic
    // partition pruning off the broadcast probe join)
    assert(idx.exists(_.partitionFilters
      .exists(_.toString.contains("dynamicpruning"))),
      s"expected dynamic partition pruning on the index scan, got " +
        s"${idx.map(_.partitionFilters)}:\n$ep")
  }

  test("incremental index: delta append under yesterday's codebooks " +
      "equals the full-corpus encode (batch-associativity contract)") {
    val inc = SimSearch.simsearchIndexIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    // the full rebuild under the SAME pinned (store-side) codebooks:
    // ivfPqOver with store-derived codebooks over the whole corpus
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val store = emb.filter(org.apache.spark.sql.functions
      .col("vec_id") % 10 < 8)
    val full = SimSearch.ivfPqOver(emb,
        SimSearch.ivfCodebook(store, 127),
        SimSearch.ivfCodebook(store, 61).take(256),
        k = 5, nQueries = 10, m = 4, nProbe = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(inc === full,
      "append maintenance must equal a full rebuild under the pinned quantizers")
    assert(inc.nonEmpty)
    // non-vacuous: some delta vector (vec_id % 10 >= 8) surfaced as a
    // result candidate — the appended files are actually served
    assert(inc.exists(_._2 % 10 >= 8),
      "no delta vector ever surfaced — the append was never read")
  }

  test("index delete: tombstoned ids never surface; every non-deleted " +
      "ivfpq result survives; deletion is non-vacuous") {
    val del = SimSearch.simsearchIndexDelete(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(del.nonEmpty)
    // the mask is honored at serve time: no tombstoned candidate
    assert(del.forall(_._2 % 13 != 0),
      s"tombstoned id served: ${del.filter(_._2 % 13 == 0)}")
    // deletes only REMOVE candidates: the surviving ivfpq pairs are a
    // superset of the masked run's pairs at the same scores, and the
    // masked run backfills from the same cells (rank k still filled
    // where candidates remain)
    val full = SimSearch.simsearchIvfPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    val fullPairs = full.map(r => (r._1, r._2, r._3)).toSet
    val fullKept = full.filter(_._2 % 13 != 0).map(r => (r._1, r._2)).toSet
    val delPairs = del.map(r => (r._1, r._2)).toSet
    assert(fullKept.subsetOf(delPairs),
      s"masking dropped surviving results: ${fullKept -- delPairs}")
    // scores of common pairs are identical (mask changes membership,
    // never arithmetic)
    del.filter(r => fullKept.contains((r._1, r._2))).foreach { r =>
      assert(fullPairs.contains((r._1, r._2, r._3)),
        s"score drifted under deletion for ${(r._1, r._2)}")
    }
    // non-vacuous end-to-end: tombstone an id the unmasked run ACTUALLY
    // serves (delMod = that id, so vec_id % delMod == 0 hits it) and
    // prove it vanishes from the served top-k while ranks backfill
    val victim = full.map(_._2).max
    assert(victim > 10, s"victim $victim must exceed the query-id range")
    val masked = SimSearch.simsearchIndexDelete(spark, sf, delMod = victim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(masked.nonEmpty)
    assert(masked.forall(_._2 % victim != 0),
      s"victim $victim (or a multiple) still served")
    assert(full.exists(_._2 == victim) && !masked.exists(_._2 == victim),
      s"deleting served id $victim did not change the served set")
  }

  test("index compact: the compacted artifact serves exactly the " +
      "masked result with no mask join; tombstoned rows are physically gone") {
    val comp = SimSearch.simsearchIndexCompact(spark, sf)
    val got = comp.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    val want = SimSearch.simsearchIndexDelete(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(got === want,
      "compaction must serve exactly what the masked path served")
    assert(got.nonEmpty)
    // no mask join survives in the serve plan: compaction made the
    // deletes physical, so no left-anti remains
    val ep = comp.queryExecution.executedPlan.toString
    assert(!ep.contains("LeftAnti"),
      s"compacted serve still plans the tombstone anti-join:\n$ep")
    // physical row accounting: compacted = index − tombstoned code rows
    val scans = SpecUtil.collectPlan(comp.queryExecution.executedPlan) {
      case f: FileSourceScanExec => f
    }
    val root = scans.flatMap(_.metadata.get("Location"))
      .find(_.contains("simsearch_index_compact"))
      .map(_.replaceAll(".*\\[", "").replaceAll("/compacted.*", ""))
      .getOrElse(fail("no compacted scan in the serve plan"))
    val idx = spark.read.parquet(s"$root/index")
    val tomb = spark.read.parquet(s"$root/tombstones")
    val compRows = spark.read.parquet(s"$root/compacted")
    val masked = idx.join(tomb, Seq("c_id"), "left_anti")
    assert(compRows.count() === masked.count(),
      "compacted row count must equal index minus tombstoned")
    assert(compRows.count() < idx.count(),
      "compaction must physically drop rows (non-vacuous)")
  }

  test("index health: planted drift flips the rebuild trigger; " +
      "an undrifted corpus keeps it off") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 3 well-separated axis centroids; build corpus spreads evenly,
    // drifted corpus piles everything into centroid 0's cell
    def axisVec(axis: Int, n: Int = 8): Array[Float] =
      Array.tabulate(n)(i => if (i == axis) 1.0f else 0.01f * (i + 1))
    val cb = Array(
      (0L, axisVec(0), math.sqrt(axisVec(0).map(x => x * x.toDouble).sum)),
      (1L, axisVec(2), math.sqrt(axisVec(2).map(x => x * x.toDouble).sum)),
      (2L, axisVec(4), math.sqrt(axisVec(4).map(x => x * x.toDouble).sum)))
    val build = (0L until 30L).map(i =>
      (i, axisVec((i % 3).toInt * 2).toSeq))
    // undrifted: the new rows follow the build distribution
    val steady = build ++ (100L until 130L).map(i =>
      (i, axisVec((i % 3).toInt * 2).toSeq))
    val steadyDf = steady.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"))
    val ok = SimSearch.indexHealthOver(steadyDf, col("c_id") < 100,
      cb, tvRebuild = 0.05).collect().head
    assert(!ok.getBoolean(5), s"undrifted corpus flagged rebuild: $ok")
    // drifted: every new row lands in centroid 0's cell
    val drifted = build ++ (100L until 160L).map(i => (i, axisVec(0).toSeq))
    val driftedDf = drifted.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"))
    val bad = SimSearch.indexHealthOver(driftedDf, col("c_id") < 100,
      cb, tvRebuild = 0.05).collect().head
    assert(bad.getBoolean(5), s"planted drift not flagged: $bad")
    assert(bad.getDouble(4) > ok.getDouble(4),
      s"tv must rise under drift: $bad vs $ok")
    // counts are exact: build rows 30, steady now 60, drifted now 90
    assert(ok.getLong(1) === 30L && ok.getLong(2) === 60L)
    assert(bad.getLong(1) === 30L && bad.getLong(2) === 90L)
  }

  test("index rebuild: the planted |x| drift trips the trigger, the " +
      "re-learned codebook halves the hot cell, recall stays in band") {
    val rows = SimSearch.simsearchIndexRebuild(spark, sf).collect()
    val byIdx = rows.groupBy(_.getString(0))
    assert(byIdx.keySet === Set("old", "rebuilt"))
    // the health verdict fired (tv over threshold) on every row
    assert(rows.forall(_.getBoolean(8)), "rebuild flag must be true")
    assert(rows.forall(_.getDouble(7) >= 0.05), "tv must cross 0.05")
    def one(idx: String, field: Int): Long = {
      val vs = byIdx(idx).map(_.getLong(field)).distinct
      assert(vs.length === 1, s"$idx field $field not constant: ${vs.toSeq}")
      vs.head
    }
    // the rebuild doubles the cells and shrinks the hot cell — the
    // serve-cost deliverable of a reindex
    assert(one("rebuilt", 4) === 2 * one("old", 4),
      "stride over the doubled corpus has 2x the cells")
    assert(one("rebuilt", 5) < one("old", 5),
      s"hot cell must shrink: ${one("rebuilt", 5)} vs ${one("old", 5)}")
    // recall band: both serve real neighbors (chance level for nProbe=2
    // is ~2/n_cells; the 0.25 ann_recall floor holds for both)
    def mean(idx: String): Double =
      byIdx(idx).map(_.getDouble(6)).distinct.head
    assert(mean("old") >= 0.25 && mean("rebuilt") >= 0.25,
      s"mean recall floor: old=${mean("old")} rebuilt=${mean("rebuilt")}")
    // 20 judged queries per index, hits <= k
    assert(byIdx("old").length === 20 && byIdx("rebuilt").length === 20)
    assert(rows.forall(_.getLong(2) <= 5L))
  }

  test("rebuild tuning: the swept nProbe recovers the old recall at " +
      "LOWER scan cost (recall per candidate is what the rebuild bought)") {
    // (idx, n_probe, sum_hits, mean_recall, candidates_scanned, chosen)
    val rows = SimSearch.simsearchIndexRebuildTuned(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getBoolean(5)))
    val old = rows.filter(_._1 == "old")
    assert(old.length === 1 && old.head._2 === 2,
      "exactly one old row at the original nProbe=2")
    val (oldHits, oldScan) = (old.head._3, old.head._5)
    val swept = rows.filter(_._1 == "rebuilt").sortBy(_._2)
    assert(swept.map(_._2).toSeq === (1 to 6),
      "the sweep declares every setting 1..6")
    // hits and scan cost are monotone in nProbe (more cells probed can
    // only add candidates, and top-k over a superset can't lose hits
    // it already had... hits CAN drop when a closer-but-wrong candidate
    // displaces a hit — so pin monotone scan, directional hits)
    assert(swept.map(_._5).toSeq === swept.map(_._5).sorted,
      "candidates_scanned must be monotone in nProbe")
    // exactly one chosen setting, and it's the SMALLEST recovering one
    val chosen = swept.filter(_._6)
    assert(chosen.length === 1, s"one chosen setting: $chosen")
    val c = chosen.head
    assert(c._3 >= oldHits,
      s"chosen recall must recover the old index's: ${c._3} vs $oldHits")
    assert(swept.filter(_._2 < c._2).forall(_._3 < oldHits),
      "no smaller setting already recovers (minimality)")
    // THE deliverable: recall recovered at comparable-or-lower scan
    // cost — the rebalanced cells are smaller, so the extra probes
    // don't blow the candidate budget. At sf0.01 (the oracle-gated
    // fixture) the chosen setting scans STRICTLY fewer candidates
    // (8776 vs 10821 = 0.81×); the tiny spec fixture's two-cell
    // codebook can land within noise of parity, so the spec pins the
    // ≤1.05× band rather than strict improvement.
    assert(c._5 <= (oldScan * 1.05).toLong,
      s"recovered recall must not blow the scan budget: " +
        s"${c._5} vs $oldScan")
  }
  test("simsearch_graph: the neighbor-graph build is banded-LSH keyed " +
      "joins, never a corpus cross join; degree is bounded; the walk " +
      "is sub-linear and non-vacuous") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val e = emb.withColumn("nrm",
        graft.functions.VectorExpressions.normCol(col("embedding")))
      .withColumn("bkt", SimSearch.lshBucket(col("embedding"), 8))
    val edges = SimSearch.neighborGraphEdges(e, SimSearch.GraphDegree)
    edges.collect()
    val p = edges.queryExecution.executedPlan.toString
    // the no-cartesian pin: construction must stay keyed band joins —
    // an all-pairs build would be quadratic in the corpus at 100 TB
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"graph build must not plan a product join:\n$p")
    // bounded degree, the artifact-size contract
    val maxDeg = edges.groupBy(col("src")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxDeg <= SimSearch.GraphDegree, s"degree overflow: $maxDeg")
    // serve: scanned strictly sub-linear per query, recall non-vacuous
    val out = SimSearch.simsearchGraph(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    val n = emb.count()
    val g = out.filter(_._1 == "graph")
    assert(g.nonEmpty)
    assert(g.forall(_._5 < n - 1),
      s"graph walk scanned the whole corpus — not an index: " +
        s"${g.map(_._5).toSeq} vs n=$n")
    assert(g.map(_._3).sum > 0, "zero hits across every query — vacuous")
    // the IVF twin rides the same exact-KNN judge in the same artifact
    assert(out.count(_._1 == "ivf") === g.length)
  }
  test("simsearch_graph_incremental: delta ingest (reverse link + " +
      "re-prune) reproduces the BATCH graph edge-for-edge, and ingest " +
      "candidates are delta-band-bounded") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val e = emb.withColumn("nrm",
        graft.functions.VectorExpressions.normCol(col("embedding")))
      .withColumn("bkt", SimSearch.lshBucket(col("embedding"), 8))
    def edgeSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val incr = edgeSet(SimSearch.incrementalGraphEdges(e, SimSearch.GraphDegree))
    val batch = edgeSet(SimSearch.neighborGraphEdges(e, SimSearch.GraphDegree))
    // the family's batch-associativity contract, EXACT for the graph
    // tier: any global top-degree survivor among store mates is
    // already in the store's own top-degree (top-k merge), so
    // maintenance == rebuild — which is also why the declared query's
    // oracle is the batch serve
    assert(incr === batch,
      s"incremental maintenance diverged from the rebuild: " +
        s"only-incr=${(incr -- batch).take(5)} " +
        s"only-batch=${(batch -- incr).take(5)}")
    assert(incr.nonEmpty)
    // non-vacuous: the delta actually re-wired some STORE node (a
    // reverse link won a prune) — without reverse linking this fails
    val storeOnly = edgeSet(SimSearch.neighborGraphEdges(
      e.filter(col("vec_id") % 10 < 8), SimSearch.GraphDegree))
    assert((batch -- storeOnly).exists { case (s2, d2) =>
      s2 % 10 < 8 && d2 % 10 >= 8
    }, "no store node ever adopted a delta neighbor — reverse linking untested")
  }
  test("simsearch_graph_delete: the mask is emit-only — the walk " +
      "still routes through tombstones (scanned unchanged vs the " +
      "undeleted serve); the tombstone set is non-vacuous (no-leak " +
      "itself is oracle-gated: dsv/exd filter, hash-compared)") {
    val del = SimSearch.simsearchGraphDelete(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(del.nonEmpty)
    // masked-at-emit: the walk's scan cost is IDENTICAL to the
    // undeleted graph serve (same visited set — waypoints kept)
    val full = SimSearch.simsearchGraph(spark, sf).collect()
      .filter(_.getString(0) == "graph")
      .map(r => (r.getLong(1), r.getLong(4))).toMap
    del.foreach { case (q, _, scanned) =>
      assert(scanned === full(q),
        s"q=$q: delete changed the walk itself ($scanned vs ${full(q)})")
    }
    // and some result actually changed: the fixture plants enough
    // tombstones that at least one query's exact top-5 contains one
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf)
    assert(emb.filter(pmod(col("vec_id"), lit(17)) === 3).count() > 0,
      "no tombstoned vectors in the fixture — vacuous")
  }
  test("simsearch_graph_persisted: the artifact round trip is " +
      "value-lossless — serve-from-store rows equal the batch graph " +
      "serve exactly") {
    val store = SimSearch.simsearchGraphPersisted(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSeq
    val batch = SimSearch.simsearchGraph(spark, sf).collect()
      .filter(_.getString(0) == "graph")
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSeq
    assert(store === batch, "artifact serve diverged from the build")
    assert(store.nonEmpty)
  }
}
