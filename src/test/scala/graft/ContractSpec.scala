package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** Driver-contract invariants: key alignment between `queries` and
  * `oracleSql`, and the t1 smoke (entry returns rows on sf0.001).
  *
  * Every plan walk COLLECTS per-query failures and asserts the full
  * list empty (VERDICT r9 #3): one query that fails analysis must not
  * abort the walk and silently disarm the product-join / driver-funnel
  * / unkeyed-window / array-output guards for the other 200+ declared
  * queries — which is exactly what happened in round 9 when the NTZ
  * fixture flip broke 4 queries and took all five guards down with
  * them.
  */
class ContractSpec extends AnyFunSuite {
  val spark = TestSpark.spark

  /** Run `check` over every query in `qs`, turning thrown analysis
    * errors into recorded failures instead of aborting the walk;
    * `check` returns Some(message) to flag a query. Returns the full
    * failure list (exposed for the meta-test below).
    */
  private[graft] def walkFailures(
      qs: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame],
      check: (String, DataFrame) => Option[String]): Seq[String] =
    qs.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try check(name, fn(spark, TestSpark.sf)).map(m => s"$name: $m")
      catch {
        case e: Throwable =>
          Some(s"$name: threw ${e.toString.linesIterator.next()}")
      }
    }

  /** Every declared query's frame, built ONCE per suite run and shared
    * by all the walk tests below: construction is analysis-only for
    * batch queries, but the round-11 streaming shadows
    * (stream_watermark_late_ok / stream_sink_ok) EXECUTE multi-second
    * harnesses at construction time, so per-walk rebuilding re-ran
    * them once per guard. Failures are recorded, not thrown, so the
    * r9 walk-disarming regression shape stays covered.
    */
  private lazy val built: Seq[(String, Either[Throwable, DataFrame])] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> (try Right(fn(spark, TestSpark.sf))
      catch { case e: Throwable => Left(e) })
    }

  private def walk(check: (String, DataFrame) => Option[String]): Unit = {
    val failures = built.flatMap {
      case (name, Left(e)) =>
        Some(s"$name: threw ${e.toString.linesIterator.next()}")
      case (name, Right(df)) =>
        (try check(name, df)
        catch {
          case e: Throwable =>
            Some(s"threw ${e.toString.linesIterator.next()}")
        }).map(m => s"$name: $m")
    }
    assert(failures.isEmpty,
      s"${failures.size} queries failed the walk:\n${failures.mkString("\n")}")
  }

  test("a broken query cannot disarm the walk for the others (r9 regression shape)") {
    // Round 9's fixture flip broke 4 queries and the old fail-fast walks
    // aborted on the first, checking NONE of the remaining 213. The walk
    // must instead record the broken query AND still evaluate the rest.
    val broken: (org.apache.spark.sql.SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("planted analysis failure")
    var checkedHealthy = false
    val fails = walkFailures(
      Map("aa_planted_broken" -> broken,
        "scan_parquet" -> SparkEntry.queries("scan_parquet")),
      { (name, _) => if (name == "scan_parquet") checkedHealthy = true; None })
    assert(fails.size === 1 && fails.head.startsWith("aa_planted_broken"),
      s"expected exactly the planted failure, got: $fails")
    assert(checkedHealthy,
      "the healthy query must still be checked after the broken one")
  }

  test("every oracleSql key has a queries implementation") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys with no query impl: $orphans")
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query analyzes (schema resolvable)") {
    // analysis only — execution is the driver's Verify pass
    walk { (_, df) =>
      if (df.schema.fields.nonEmpty) None else Some("produced empty schema")
    }
  }

  test("no declared query plans a driver-side funnel (SURVEY §7.6)") {
    // A distributed operator must not pull the dataset through the
    // driver: no CollectLimit / toLocalIterator shape in any optimized
    // plan. (Verify's coalesce(1) is the driver-mandated dump format and
    // lives outside the query definitions.)
    walk { (_, df) =>
      val plan = df.queryExecution.optimizedPlan.toString
      // `preview`-style bounded limits are fine; whole-table collects are
      // what the executed plan would show as CollectLimit over all rows —
      // also reject obvious local relations materialized from collects
      if (plan.contains("CollectLimit")) Some("funnels through the driver")
      else if (plan.contains("toLocalIterator")) Some("iterates locally")
      else None
    }
  }

  test("no declared query plans a product join (VERDICT r2 #3)") {
    // A CartesianProduct / BroadcastNestedLoopJoin is O(|L|·|R|) pair
    // work — the scale-killer that made round 2's exact dedup_embedding
    // weak. Every declared plan must join keyed, except:
    //   join_cross     — the operator IS a (guarded, 25×5) cross join
    //   simsearch_knn  — corpus × broadcast BOUNDED query set (documented
    //                    O(|corpus|·|queries|) baseline; the scale paths
    //                    are simsearch_lsh / simsearch_ivf)
    //   text_tfidf     — corpus × broadcast ONE-ROW global doc count (the
    //                    standard scalar-attach shape; O(|corpus|·1))
    //   agg_histogram  — corpus × broadcast ONE-ROW min/max bounds (same
    //                    scalar-attach shape)
    //   dq_freshness   — SERIES-SIZED rollup × broadcast ONE-ROW global
    //                    max (both sides bounded; the same scalar
    //                    attach — the lit-key equi-join folds to BNLJ)
    //   ann_recall     — scores the approximate searchers AGAINST the
    //                    exact KNN baseline, so it necessarily contains
    //                    simsearch_knn's documented corpus × bounded
    //                    query-set product; everything downstream of the
    //                    three searches is report-sized and keyed
    //   stream_watermark_late_ok — window rows × broadcast ONE-ROW
    //                    late-drop cardinality (the same scalar-attach
    //                    shape as text_tfidf/agg_histogram)
    //   lake_merge_branch — merged rows × broadcast ONE-ROW conflict
    //                    count (the same scalar-attach shape); the
    //                    merge itself is two keyed full-outer joins
    //   simsearch_hybrid — its dense side IS simsearch_knn's documented
    //                    corpus × bounded-query product, and its BM25
    //                    side attaches the ONE-ROW (n_docs, avgdl)
    //                    stats (both shapes already allowed above);
    //                    fusion itself is a keyed full-outer join of
    //                    two report-sized rank lists
    //   simsearch_hybrid_lsh — dense side is the KEYED lsh bucket join;
    //                    only the ONE-ROW (n_docs, avgdl) scalar attach
    //                    remains as a product shape
    //   simsearch_hybrid_ivf — dense side is the KEYED ivf cell-probe
    //                    join (inlined codebook, no corpus product);
    //                    same ONE-ROW stats scalar attach as _lsh
    //   simsearch_pq / simsearch_pq_rotated / simsearch_opq_pca /
    //   simsearch_ivfpq /
    //   simsearch_ivfpq_residual /
    //   simsearch_rerank / simsearch_ivf — the PQ lookup
    //                    table and the query→probe-cell assignment are
    //                    bounded-queries × broadcast codebook rows
    //                    (both sides bounded by construction; the
    //                    CORPUS side joins keyed on (s, code) / cent_id
    //                    and never products; the residual form's LUT
    //                    and coarse-dot sides are bounded local
    //                    relations computed on the driver)
    //   ngram_pmi        — VOCAB-sized surviving-pair stream × broadcast
    //                    ONE-ROW (n1, n2) totals (the text_tfidf
    //                    scalar-attach shape; corpus never products)
    //   graph_pagerank   — ONE-ROW collected edge aggregate × ONE-ROW
    //                    node list feeding the in-task solve (1×1; the
    //                    corpus-sized work is all keyed upstream)
    //   graph_pagerank_dist — per-iteration ONE-ROW dangling-mass and
    //                    ONE-ROW node-count scalar attaches (|nodes|×1,
    //                    graph-sized); the corpus-sized edge aggregation
    //                    is keyed and cached once
    //   simsearch_filtered_ivf / simsearch_ivf_kmeans — the SAME
    //                    bounded query→probe-cell assignment as
    //                    simsearch_ivf (nQueries × broadcast codebook
    //                    rows); the corpus side joins keyed on
    //                    (cent_id, label) / cent_id and never products
    //   simsearch_range — knn's documented corpus × broadcast BOUNDED
    //                    query-set product, minus the rank window (the
    //                    radius test is row-local); the scale path is
    //                    simsearch_range_ivf
    //   simsearch_range_ivf — only the bounded query→probe-cell
    //                    assignment products (simsearch_ivf's shape);
    //                    the corpus joins keyed on cent_id
    //   simsearch_index_persisted / simsearch_index_incremental /
    //   simsearch_index_delete / simsearch_index_compact —
    //                    simsearch_ivfpq's bounded LUT and probe-cell
    //                    products on the QUERY side; the index scan
    //                    joins keyed on cent_id with dynamic partition
    //                    pruning (IndexPersistSpec); the delete form
    //                    adds only a KEYED c_id anti-join for the
    //                    tombstone mask, never a product; the compact
    //                    form's rewrite pass is the same keyed
    //                    anti-join and its serve has no mask join
    //   stream_index_append_ok — serves through the SAME
    //                    simsearch_index_persisted read path (bounded
    //                    LUT + probe-cell products on the query side;
    //                    the streamed artifact joins keyed on cent_id)
    //   simsearch_index_rebuild — ann_recall's documented judge shape
    //                    (exact-KNN ground truth = corpus × broadcast
    //                    BOUNDED 20-query set) + simsearch_ivf's
    //                    bounded query→probe-cell products for BOTH
    //                    codebooks + ONE-ROW health/balance scalar
    //                    attaches; both index serves join keyed on
    //                    cent_id, and the corpus never self-products
    //   simsearch_index_rebuild_tuned — the same rebuild shapes (exact
    //                    KNN judge, bounded query→cell products) + a
    //                    ONE-ROW old-hits scalar attach gating the
    //                    probe choice; the sweep itself is ONE keyed
    //                    cent_id join exploded to ≤6 probe levels
    //   simsearch_graph — the same exact-KNN judge (corpus × broadcast
    //                    BOUNDED 10-query set) + the bounded
    //                    query→entry-point product; the graph BUILD is
    //                    keyed band self-joins + a per-src window and
    //                    the beam hops join keyed on src
    //                    (IndexPersistSpec pins the build plan)
    val allowProduct =
      Set("join_cross", "simsearch_knn", "text_tfidf", "agg_histogram",
        "simsearch_graph", "simsearch_graph_incremental",
        "simsearch_graph_delete", "simsearch_graph_filtered",
        "simsearch_graph_persisted",
        "dq_freshness",
        "ann_recall", "stream_watermark_late_ok", "lake_merge_branch",
        "simsearch_hybrid",
        "simsearch_hybrid_lsh", "simsearch_hybrid_ivf", "simsearch_pq",
        "simsearch_ivfpq", "simsearch_ivfpq_residual", "simsearch_ivf",
        "simsearch_rerank", "simsearch_pq_rotated", "simsearch_opq_pca",
        "simsearch_filtered_ivf", "simsearch_ivf_kmeans",
        "simsearch_range", "simsearch_range_ivf",
        "simsearch_index_persisted", "simsearch_index_incremental",
        "simsearch_index_delete", "simsearch_index_compact",
        "simsearch_index_rebuild", "simsearch_index_rebuild_tuned",
        "stream_index_append_ok",
        "ngram_pmi", "graph_pagerank", "graph_pagerank_dist")
    walk { (name, df) =>
      if (allowProduct(name)) None
      else {
        val plan = df.queryExecution.sparkPlan.toString
        Seq("CartesianProduct", "BroadcastNestedLoopJoin")
          .find(plan.contains)
          .map(bad => s"plans a product join ($bad)")
      }
    }
  }

  test("no declared query plans an un-keyed window (SCALE.md invariant #2)") {
    // A Window with an empty partitionSpec funnels every row through ONE
    // task for the sort — the quiet single-node bottleneck. Global
    // ordering in declared queries must come from the final orderBy
    // (range-partitioned) or TakeOrderedAndProject, never a global
    // window.
    walk { (_, df) =>
      val unkeyed = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      if (unkeyed.isEmpty) None else Some("plans an un-keyed Window")
    }
  }

  test("no declared query outputs an array/map column (driver comparator contract)") {
    // The driver sorts result rows by EVERY column before hashing —
    // collection-typed outputs are unhashable there and turned 5 queries
    // into ERRs in round 1. Library APIs may return arrays; DECLARED
    // query outputs must serialize them.
    import org.apache.spark.sql.types.{ArrayType, MapType}
    walk { (_, df) =>
      val bad = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType]
          || f.dataType.isInstanceOf[MapType] => f.name
      }
      if (bad.isEmpty) None
      else Some(s"outputs collection columns ${bad.mkString(",")} — " +
        "serialize with array_join/to_json before declaring")
    }
  }
}
