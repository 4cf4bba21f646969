package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SimSearch

/** Metadata-filtered ANN (`simsearch_filtered` / `simsearch_filtered_ivf`,
  * VERDICT r13 #1): the pre-filter order is exact over the qualifying
  * subset; the post-filter order (ANN top-k, then predicate) carries the
  * documented refill risk — qualifying neighbors ranked below the
  * unfiltered top-k are silently lost. These specs pin that recall
  * ordering on a PLANTED skewed-attribute corpus where the gap is
  * strict, plus the plan shape that makes pre-filter scale (attribute
  * as a hash-join key, not a post-hoc filter over a cross product).
  */
class FilteredSearchSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def topkSets(df: DataFrame): Map[Long, Set[Long]] =
    df.collect().groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("c_id")).toSet).toMap

  private def recallVs(truth: Map[Long, Set[Long]],
      got: Map[Long, Set[Long]]): Double = {
    val rs = truth.map { case (q, ids) =>
      if (ids.isEmpty) 1.0
      else ids.intersect(got.getOrElse(q, Set.empty)).size.toDouble / ids.size
    }
    rs.sum / rs.size
  }

  /** Skewed-attribute corpus: ONE query (id 0, label 1). Five label-0
    * decoys hug the query (cos ≈ 0.999 — tiny perturbations), while the
    * label-1 qualifying vectors sit further out (cos ≈ 0.8). The
    * unfiltered top-5 is therefore ALL decoys: post-filter keeps zero of
    * them and recall collapses; pre-filter ranks only label-1 rows and
    * is exact by construction. Deterministic (fixed seed), never flakes.
    */
  private lazy val skewed: DataFrame = {
    val rnd = new scala.util.Random(7)
    val q = Seq.fill(16)(rnd.nextFloat() * 2 - 1)
    val decoys = Seq.tabulate(5) { i =>
      (10L + i, q.updated(i, q(i) + 0.01f), 0)
    }
    // qualifying vectors: same direction blended with noise → cos well
    // below the decoys but clearly positive
    val qual = Seq.tabulate(8) { i =>
      val noise = Seq.fill(16)(rnd.nextFloat() * 2 - 1)
      (20L + i, q.zip(noise).map { case (a, b) => a * 0.8f + b * 0.35f }, 1)
    }
    // background mass, label 0, random directions
    val bg = Seq.tabulate(20) { i =>
      (40L + i, Seq.fill(16)(rnd.nextFloat() * 2 - 1), 0)
    }
    ((0L, q, 1) +: (decoys ++ qual ++ bg))
      .toDF("vec_id", "embedding", "label")
  }

  test("planted skew: pre-filter recall strictly beats post-filter at equal k") {
    val k = 5
    // ground truth = exact top-k over the qualifying (label-matching)
    // subset — what the pre-filter order computes BY CONSTRUCTION
    val pre = topkSets(SimSearch.filteredKnnOver(skewed, k, nQueries = 1))
    val post = topkSets(SimSearch.filteredPostOver(skewed, k, nQueries = 1))
    assert(pre(0L).size == k, s"query must have >= $k qualifying neighbors")
    assert(pre(0L).forall(_ >= 20L) && pre(0L).forall(_ < 40L),
      "pre-filter top-k must be the planted label-1 vectors")
    val preR = recallVs(pre, pre)
    val postR = recallVs(pre, post)
    assert(preR == 1.0)
    assert(postR < 1.0,
      s"skew must make post-filter lossy (got recall $postR)")
    assert(preR > postR,
      s"pre-filter recall $preR must strictly beat post-filter $postR")
    // here the decoys own the entire unfiltered top-5 → post keeps nothing
    assert(post.getOrElse(0L, Set.empty).isEmpty,
      "all unfiltered top-5 are label-0 decoys; post-filter must keep none")
  }

  test("fixture: post-filter recall <= pre-filter for every query; filtered IVF clears a recall floor") {
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf)
    val k = 5
    val pre = topkSets(SimSearch.filteredKnnOver(emb, k, nQueries = 10))
    val post = topkSets(SimSearch.filteredPostOver(emb, k, nQueries = 10))
    pre.foreach { case (q, truth) =>
      val p = post.getOrElse(q, Set.empty)
      // post-filter output is a subset of the qualifying set, and it can
      // never contain a qualifying vector the exact filtered top-k
      // ranked out only if that vector beat one of truth's — impossible:
      // both rank by the same (cos, id) key. So p ⊆ truth.
      assert(p.subsetOf(truth),
        s"post-filter q=$q returned non-top candidates ${p -- truth}")
    }
    val ivf = topkSets(SimSearch.simsearchFilteredIvf(spark, TestSpark.sf))
    val ivfR = recallVs(pre, ivf)
    assert(ivfR >= 0.5,
      s"filtered IVF mean recall@5 $ivfR below floor (nProbe=2)")
  }

  test("plan shape: the attribute predicate is a hash-join key, not a cross-product filter") {
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf)
    val plan = SimSearch.filteredKnnOver(emb, 5, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"pre-filter candidate generation must be a hash join on label:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "filtered search must never fall back to a cartesian product")
    // the IVF form compounds both prunes into one hash join keyed on
    // (cent_id, label)
    val ivfPlan = SimSearch.simsearchFilteredIvf(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    // the corpus-side candidate join must be hashed; the one nested-loop
    // join in the plan is the BOUNDED |queries|·C codebook cross join on
    // the query side (ivfQueryCells discipline), never a corpus product
    assert(ivfPlan.contains("BroadcastHashJoin"),
      s"filtered IVF probe must be a keyed equi-join:\n$ivfPlan")
    assert(!ivfPlan.contains("CartesianProduct"),
      "filtered IVF must never touch a corpus cartesian")
  }
}
