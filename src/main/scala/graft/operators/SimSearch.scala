package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Similarity search over embedding columns (SURVEY.md §2.K
  * `simsearch_knn`): brute-force cosine top-k as the exact baseline, and
  * an LSH-bucketed approximate variant as the 100 TB scale path.
  *
  * Vector math uses higher-order functions (`zip_with` + `aggregate`) —
  * codegen-friendly, no UDF serialization in the hot loop.
  */
object SimSearch {

  /** dot(a, b) — native codegen'd Catalyst expression (identical
    * arithmetic to the zip_with/aggregate lambda form, ~10× faster:
    * higher-order functions evaluate interpreted — SURVEY.md §7.5).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotCol(a, b)

  def l2norm(a: Column): Column =
    graft.functions.VectorExpressions.normCol(a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** `simsearch_knn` — exact brute-force top-k: for each of a small set
    * of query vectors, the k nearest corpus vectors by cosine.
    *
    * Scale shape: queries are broadcast (bounded set), the corpus side
    * streams — cost O(|corpus| · |queries|) with no corpus shuffle until
    * the final per-query top-k (TakeOrdered-sized). For large query sets
    * use `simsearchLsh` below.
    */
  def knnBruteForce(spark: SparkSession, sfDir: String, k: Int = 5,
      nQueries: Int = 10): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    // norms once per row, not per pair — the per-pair work is a single
    // zip_with/aggregate dot product (identical arithmetic to
    // dot/(‖a‖·‖b‖), so oracle-stable at 4dp rounding)
    val queries = emb.filter(col("vec_id") < nQueries.toLong)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        l2norm(col("embedding")).as("q_nrm"))
    val corpus = emb.select(col("vec_id").as("c_id"),
      col("embedding").as("c_emb"), l2norm(col("embedding")).as("c_nrm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("c_id").asc)
    corpus.crossJoin(broadcast(queries))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos_sim", round(
        dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("cos_sim"), col("rn"))
      .orderBy(col("q_id").asc, col("rn").asc)
  }

  /** `simsearch_lsh` — approximate NN via random-hyperplane LSH (SimHash
    * buckets): sign of the dot product against `nBits` fixed pseudo-random
    * hyperplanes forms a bucket id; candidates = same-bucket pairs only.
    *
    * Hyperplanes are derived from a deterministic integer hash (xxhash64
    * of (plane, dim)) so the operator is reproducible without a random
    * seed exchange. At 100 TB: bucketing is a single groupBy shuffle,
    * each bucket joins locally; recall tunes with nBits/nTables.
    */
  def lshBucket(emb: Column, nBits: Int): Column = {
    // hyperplane component h(p,d) in [-1,1): deterministic from indices
    def comp(p: Int, d: Column): Column =
      (pmod(xxhash64(lit(p), d), lit(2000000L)).cast("double") / 1000000.0) - 1.0
    val bits = (0 until nBits).map { p =>
      val s = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (x, i) => x.cast("double") * comp(p, i)),
        lit(0.0d), (acc, x) => acc + x)
      when(s >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  def simsearchLsh(spark: SparkSession, sfDir: String, k: Int = 5,
      nQueries: Int = 10, nBits: Int = 8): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .withColumn("bucket", lshBucket(col("embedding"), nBits))
    val queries = emb.filter(col("vec_id") < nQueries.toLong)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("bucket"))
    val corpus = emb.select(col("vec_id").as("c_id"),
      col("embedding").as("c_emb"), col("bucket"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("c_id").asc)
    corpus.join(broadcast(queries), "bucket")
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos_sim", round(cosine(col("q_emb"), col("c_emb")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("cos_sim"), col("rn"))
      .orderBy(col("q_id").asc, col("rn").asc)
  }

  /** `simsearch_ivf` — IVF (inverted-file) approximate NN: vectors are
    * assigned to their nearest centroid cell; queries probe only the
    * `nProbe` nearest cells. Centroids here are a deterministic stride
    * sample of the corpus (a real pipeline would k-means offline and
    * broadcast the codebook — the operator shape is identical).
    *
    * 100 TB shape: cell assignment is one broadcast join + per-row argmin
    * (no shuffle of the corpus); the search joins query-cells to corpus
    * cells on cell id — a keyed equi-join that prunes (nCells−nProbe)/
    * nCells of the corpus per query, vs the brute-force cross join.
    */
  def simsearchIvf(spark: SparkSession, sfDir: String, k: Int = 5,
      nQueries: Int = 10, centroidStride: Long = 127, nProbe: Int = 2): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = broadcast(emb
      .filter(col("vec_id") % centroidStride === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"),
        l2norm(col("embedding")).as("cent_nrm")))
    def nearestCells(side: DataFrame, idCol: String, embCol: String,
        nrmCol: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("cell_sim").desc, col("cent_id").asc)
      side.crossJoin(centroids)
        .withColumn("cell_sim",
          dot(col(embCol), col("cent_emb")) /
            (col(nrmCol) * col("cent_nrm")))
        .withColumn("cell_rn", row_number().over(w))
        .filter(col("cell_rn") <= keep)
        .drop("cent_emb", "cent_nrm", "cell_sim", "cell_rn")
    }
    val corpusCells = nearestCells(
      emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        l2norm(col("embedding")).as("c_nrm")),
      "c_id", "c_emb", "c_nrm", keep = 1)
    val queryCells = nearestCells(
      emb.filter(col("vec_id") < nQueries.toLong)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          l2norm(col("embedding")).as("q_nrm")),
      "q_id", "q_emb", "q_nrm", keep = nProbe)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("c_id").asc)
    corpusCells.join(broadcast(queryCells), "cent_id")
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos_sim", round(
        dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("cos_sim"), col("rn"))
      .orderBy(col("q_id").asc, col("rn").asc)
  }

  /** `expr_custom` — the custom-Catalyst-Expression surface (SURVEY.md
    * §2.J), exercised directly: per-vector L2 norm and self-dot via the
    * codegen'd FloatVecNorm/FloatVecDot kernels.
    */
  def exprCustom(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        round(l2norm(col("embedding")), 4).as("l2"),
        round(dot(col("embedding"), col("embedding")), 4).as("sq_norm"))
      .orderBy(col("vec_id").asc)

  /** `dedup_embedding` — embedding-cosine near-duplicate detection:
    * all pairs above a cosine threshold, via the same LSH bucketing so
    * the pair space never goes quadratic at scale (bucket-local joins).
    * For the oracle-declared variant we use exact pairs on the small
    * fixture: see SparkEntry (threshold keeps output bounded).
    */
  def dedupEmbeddingExact(spark: SparkSession, sfDir: String,
      threshold: Double = 0.95): DataFrame = {
    // norms once per side (2N array passes) instead of per pair (3N²)
    val a = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
        l2norm(col("embedding")).as("a_nrm"))
    val b = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
        l2norm(col("embedding")).as("b_nrm"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos_sim", round(
        dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")), 4))
      .filter(col("cos_sim") >= threshold)
      .select(col("a_id"), col("b_id"), col("cos_sim"))
      .orderBy(col("a_id").asc, col("b_id").asc)
  }
}
