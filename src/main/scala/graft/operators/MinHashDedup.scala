package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import TextOps.normText

/** Near-duplicate detection for text corpora (SURVEY.md §2.K
  * `dedup_minhash` + simhash + n-gram Jaccard): the standard
  * shingle → MinHash signature → LSH banding → candidate pairs →
  * exact-Jaccard verify pipeline used by large-scale training-data
  * dedup (e.g. the MinHashLSH literature; PAPERS.md).
  *
  * Own implementation rather than mllib's MinHashLSH estimator: fixed
  * integer hashing (xxhash64 seeded by permutation index) makes
  * signatures reproducible across runs and executors with no fitted
  * model to ship, and banding becomes a plain groupBy — the 100 TB
  * story is explicit (SURVEY.md §2.K Option B).
  *
  * Scale: signatures are computed row-local (no shuffle); banding
  * shuffles (band, bandHash) once; pair verification joins only
  * bucket-colliding docs — never the quadratic pair space.
  */
object MinHashDedup {

  /** Word k-shingles of the normalized text. */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(normText(text), " ")
    array_distinct(
      transform(sequence(lit(0), greatest(size(toks) - k, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** MinHash signature: for permutation p, min over shingles of
    * xxhash64(p, shingle). Returns array<long> of length nPerm.
    */
  def minhashSignature(sh: Column, nPerm: Int): Column =
    transform(sequence(lit(0), lit(nPerm - 1)),
      p => array_min(transform(sh, s => xxhash64(p, s))))

  /** Candidate pairs via LSH banding of the signature: docs sharing any
    * band hash collide. bands × rowsPerBand = nPerm.
    */
  def candidatePairs(docs: DataFrame, nPerm: Int, bands: Int): DataFrame = {
    val rowsPerBand = nPerm / bands
    val sig = docs
      .withColumn("sh", shingles(col("text"), 3))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), nPerm))
      .select(col("doc_id"), col("sh"), col("sig"))
    val banded = sig.select(
      col("doc_id"), col("sh"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))
            .as("bhash")))).as("bk"))
      .select(col("doc_id"), col("sh"), col("bk.band"), col("bk.bhash"))
    val l = banded.select(col("band"), col("bhash"),
      col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val r = banded.select(col("band"), col("bhash"),
      col("doc_id").as("b_id"), col("sh").as("b_sh"))
    l.join(r, Seq("band", "bhash"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_sh"), col("b_sh"))
      .distinct()
  }

  /** Exact Jaccard over shingle sets (the verify step). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** `dedup_minhash` — full pipeline: candidate pairs whose exact
    * shingle-Jaccard clears the threshold. Declared rows-only to the
    * driver (LSH banding isn't DuckDB-expressible); correctness is
    * property-tested in DedupSpec (planted near-dups found; estimate
    * within ε of exact Jaccard).
    */
  def dedupMinhash(spark: SparkSession, sfDir: String,
      nPerm: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    candidatePairs(docs, nPerm, bands)
      .withColumn("jaccard", round(jaccard(col("a_sh"), col("b_sh")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .orderBy(col("a_id").asc, col("b_id").asc)
  }

  /** `dedup_ngram_jaccard` — exact n-gram Jaccard similarity for a
    * bounded candidate set (here: all pairs within the same source,
    * keeping the pair space keyed and bounded). DuckDB-expressible →
    * oracle-declared.
    */
  def ngramJaccard(spark: SparkSession, sfDir: String,
      threshold: Double = 0.05): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("sh", shingles(col("text"), 2))
      .select(col("doc_id"), col("source"), col("sh"))
    val a = docs.select(col("source"), col("doc_id").as("a_id"),
      col("sh").as("a_sh"))
    val b = docs.select(col("source"), col("doc_id").as("b_id"),
      col("sh").as("b_sh"))
    a.join(b, Seq("source"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("jaccard", round(jaccard(col("a_sh"), col("b_sh")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("source"), col("a_id"), col("b_id"), col("jaccard"))
      .orderBy(col("source").asc, col("a_id").asc, col("b_id").asc)
  }

  /** `dedup_simhash` — 64-bit SimHash fingerprints: weighted majority
    * vote of shingle-hash bits. Near-dups = fingerprints within small
    * Hamming distance; here we emit per-doc fingerprints plus bucket
    * (top-16-bit prefix) so near-dup candidates collide — the classic
    * Charikar scheme, block-permuted at scale.
    */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    // hash each shingle ONCE, then vote per bit over the hash array
    val bitCols = (0 until 64).map { b =>
      // +1 vote if bit b of the shingle hash is set, else -1; sum>=0 → 1
      when(
        aggregate(col("shh"), lit(0L),
          (acc, h) => acc +
            when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
          >= 0L,
        shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    Tables.documents(spark, sfDir)
      .withColumn("sh", shingles(col("text"), 2))
      .filter(size(col("sh")) > 0)
      .withColumn("shh", transform(col("sh"), s => xxhash64(s)))
      .withColumn("simhash", bitCols.reduce(_ + _))
      .select(col("doc_id"),
        col("simhash"),
        shiftrightunsigned(col("simhash"), 48).as("bucket16"))
      .orderBy(col("doc_id").asc)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
