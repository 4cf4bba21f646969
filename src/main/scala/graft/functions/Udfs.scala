package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** UDF / UDAF / UDTF surface (SURVEY.md §2.J).
  *
  * Policy: built-in functions first (codegen'd); UDFs only where the
  * logic genuinely isn't expressible — and even then deterministic, so
  * Catalyst may still push/reorder around them.
  */
object Udfs {

  /** `udf_scalar` — deterministic text normalizer as a registered scalar
    * UDF (lowercase + collapse whitespace + strip punctuation edges).
    * Deliberately NOT marked nondeterministic: Catalyst may collapse /
    * reorder it.
    */
  val normalizeText: String => String = { s =>
    if (s == null) null
    else s.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ").trim
  }

  def udfScalar(spark: SparkSession, sfDir: String): DataFrame = {
    val norm = udf(normalizeText)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        norm(concat(lit("  "), col("text"), lit("   "))).as("norm_text"))
      .select(col("doc_id"), substring(col("norm_text"), 1, 40).as("norm_prefix"),
        length(col("norm_text")).as("norm_len"))
      .orderBy(col("doc_id").asc)
  }

  /** `udtf_generator` — table-generating op (1 row → N): tokenize each
    * document into (doc_id, pos, token) rows via posexplode — Spark's
    * Generator, no custom UDTF class needed (SURVEY.md §2.J: explode
    * covers it; a custom Generator Expression only if codegen profiling
    * demands).
    */
  def udtfGenerator(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 50L)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .filter(length(col("token")) > 0)
      .orderBy(col("doc_id").asc, col("pos").asc)

  /** `udaf_typed` — typed custom aggregate: MinHash-signature merge as an
    * `Aggregator` (element-wise min of long arrays). This is the
    * mergeable-sketch pattern: partial signatures combine associatively
    * and commutatively (property-tested in UdafSpec), so the aggregation
    * is a partial+final shuffle of fixed-size state — the 100 TB shape.
    */
  class MinSigAggregator(val n: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    def zero: Array[Long] = Array.fill(n)(Long.MaxValue)
    def reduce(buf: Array[Long], row: Seq[Long]): Array[Long] = {
      var i = 0
      while (i < n && i < row.length) {
        if (row(i) < buf(i)) buf(i) = row(i)
        i += 1
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < n) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Per-source corpus MinHash signature: merge per-doc signatures with
    * the typed Aggregator — estimates cross-source Jaccard overlap from
    * fixed-size state.
    */
  def corpusSignature(spark: SparkSession, sfDir: String, nPerm: Int = 16): DataFrame = {
    import graft.operators.MinHashDedup
    val agg = udaf(new MinSigAggregator(nPerm))
    Tables.documents(spark, sfDir)
      .withColumn("sh", ShingleKernel.shingleHashes(col("text"), 3))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", MinHashDedup.minhashFromHashes(col("sh"), nPerm))
      .groupBy(col("source"))
      .agg(agg(col("sig")).as("corpus_sig"))
      .orderBy(col("source").asc)
  }

  /** `udaf_imperative` — same per-source signature through the internal
    * TypedImperativeAggregate path (raw mutable buffer, no encoder
    * round-trips); result must equal corpusSignature's (DedupSpec).
    */
  def corpusSignatureImperative(spark: SparkSession, sfDir: String,
      nPerm: Int = 16): DataFrame = {
    import graft.operators.MinHashDedup
    Tables.documents(spark, sfDir)
      .withColumn("sh", ShingleKernel.shingleHashes(col("text"), 3))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", MinHashDedup.minhashFromHashes(col("sh"), nPerm))
      .groupBy(col("source"))
      .agg(ImperativeAggs.minSig(col("sig"), nPerm).as("corpus_sig"))
      .orderBy(col("source").asc)
  }

  /** `udaf_typed_shape` — oracle shadow for the two signature
    * aggregators (VERDICT r5 #5, same technique as dedup_simhash_ids):
    * the signature VALUES are engine-hash longs no SQL oracle can
    * reproduce, but everything else about the aggregation is
    * relational — which sources get a signature (group-key set), the
    * contributing-doc cardinality (the ≥1-token predicate), the fixed
    * signature width (nPerm), and typed-vs-imperative equality (an
    * array compare after a keyed join). A merge-order bug, a dropped
    * group, a filter drift, or a divergence between the two Aggregator
    * implementations all surface here as a hash mismatch, shrinking
    * what only scalatest could see to just the raw hash values.
    */
  def udafShape(spark: SparkSession, sfDir: String,
      nPerm: Int = 16): DataFrame = {
    val typed = corpusSignature(spark, sfDir, nPerm)
    val imp = corpusSignatureImperative(spark, sfDir, nPerm)
      .withColumnRenamed("corpus_sig", "imp_sig")
    val nDocs = Tables.documents(spark, sfDir)
      .withColumn("sh", ShingleKernel.shingleHashes(col("text"), 3))
      .filter(size(col("sh")) > 0)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    typed.join(imp, "source").join(nDocs, "source")
      .select(col("source"),
        size(col("corpus_sig")).as("sig_len"),
        (col("corpus_sig") === col("imp_sig")).as("aggs_equal"),
        col("n_docs"))
      .orderBy(col("source").asc)
  }

  /** `udaf_topk` — bounded top-k as a typed Aggregator: each partial
    * keeps only its k best (value, key) pairs, merges are k+k→k, so the
    * shuffle carries fixed-size state per group — the scale-correct
    * alternative to a full window sort when only the top k survive
    * (topk_per_group's window form sorts EVERY row in the group).
    * Ordering is (value DESC, key ASC) so ties are deterministic;
    * output is the ordered key list as a CSV string (array-free for the
    * driver comparator). Merge laws property-tested in DedupSpec;
    * result equality vs the window form spec-asserted.
    */
  class TopKAggregator(val k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], String] {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    private def better(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortWith(better).take(k)
    def zero: Seq[(Double, Long)] = Nil
    def reduce(buf: Seq[(Double, Long)], row: (Double, Long)): Seq[(Double, Long)] =
      trim(buf :+ row)
    def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(a ++ b)
    def finish(buf: Seq[(Double, Long)]): String =
      trim(buf).map(_._2).mkString(",")
    def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Top-3 orders by price per priority through the bounded aggregator. */
  def topkHeap(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val agg = udaf(new TopKAggregator(k))
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(agg(col("o_totalprice"), col("o_orderkey")).as("top_keys"))
      .orderBy(col("o_orderpriority").asc)
  }

  /** Misra–Gries frequent-items sketch as a mergeable typed Aggregator —
    * the fixed-size (≤ `capacity` counters) heavy-hitters pass a corpus
    * pipeline runs before paying for an exact vocabulary count.
    * Guarantee: every item with true frequency > n/(capacity+1) survives
    * the sketch, and each surviving estimate undercounts by at most
    * n/(capacity+1) (spec-asserted against the exact counts). Merge
    * subtracts the (capacity+1)-th largest combined count — the standard
    * mergeable-summaries construction, so partial aggregation works
    * map-side like any built-in sketch. Estimates (not membership
    * guarantees) depend on encounter order, so this is a library/spec
    * surface, not an oracle-declared query.
    */
  class FreqItemsAggregator(val capacity: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    def zero: Map[String, Long] = Map.empty
    def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
      if (buf.contains(item)) buf.updated(item, buf(item) + 1)
      else if (buf.size < capacity) buf.updated(item, 1L)
      else buf.flatMap { case (k, v) =>
        if (v > 1) Some(k -> (v - 1)) else None
      }
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = (a.keySet ++ b.keySet).iterator
        .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
      if (sum.size <= capacity) sum
      else {
        // subtract the (capacity+1)-th largest count; ≤ capacity survive
        val cut = sum.values.toIndexedSeq
          .sorted(Ordering[Long].reverse)(capacity)
        sum.flatMap { case (k, v) =>
          if (v > cut) Some(k -> (v - cut)) else None
        }
      }
    }
    def finish(buf: Map[String, Long]): Map[String, Long] = buf
    def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }
}
