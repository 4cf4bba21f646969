package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators._

/** 100× scale probe (VERDICT r4 #7 — the 10× probes in SCALE.md, pushed
  * another order of magnitude): clone sf0.1 one hundred times into
  * /tmp/scaled100 (lineitem 60M rows, documents 500k docs) and measure
  * the headline dedup pipeline (dedup_minhash, dedup_cluster,
  * pipeline_curate) plus two relational anchors at 1× vs 100×.
  *
  * Fixture design for the dedup ops: each original document gets 100
  * copies — copies 1..9 are PLANTED NEAR-DUPS (trailing copy token, the
  * 10× probe's convention, so every original sits in a 10-clique), and
  * copies 10..99 are HEAVILY MUTATED (every odd-position token replaced
  * with a (copy, doc)-unique token, so they share no word bigram/trigram
  * with other copies EXCEPT the even-position unigrams and any
  * degenerate repeated-token runs the base text already had — shared
  * similarity is suppressed far below every dedup threshold, not
  * literally to zero). A 100× corpus of 100-cliques would measure clique
  * explosion, not scaling — real corpora have bounded dup groups; this
  * fixture keeps the 10-clique structure while scaling corpus volume
  * 100×. Expected: edge count ≈ the 10× probe's (45 pairs × 5000
  * originals), pair/candidate work tracking true-dup volume, CC rounds
  * still ≈ log(diameter).
  *
  * Run: sbt "Test/runMain graft.Scale100Probe"
  */
object Scale100Probe {
  def main(args: Array[String]): Unit = {
    val base = "/root/testdata/sf0.1"
    val out = "/tmp/scaled100"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val K = 100000000L
    def copies(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until 100).map(i => f(df, i)).reduce(_ unionByName _)

    if (!new java.io.File(s"$out/_done").exists()) {
      val t0 = System.nanoTime()
      copies(Tables.lineitem(spark, base), (d, i) =>
        d.withColumn("l_orderkey", col("l_orderkey") + i * K))
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      copies(Tables.orders(spark, base), (d, i) =>
        d.withColumn("o_orderkey", col("o_orderkey") + i * K)
          .withColumn("o_custkey", col("o_custkey") + i * K))
        .write.mode("overwrite").parquet(s"$out/orders.parquet")
      copies(Tables.customer(spark, base), (d, i) =>
        d.withColumn("c_custkey", col("c_custkey") + i * K))
        .write.mode("overwrite").parquet(s"$out/customer.parquet")
      copies(Tables.documents(spark, base), (d, i) =>
        d.withColumn("doc_id", col("doc_id") + i * K)
          .withColumn("text",
            if (i == 0) col("text")
            else if (i < 10) concat(col("text"), lit(s" copytoken$i"))
            else
              // kill similarity: every odd-position token becomes
              // (copy, doc)-unique — the doc_id in the prefix matters:
              // a merely copy-unique token would let two base docs that
              // were already near-dups stay near-dups inside every
              // mutated copy index, replicating base cross-doc pairs
              // ~90x and skewing the 45-pairs-per-original expectation
              array_join(zip_with(
                split(col("text"), " "),
                sequence(lit(0), size(split(col("text"), " ")) - 1),
                (w, j) => when(j % 2 === 0, w)
                  .otherwise(concat(lit(s"u${i}x"), col("doc_id"),
                    lit("x"), w))), " ")))
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      Seq("nation", "region", "part", "supplier").foreach { t =>
        Tables.table(spark, base, t).write.mode("overwrite")
          .parquet(s"$out/$t.parquet")
      }
      new java.io.File(s"$out/_done").createNewFile()
      println(f"[fixture] built in ${(System.nanoTime() - t0) / 1e9}%.0fs")
    }

    def time(name: String, dir: String)(mk: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = mk.count()
      println(f"$name%-16s ${if (dir == base) "1x  " else "100x"} " +
        f"${(System.nanoTime() - t0) / 1e9}%8.1fs  rows=$n%,d")
    }

    for (dir <- Seq(base, out)) {
      time("agg_group_sum", dir) { Aggregates.aggGroupSum(spark, dir) }
      time("join_multiway", dir) { Joins.joinMultiway(spark, dir) }
      time("dedup_minhash", dir) { MinHashDedup.dedupMinhash(spark, dir) }
      time("dedup_cluster", dir) {
        MinHashDedup.dedupClusterDocs(Tables.documents(spark, dir),
          threshold = 0.5)
      }
      time("pipeline_curate", dir) { TextOps.pipelineCurate(spark, dir) }
      // token-volume family (VERDICT r5 #7): both touch every token, so
      // the scale question is whether cost tracks token count (linear)
      // and whether the vocab/model side stays broadcast-able
      time("ngram_lm", dir) { TextOps.ngramLm(spark, dir) }
      time("lm_doc_score", dir) { TextOps.lmDocScore(spark, dir) }
      // round-7: the perplexity-bucketing pair — the exact ntile form
      // funnels per-language, the sketch-cutoff form is the scale path;
      // both read the lm memo (warmed by lm_doc_score above), so these
      // rows time the BUCKETING step alone at 100×
      time("qlm_exact", dir) { TextOps.qualityLmBucket(spark, dir) }
      time("qlm_cutoff", dir) { TextOps.qualityLmBucketCutoff(spark, dir) }
    }
    spark.stop()
  }
}
