package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Large-scale synthetic stress probe for the round-11 continuation
  * family (results in SCALE.md): the fixture step tops out at 5,000
  * documents, so this builds key-derived corpora at 20k / 200k / 1M
  * docs (40 tokens each from a 2,000-word vocabulary — at the top step
  * the 1M-doc corpus is ~1.7× the sf0.1 lineitem row count, the
  * 40M-token stream ~67× its rows) and measures
  * `ngram_pmi`'s one-pass rollup and `mix_weighted`'s keyed window.
  * Output sizes are fixed (top-k / budget-bounded), so wall growth
  * isolates the corpus-sized work.
  */
object Round11cProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(n: Long): DataFrame = {
      val vocab = array((0 until 2000).map(i => lit(s"w$i")): _*)
      spark.range(n).select(col("id").as("doc_id"),
        element_at(array(lit("en"), lit("de"), lit("es"), lit("fr"),
          lit("zh")), (col("id") % 5 + 1).cast("int")).as("lang"),
        array_join(transform(sequence(lit(0), lit(39)),
          i => element_at(vocab,
            ((col("id") * 31 + i * 17 + i * i * 7) % 2000 + 1)
              .cast("int"))), " ").as("text"))
    }

    // untimed warmup
    TextOps.ngramPmiDocs(corpus(5000L), 5, 100).count()
    TextOps.mixWeightedDocs(corpus(5000L), 10000L,
      TextOps.DefaultMixWeights).count()

    Seq(("1x", 20000L), ("10x", 200000L), ("50x", 1000000L)).foreach {
      case (tag, n) =>
        val d = corpus(n)
        val t0 = System.nanoTime()
        val pmiRows = TextOps.ngramPmiDocs(d, 5, 100).count()
        val t1 = System.nanoTime()
        val mixRows = TextOps.mixWeightedDocs(d, 100000L,
          TextOps.DefaultMixWeights).count()
        val t2 = System.nanoTime()
        println(f"R11CPROBE $tag ngram_pmi ${(t1 - t0) / 1e9}%.2f s rows=$pmiRows docs=$n")
        println(f"R11CPROBE $tag mix_weighted ${(t2 - t1) / 1e9}%.2f s rows=$mixRows docs=$n")
    }
    spark.stop()
  }
}
