package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{BpeTrain, SimSearch, TextOps}

/** Round-12 synthetic stress probe (results in SCALE.md), same
  * key-derived corpora as Round11cProbe (40 tokens/doc, 2,000-word
  * vocabulary): measures the BUCKET-PRUNED `mix_weighted` against the
  * r11 unpruned numbers (0.57 / 1.24 / 3.86 s at 20k / 200k / 1M
  * docs) — the per-language window input is now budget-bounded
  * instead of corpus-sized — and `bpe_train`'s 8-iteration
  * count+merge loop, whose per-step cost is the corpus token stream.
  */
object Round12Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // parquet-backed (unlike Round11cProbe's generated frames): the
    // pruned mix runs TWO passes over its input, and for the real
    // workload those are columnar scans — a generated frame would
    // re-pay the synthesis expressions instead and overstate the cost
    val base = java.nio.file.Files.createTempDirectory("graft_r12p").toString
    def corpus(n: Long): DataFrame = {
      val dir = s"$base/c$n"
      if (!new java.io.File(dir).exists()) {
        val vocab = array((0 until 2000).map(i => lit(s"w$i")): _*)
        spark.range(n).select(col("id").as("doc_id"),
          element_at(array(lit("en"), lit("de"), lit("es"), lit("fr"),
            lit("zh")), (col("id") % 5 + 1).cast("int")).as("lang"),
          array_join(transform(sequence(lit(0), lit(39)),
            i => element_at(vocab,
              ((col("id") * 31 + i * 17 + i * i * 7) % 2000 + 1)
                .cast("int"))), " ").as("text"))
          .write.parquet(dir)
      }
      spark.read.parquet(dir)
    }

    // untimed warmup
    TextOps.mixWeightedDocs(corpus(5000L), 10000L,
      TextOps.DefaultMixWeights).count()
    BpeTrain.bpeTrainDocs(corpus(5000L), 8).count()

    Seq(("1x", 20000L), ("10x", 200000L), ("50x", 1000000L)).foreach {
      case (tag, n) =>
        val d = corpus(n)
        val t0 = System.nanoTime()
        val mixRows = TextOps.mixWeightedDocs(d, 100000L,
          TextOps.DefaultMixWeights).count()
        val t1 = System.nanoTime()
        println(f"R12PROBE $tag mix_weighted_pruned ${(t1 - t0) / 1e9}%.2f s rows=$mixRows docs=$n")
        // bpe_train is 8 sequential corpus passes — cap the probe at 10×
        if (n <= 200000L) {
          val t2 = System.nanoTime()
          val merges = BpeTrain.bpeTrainDocs(d, 8).count()
          val t3 = System.nanoTime()
          println(f"R12PROBE $tag bpe_train ${(t3 - t2) / 1e9}%.2f s merges=$merges docs=$n")
        }
    }

    // PQ vs IVFPQ at growing vector-corpus sizes: the cell prune should
    // hold ivfpq's post-prune work ~cell-bounded while plain pq's score
    // aggregate + rank window track the corpus
    def vecCorpus(n: Long): DataFrame = {
      val dir = s"$base/v$n"
      if (!new java.io.File(dir).exists()) {
        spark.range(n).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)),
            d => ((((col("id") * 1315423911L + d * 2654435761L) % 1999)
              .cast("float") - 999f) / 999f).cast("float")).as("embedding"))
          .write.parquet(dir)
      }
      spark.read.parquet(dir)
    }
    SimSearch.pqOver(vecCorpus(5000L), 5, 10, 127, 4).count() // warm
    Seq(("1x", 20000L), ("10x", 200000L)).foreach { case (tag, n) =>
      val v = vecCorpus(n)
      val t0 = System.nanoTime()
      val pqN = SimSearch.pqOver(v, 5, 10, 127, 4).count()
      val t1 = System.nanoTime()
      val ipqN = SimSearch.ivfPqOver(v,
        SimSearch.ivfCodebook(v, 997), SimSearch.ivfCodebook(v, 127),
        5, 10, 4, 2).count()
      val t2 = System.nanoTime()
      println(f"R12PROBE $tag simsearch_pq ${(t1 - t0) / 1e9}%.2f s rows=$pqN vecs=$n")
      println(f"R12PROBE $tag simsearch_ivfpq ${(t2 - t1) / 1e9}%.2f s rows=$ipqN vecs=$n")
    }
    spark.stop()
  }
}
