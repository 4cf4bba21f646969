package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Joins, SimSearch}

/** Round-11 scale probes (results recorded in SCALE.md): the hybrid
  * retriever and the grid-blocked polygon join at 1× vs 10× input.
  *
  * Hybrid fixture: synthetic docs (30 words each from a 200-word
  * vocabulary, chosen by key arithmetic) + synthetic 64-dim unit-ish
  * embeddings, both pure functions of the id — corpus statistics and
  * bucket densities are scale-free, so BM25 aggs, the knn product
  * (fixed 10-query side), and the LSH bucket join should all grow
  * ~linearly with the corpus. Output is fixed (10 queries × k) at any
  * scale — the probe separates work growth from output growth.
  *
  * Polygon fixture: the PolygonGridSpec 200-diamond layer with 10×
  * points — candidate pairs (the only superlinear risk) must track
  * point count ~linearly because blocking is cell-local and the layer
  * is fixed.
  */
object Round11Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def corpus(n: Long): (DataFrame, DataFrame) = {
      val vocab = array((0 until 200).map(i => lit(s"w$i")): _*)
      val docs = spark.range(n).select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(0), lit(29)),
          i => element_at(vocab,
            ((col("id") * 7 + i * 13) % 200 + 1).cast("int"))), " ")
          .as("text"))
      val emb = spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          d => (((col("id") * 31 + d * 17) % 1000 - 500).cast("double")
            / 500.0).cast("float")).as("embedding"))
      (docs, emb)
    }

    // untimed warmup (session + codegen init)
    val (wd, we) = corpus(2000L)
    SimSearch.hybridOver(wd, we, 10, 10, 20).count()

    Seq(("1x", 2000L), ("10x", 20000L)).foreach { case (tag, n) =>
      val (d, e) = corpus(n)
      val t0 = System.nanoTime()
      val rows = SimSearch.hybridOver(d, e, 10, 10, 20).count()
      val t1 = System.nanoTime()
      val rowsL = SimSearch.hybridOver(d, e, 10, 10, 20,
        dense = x => SimSearch.lshOver(x, 20, 10, 6)).count()
      val t2 = System.nanoTime()
      println(f"R11PROBE $tag simsearch_hybrid ${(t1 - t0) / 1e9}%.2f s rows=$rows")
      println(f"R11PROBE $tag simsearch_hybrid_lsh ${(t2 - t1) / 1e9}%.2f s rows=$rowsL")
    }

    // polygon layer: same construction as PolygonGridSpec
    val polys = (0 until 200).map { i =>
      val lonc = 0.5 + (i * 13 % 39) / 2.0 + (i % 7) * 0.03
      val latc = 45.5 + (i * 7 % 19) / 2.0 + (i % 5) * 0.02
      (i.toLong, lonc, latc, 0.3 + (i % 4) * 0.2, 0.25 + (i % 3) * 0.2)
    }.toDF("poly_id", "lonc", "latc", "rx", "ry")
      .withColumn("verts", array(
        struct((col("lonc") + col("rx")).as("x"), col("latc").as("y")),
        struct(col("lonc").as("x"), (col("latc") + col("ry")).as("y")),
        struct((col("lonc") - col("rx")).as("x"), col("latc").as("y")),
        struct(col("lonc").as("x"), (col("latc") - col("ry")).as("y"))))
    def points(n: Long): DataFrame = spark.range(n).select(
      col("id").as("p_id"),
      ((col("id") * 17 % 2000).cast("double") / 100.0 + 0.003).as("lon"),
      (lit(45.0) + (col("id") * 11 % 1000).cast("double") / 100.0 + 0.007)
        .as("lat"))
    Joins.polygonGridJoin(points(5000L), polys).count() // warmup
    Seq(("1x", 5000L), ("10x", 50000L)).foreach { case (tag, n) =>
      val t0 = System.nanoTime()
      val pairs = Joins.polygonGridJoin(points(n), polys).count()
      println(f"R11PROBE $tag join_polygon_grid ${(System.nanoTime() - t0) / 1e9}%.2f s pairs=$pairs")
    }
  }
}
