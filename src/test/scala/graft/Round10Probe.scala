package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Joins

/** Round-10 scale probes (results recorded in SCALE.md): the re-blocked
  * fuzzy join and the grid-blocked spatial join at 1× vs 10× input.
  *
  * Fuzzy fixture: sequential 9-digit names — near-duplicate density per
  * name (digit neighbors) is scale-free, so true pairs grow ~linearly
  * with n and a correctly-blocked join should track output, never n².
  * Spatial fixture: 10× customers remapped into the SAME coordinate
  * region over a fixed supplier set — candidate density grows 10×, so
  * both work and output should grow ~10×.
  */
object Round10Probe {
  def main(args: Array[String]): Unit = {
    val base = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def fuzzyFixture(n: Long, dir: String): Unit =
      if (!new java.io.File(s"$dir/_done").exists()) {
        spark.range(1, n + 1)
          .select(col("id").as("c_custkey"),
            (col("id") % 25).cast("int").as("c_nationkey"),
            concat(lit("Customer#"),
              lpad(col("id").cast("string"), 9, "0")).as("c_name"))
          .write.mode("overwrite").parquet(s"$dir/customer.parquet")
        new java.io.File(s"$dir/_done").createNewFile()
      }

    // untimed warmup: session/codegen init must not ride the 1× row
    fuzzyFixture(15000L, "/tmp/r10_fuzzy1x")
    Joins.joinFuzzy(spark, "/tmp/r10_fuzzy1x").count()

    Seq(("1x", 15000L, "/tmp/r10_fuzzy1x"),
        ("10x", 150000L, "/tmp/r10_fuzzy10x"),
        ("100x", 1500000L, "/tmp/r10_fuzzy100x")).foreach { case (tag, n, dir) =>
      fuzzyFixture(n, dir)
      val t0 = System.nanoTime()
      val byNation = Joins.joinFuzzy(spark, dir).collect()
      val pairs = byNation.map(_.getLong(1)).sum
      println(f"R10PROBE $tag join_fuzzy ${(System.nanoTime() - t0) / 1e9}%.2f s pairs=$pairs")
    }

    // spatial: keep suppliers fixed, clone customers 10× with shifted
    // keys (coords derive from the key, so copies land elsewhere in the
    // same 10°×20° region). The shift K must not divide the coordinate
    // periods (key*11 % 1000, key*17 % 2000 — ADVICE r10: the old 1e8
    // was ≡0 mod both, so "copies" stacked at the original coords and
    // the probe measured duplicates, not 10× spatial density); 1e8+7
    // shifts every clone's (lat, lon) by a nonzero offset.
    val spatialDir = "/tmp/r11_spatial10x"
    if (!new java.io.File(s"$spatialDir/_done").exists()) {
      val K = 100000007L
      (0 until 10).map(i => graft.sources.Tables.customer(spark, base)
          .withColumn("c_custkey", col("c_custkey") + i * K))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$spatialDir/customer.parquet")
      graft.sources.Tables.supplier(spark, base)
        .write.mode("overwrite").parquet(s"$spatialDir/supplier.parquet")
      new java.io.File(s"$spatialDir/_done").createNewFile()
    }
    Seq(("1x", base), ("10x", spatialDir)).foreach { case (tag, dir) =>
      val t0 = System.nanoTime()
      val n = Joins.joinSpatialGrid(spark, dir).count()
      println(f"R10PROBE $tag join_spatial_grid ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
