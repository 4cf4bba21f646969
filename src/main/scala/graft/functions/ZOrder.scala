package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve encoding for multi-column data clustering
  * (SURVEY.md §2.A lake maintenance; the Delta OPTIMIZE ZORDER analogue
  * that `Lake.saveSorted` covers only for a single key). Interleaving
  * the bits of two bucket ids gives a 1-D sort key under which rows
  * close in BOTH dimensions land close on disk — so parquet min/max
  * stats stay tight on both columns and point/box predicates on either
  * column (or both) skip row groups and files.
  *
  * Pure bitwise column arithmetic — codegen'd, row-local, no UDF.
  */
object ZOrder {

  /** Spread the low 8 bits of `c` to even bit positions:
    * abcdefgh → 0a0b0c0d0e0f0g0h (the classic mask-shift cascade).
    */
  private def spread8(c: Column): Column = {
    val s1 = (c.bitwiseOR(shiftleft(c, 4))).bitwiseAND(lit(0x0F0F))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 2))).bitwiseAND(lit(0x3333))
    (s2.bitwiseOR(shiftleft(s2, 1))).bitwiseAND(lit(0x5555))
  }

  /** 16-bit Morton code of two 8-bit bucket ids (a in even bits, b in
    * odd). Inputs outside [0, 255] must be clamped by the caller.
    */
  def morton2(a: Column, b: Column): Column =
    spread8(a).bitwiseOR(shiftleft(spread8(b), 1))

  /** Equal-width bucket id in [0, nBuckets) for `c` given inclusive
    * [lo, hi] bounds — the same arithmetic shape as `agg_histogram`
    * (bit-stable cross-engine). Degenerate lo = hi maps to bucket 0.
    */
  def bucket(c: Column, lo: Column, hi: Column, nBuckets: Int): Column =
    when(hi === lo, lit(0)).otherwise(
      least(floor((c - lo) / ((hi - lo) / nBuckets)),
        lit(nBuckets - 1.0))).cast("int")
}
