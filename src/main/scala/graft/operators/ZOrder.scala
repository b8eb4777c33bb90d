package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-dimensional data-layout
  * key. A table sorted by one column prunes scans on that column only;
  * a 100 TB events table queried by (user, time-range) boxes needs
  * min/max file statistics that are selective in BOTH dimensions.
  * Sorting by the bit-interleaved key gives every file a bounded
  * rectangle-ish region of the (x, y) plane, so parquet row-group
  * stats prune 2-D box predicates in either or both dimensions —
  * without any index structure, purely by write-time layout.
  *
  * The key is a pure composition of built-in bit expressions (shifts,
  * masks, ors), so it stays inside whole-stage codegen and is
  * reproducible by any engine — the oracle rebuilds it bit by bit.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integer
    * columns: bit i of `x` lands at position 2i, bit i of `y` at
    * 2i+1. Inputs are masked to `bits` bits first, so out-of-range
    * values wrap rather than corrupt high bits.
    *
    * CHOOSE `bits` TO COVER THE DOMAIN of both inputs (or normalize
    * them first, e.g. `hour - min_hour`): a wrapping input aliases
    * values 2^bits apart into the same cell, which silently destroys
    * the layout's locality the first time the data window straddles
    * a wrap boundary. Epoch-hours (~500k) need bits ≥ 20; epoch-days
    * fit 16 until 2149.
    */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** The same key as engine-neutral SQL over expressions `x`, `y`.
    * Every term is fully parenthesized: engines disagree on bitwise
    * precedence (DuckDB gives `<<` and `|` EQUAL precedence,
    * left-associative, so an unparenthesized `a << 6 | b << 7` parses
    * as `((a << 6) | b) << 7`).
    */
  def zvalueSql(x: String, y: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val mask = (1L << bits) - 1
    val terms = (0 until bits).flatMap { i =>
      Seq(s"((((($x) & $mask) >> $i) & 1) << ${2 * i})",
        s"((((($y) & $mask) >> $i) & 1) << ${2 * i + 1})")
    }
    terms.mkString("(", " | ", ")")
  }

  /** Rewrite `df` into a Z-ordered layout: range-partitioned and
    * sorted by the interleaved key, so each output file covers a
    * compact region of the (x, y) plane and carries tight min/max
    * stats in both dimensions. `numFiles` sizes the write
    * parallelism — at cluster scale, one file per executor-core
    * chunk of the table.
    */
  def layout(
      df: DataFrame, x: Column, y: Column,
      numFiles: Int, bits: Int = 16): DataFrame = {
    require(numFiles >= 1, s"numFiles must be positive, got $numFiles")
    df.withColumn("__z", zvalue(x, y, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
