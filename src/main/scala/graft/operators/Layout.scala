package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering — the
  * lakehouse answer (Delta `OPTIMIZE ZORDER BY`, Iceberg sort orders)
  * to "my queries filter on TWO columns but a sort key can only make
  * row-group min/max stats tight on ONE".
  *
  * Interleaving the bits of two keys gives a space-filling curve:
  * sorting by the z-value places rows that are close in BOTH
  * dimensions into the same row groups, so each row group's (min, max)
  * bounding box is tight on both columns and parquet predicate
  * pushdown skips row groups for filters on EITHER (or both) keys. A
  * linear sort gets the same skipping on its leading key only; at
  * 100 TB the difference is scanning one dimension's full extent vs a
  * bounded box per row group.
  *
  * Everything here is pure integer bit arithmetic (shift/and/or) —
  * codegen'd, exactly mirrored in SQL, no float anywhere.
  */
object Layout {

  /** The Morton z-value of two non-negative integer keys: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. `bits` low bits of
    * each key participate (callers size it to the key domain; 30+30
    * fits a long with room to spare). */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Per-bucket bounding-box report (q84): cut the z-curve into
    * 2^lbBuckets equal ranges (a pure shift of the z-value's high
    * bits — deterministic, unlike sampled range partitioning) and
    * report each bucket's row count and its (min, max) extent in BOTH
    * dimensions. This is the measurable claim behind z-ordering: the
    * per-bucket spans stay bounded in a AND b simultaneously, which is
    * what makes the written row groups skippable on either predicate.
    *
    * Scale shape: one map-side-partial aggregation onto 2^lbBuckets
    * cells — the z-value and bucket id are codegen'd bit expressions
    * inside the scan's whole-stage span, no shuffle except the
    * bucket-count exchange. */
  def zorderReport(df: DataFrame, aCol: String, bCol: String,
                   bits: Int, lbBuckets: Int): DataFrame = {
    require(lbBuckets >= 1 && 2 * bits > lbBuckets,
      s"need 2*bits > lbBuckets, got bits=$bits lbBuckets=$lbBuckets")
    val a = col(aCol).cast("long")
    val b = col(bCol).cast("long")
    df.where(a.isNotNull && b.isNotNull && a >= 0 && b >= 0)
      .select(a.as("a"), b.as("b"),
        zValue(a, b, bits).as("z"))
      .withColumn("bucket", shiftright(col("z"), 2 * bits - lbBuckets))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_rows"),
        min("a").as(s"min_$aCol"), max("a").as(s"max_$aCol"),
        min("b").as(s"min_$bCol"), max("b").as(s"max_$bCol"))
      .orderBy("bucket")
  }

  /** [[zorderReport]]'s twin on the HILBERT curve
    * ([[graft.functions.Hilbert]]) — same bucket-cut, same bounding-box
    * report, different space-filling curve. The claim worth measuring
    * (LayoutSpec does, on the same keys): Hilbert's neighbors-stay-
    * adjacent property yields tighter per-bucket boxes than Morton's
    * diagonal jumps, i.e. better row-group skippability for the same
    * write cost. Delta's OPTIMIZE grew Hilbert after ZORDER for
    * exactly this. */
  def hilbertReport(df: DataFrame, aCol: String, bCol: String,
                    bits: Int, lbBuckets: Int): DataFrame = {
    require(lbBuckets >= 1 && 2 * bits > lbBuckets,
      s"need 2*bits > lbBuckets, got bits=$bits lbBuckets=$lbBuckets")
    val a = col(aCol).cast("long")
    val b = col(bCol).cast("long")
    // Domain gate: Hilbert.hilbertIndex documents [0, 2^bits) and keys
    // beyond it silently WRAP on low bits — deterministic but
    // locality-meaningless buckets, exactly what this report exists to
    // measure honestly. Out-of-domain rows are excluded like negatives
    // are (callers pick `bits` from the observed key range, as q84/q139
    // do with 30-bit keys).
    val lim = lit(1L << bits)
    df.where(a.isNotNull && b.isNotNull && a >= 0 && b >= 0 &&
        a < lim && b < lim)
      .select(a.as("a"), b.as("b"),
        graft.functions.Hilbert.hilbert(a, b, bits).as("h"))
      .withColumn("bucket", shiftright(col("h"), 2 * bits - lbBuckets))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_rows"),
        min("a").as(s"min_$aCol"), max("a").as(s"max_$aCol"),
        min("b").as(s"min_$bCol"), max("b").as(s"max_$bCol"))
      .orderBy("bucket")
  }

  /** The write path the report justifies: cluster by z-value and write
    * parquet, so row-group stats are tight on both keys. Sorting
    * WITHIN partitions after a range exchange on z is exactly what
    * `sortWithinPartitions` + range `repartitionByRange` compose to;
    * the parquet writer then cuts row groups along the curve. */
  def writeClustered(df: DataFrame, aCol: String, bCol: String,
                     bits: Int, path: String, numFiles: Int): Unit = {
    val z = zValue(col(aCol).cast("long"), col(bCol).cast("long"), bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
