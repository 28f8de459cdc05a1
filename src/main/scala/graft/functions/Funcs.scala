package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Expression helpers shared by the operator library. All are thin
  * compositions of codegen'd built-ins — no UDFs — so they stay inside
  * WholeStageCodegen and keep predicate pushdown intact.
  */
object Funcs {

  /** Run `body` with session conf `key` set to `value`, restoring the
    * previous value (or unsetting) after — a scoped conf change (state
    * store provider, partition overwrite mode, ...) must never leak into
    * later queries in the same session.
    */
  def withConf[T](s: SparkSession, key: String, value: String)(body: => T): T = {
    val prev = s.conf.getOption(key)
    s.conf.set(key, value)
    try body finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  /** Multi-key [[withConf]]: sets every pair, runs `body`, restores all in
    * reverse order. For queries that need several coordinated conf flips
    * (e.g. a runtime-filter demo that must also pin the join strategy).
    */
  def withConfs[T](s: SparkSession, pairs: (String, String)*)(body: => T): T =
    pairs.foldRight(() => body)((kv, inner) =>
      () => withConf(s, kv._1, kv._2)(inner())).apply()

  /** TIMESTAMP_BUCKET(ts, INTERVAL n SECOND) — floor-to-epoch-multiple
    * bucketing (reference: lakehouse_part3_time_series_forecasting.py:463
    * uses 5-minute buckets). Matches DuckDB `time_bucket` for intervals that
    * divide the 2000-01-01 epoch offset (all sub-hour intervals do).
    */
  def timestampBucket(ts: Column, seconds: Long): Column =
    timestamp_seconds(floor(unix_timestamp(ts) / seconds) * seconds)

  /** SAFE_DIVIDE + COALESCE(.., 0) (reference: part3:150-151).
    * try_divide returns NULL on a zero/NULL divisor for all numeric types.
    */
  def safeDivide(num: Column, den: Column): Column =
    coalesce(try_divide(num, den), lit(0.0))

  /** Cross-engine-stable SUM over a money-like double column: cast each
    * element to DECIMAL(18,2) (exact, order-independent accumulation), sum,
    * cast the single result back to double. A plain double sum differs
    * between engines in the last ulps because accumulation order differs;
    * this form is bitwise-reproducible anywhere.
    */
  def decSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Stable AVG built from [[decSum]]: one double division at the end. */
  def decAvg(c: Column): Column =
    decSum(c) / count(c)

  /** Morton (Z-order) interleave of two non-negative <= 31-bit ints:
    * bits of `a` land on odd positions, `b` on even, so sorting by the
    * result clusters rows that are close in BOTH dimensions — the
    * multi-column data-layout key behind Delta/Iceberg Z-ORDER BY. Pure
    * shift/mask compositions of codegen'd built-ins (the standard Morton
    * magic-mask spread), no UDF.
    */
  def interleaveBits(a: Column, b: Column): Column = {
    def spread(x: Column): Column = {
      var v = x.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
      v = v.bitwiseOR(shiftleft(v, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x3333333333333333L))
      v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x5555555555555555L))
    }
    shiftleft(spread(a), 1).bitwiseOR(spread(b))
  }

  /** PARSE_TIMESTAMP('%m/%d/%Y %I:%M:%S %p', s) (reference: part0:293). */
  def parseMtaTimestamp(s: Column): Column =
    to_timestamp(s, "MM/dd/yyyy hh:mm:ss a")

  /** Inverse of [[parseMtaTimestamp]] for round-trip tests. */
  def formatMtaTimestamp(ts: Column): Column =
    date_format(ts, "MM/dd/yyyy hh:mm:ss a")

  /** Whitespace tokenization shared by the text-analysis ops. */
  def tokens(text: Column): Column = split(text, " ")
}
