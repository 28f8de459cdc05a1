package graft.operators

import graft.api.GraftQuery
import graft.core.Tables
import graft.functions.Funcs._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GAP_FILL(..., value_columns=[(col,'linear')]) — the reference's one
  * genuinely custom operator (lakehouse_part3_time_series_forecasting.py:
  * 458-483): densify a keyed time series onto a fixed-interval spine and
  * linearly interpolate missing values between bracketing observations.
  *
  * Spark-first design: the spine is `sequence(min,max,interval)` exploded
  * per key (no driver loop, no cross join); interpolation is two window
  * passes (`last(ignoreNulls)` forward, `first(ignoreNulls)` backward) over
  * the key partition. At 100 TB the only shuffle is the window partition by
  * series key — the same partitioning the downstream per-series forecaster
  * needs, so Catalyst reuses the exchange.
  */
object GapFill {

  /** Densify + linear-interpolate `valueCol` per `keyCols` on a
    * `bucketSeconds` spine. Input must already be bucketed (one row per
    * key x bucket). Output: keyCols, bucketCol, valueCol (interpolated).
    */
  def linear(df: DataFrame, keyCols: Seq[String], bucketCol: String,
             valueCol: String, bucketSeconds: Long): DataFrame = {
    val keys = keyCols.map(col)
    val bounds = df.groupBy(keys: _*)
      .agg(min(bucketCol).as("__mn"), max(bucketCol).as("__mx"))
    val spine = bounds.select(keys :+
      explode(sequence(col("__mn"), col("__mx"),
        expr(s"INTERVAL $bucketSeconds SECONDS"))).as(bucketCol): _*)
    val joined = spine.join(df, keyCols :+ bucketCol, "left")

    // Both passes are running `(unboundedPreceding, currentRow)` frames —
    // O(n) per partition. The naive `(currentRow, unboundedFollowing)`
    // frame for the "next observation" would make Spark's WindowExec
    // re-aggregate the tail for every row (O(n^2) per partition — minutes
    // at sf0.1, hours at scale), so the backward pass sorts descending
    // instead and uses the same running frame.
    val fwd = Window.partitionBy(keys: _*).orderBy(col(bucketCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd = Window.partitionBy(keys: _*).orderBy(col(bucketCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val v = col(valueCol)
    val obsTs = when(v.isNotNull, col(bucketCol))
    val ep: Column => Column = c => unix_timestamp(c).cast("double")

    joined
      .withColumn("__pv", last(v, ignoreNulls = true).over(fwd))
      .withColumn("__pt", last(obsTs, ignoreNulls = true).over(fwd))
      .withColumn("__nv", last(v, ignoreNulls = true).over(bwd))
      .withColumn("__nt", last(obsTs, ignoreNulls = true).over(bwd))
      .withColumn(valueCol,
        when(v.isNotNull, v).otherwise(
          col("__pv") + (col("__nv") - col("__pv")) *
            ((ep(col(bucketCol)) - ep(col("__pt"))) / (ep(col("__nt")) - ep(col("__pt"))))))
      .select((keys :+ col(bucketCol) :+ col(valueCol)): _*)
  }

  /** Kernel variant of [[linear]] for a Long-keyed series: one shuffle on
    * the series key, then each series is densified in a single in-JVM walk.
    * The window variant costs three exchanges and two full sorts of the
    * *densified* spine (13M rows at sf0.1 — 42s); this sorts only the
    * *observed* points per group and streams the spine out (7s). Arithmetic
    * is the identical IEEE expression, so both variants (and the DuckDB
    * oracle) agree bitwise. GapFillSpec asserts window == kernel.
    */
  def linearKernel(df: DataFrame, keyCol: String, bucketCol: String,
                   valueCol: String, bucketSeconds: Long): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val stepMs = bucketSeconds * 1000L
    df.select(col(keyCol).cast("long"), col(bucketCol), col(valueCol).cast("double"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key: Long, it: Iterator[(Long, java.sql.Timestamp, Double)]) =>
        val pts = it.map { case (_, t, v) => (t.getTime, v) }.toArray.sortBy(_._1)
        new Iterator[(Long, java.sql.Timestamp, Double)] {
          private var seg = 0          // index of the observation at/behind cur
          private var cur = if (pts.isEmpty) 0L else pts(0)._1
          def hasNext: Boolean = pts.nonEmpty && cur <= pts(pts.length - 1)._1
          def next(): (Long, java.sql.Timestamp, Double) = {
            while (seg + 1 < pts.length && pts(seg + 1)._1 <= cur) seg += 1
            val (pt, pv) = pts(seg)
            val v =
              if (pt == cur) pv
              else {
                val (nt, nv) = pts(seg + 1)
                // identical expression to the window variant / oracle
                pv + (nv - pv) * (((cur / 1000).toDouble - (pt / 1000).toDouble) /
                  ((nt / 1000).toDouble - (pt / 1000).toDouble))
              }
            val out = (key, new java.sql.Timestamp(cur), v)
            cur += stepMs
            out
          }
        }
      }
      .toDF(keyCol, bucketCol, valueCol)
  }

  /** M2: 5-minute downsample of events per user + linear gap-fill, the
    * summarized_features shape (part3:458-483).
    */
  val m2: GraftQuery = GraftQuery(
    "m2_gap_fill_linear",
    (s, d) => {
      val base = Tables.events(s, d)
        .groupBy(col("user_id"), timestampBucket(col("ts"), 300).as("bucket_ts"))
        .agg(decAvg(col("value")).as("demand"))
      linearKernel(base, "user_id", "bucket_ts", "demand", 300)
    },
    Some("""WITH base AS (
           |  SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS b,
           |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand
           |  FROM events GROUP BY 1, 2),
           |bounds AS (SELECT user_id, min(b) AS mn, max(b) AS mx FROM base GROUP BY 1),
           |spine AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL '5 minutes')) AS b FROM bounds),
           |j AS (SELECT s.user_id, s.b, base.demand FROM spine s
           |      LEFT JOIN base ON s.user_id = base.user_id AND s.b = base.b),
           |w AS (SELECT user_id, b, demand,
           |  last_value(demand IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
           |  last_value(CASE WHEN demand IS NOT NULL THEN b END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
           |  first_value(demand IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY b ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
           |  first_value(CASE WHEN demand IS NOT NULL THEN b END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY b ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
           |  FROM j)
           |SELECT user_id, b AS bucket_ts,
           |  CASE WHEN demand IS NOT NULL THEN demand
           |       ELSE pv + (nv - pv) * ((epoch(b) - epoch(pt)) / (epoch(nt) - epoch(pt))) END AS demand
           |FROM w""".stripMargin))

  val all: Seq[GraftQuery] = Seq(m2)
}
