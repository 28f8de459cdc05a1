package graft.operators

import graft.api.GraftQuery
import graft.core.Tables
import graft.functions.Funcs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One observed point of a keyed demand series. */
final case class SeriesPoint(user_id: Long, bucket_ts: java.sql.Timestamp, demand: Double)

/** ML.FORECAST-shaped output row (reference part3:556-578): series key,
  * forecast timestamp, point forecast, interval bounds.
  */
final case class ForecastRow(
    user_id: Long,
    forecast_timestamp: java.sql.Timestamp,
    forecast_value: Double,
    lo: Double,
    hi: Double)

/** Per-series forecasting surface (SURVEY.md §2.11 M3-M7): the BQML
  * table-function shapes re-expressed as `flatMapGroups` kernels — each
  * series is folded in-JVM after a single shuffle on the series key
  * (the idiomatic replacement for ARIMA_PLUS_XREG / AI.FORECAST invocation;
  * SURVEY §7.3 mandates schema compatibility, not BQML internals).
  *
  * Two models: seasonal-naive ("last value") with +/-10% intervals, and
  * drift (last + h * mean slope) matching the TimesFM-shaped surface (M6).
  * Both deterministic, hence oracle-checkable.
  */
object Forecast {

  val Horizon = 12
  val BucketSeconds = 300L

  private def series(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), timestampBucket(col("ts"), BucketSeconds).as("bucket_ts"))
      .agg(decAvg(col("value")).as("demand"))

  private def forecastKernel(model: String)(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    series(s, d).as[SeriesPoint]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid: Long, it: Iterator[SeriesPoint]) =>
        val pts = it.toVector.sortBy(_.bucket_ts.getTime)
        val lastP = pts.last
        val n = pts.size
        val slope =
          if (n == 1) 0.0 else (lastP.demand - pts.head.demand) / (n - 1).toDouble
        (1 to Horizon).iterator.map { h =>
          val ts = new java.sql.Timestamp(lastP.bucket_ts.getTime + h * BucketSeconds * 1000L)
          model match {
            case "naive" =>
              ForecastRow(uid, ts, lastP.demand, lastP.demand * 0.9, lastP.demand * 1.1)
            case "drift" =>
              val v = lastP.demand + h * slope
              ForecastRow(uid, ts, v, v * 0.9, v * 1.1)
          }
        }
      }
      .toDF()
  }

  /** M3+M5: per-series seasonal-naive forecast with intervals. */
  val m5: GraftQuery = GraftQuery(
    "m5_forecast_naive",
    forecastKernel("naive"),
    Some("""WITH base AS (
           |  SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS b,
           |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand
           |  FROM events GROUP BY 1, 2),
           |last AS (SELECT user_id, arg_max(demand, b) AS last_demand, max(b) AS last_b FROM base GROUP BY 1)
           |SELECT user_id, last_b + h * INTERVAL '5 minutes' AS forecast_timestamp,
           |       last_demand AS forecast_value, last_demand * 0.9 AS lo, last_demand * 1.1 AS hi
           |FROM last CROSS JOIN generate_series(1, 12) t(h)""".stripMargin))

  /** M6: TimesFM-shaped surface, drift model — same output schema, different
    * method (part3:649-675 signature parity).
    */
  val m6: GraftQuery = GraftQuery(
    "m6_forecast_drift",
    forecastKernel("drift"),
    Some("""WITH base AS (
           |  SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS b,
           |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand
           |  FROM events GROUP BY 1, 2),
           |agg AS (SELECT user_id, arg_max(demand, b) AS last_demand, arg_min(demand, b) AS first_demand,
           |               max(b) AS last_b, count(*) AS n FROM base GROUP BY 1),
           |sl AS (SELECT user_id, last_demand, last_b,
           |       CASE WHEN n = 1 THEN 0.0 ELSE (last_demand - first_demand) / CAST(n - 1 AS DOUBLE) END AS slope FROM agg)
           |SELECT user_id, last_b + h * INTERVAL '5 minutes' AS forecast_timestamp,
           |       last_demand + h * slope AS forecast_value,
           |       (last_demand + h * slope) * 0.9 AS lo, (last_demand + h * slope) * 1.1 AS hi
           |FROM sl CROSS JOIN generate_series(1, 12) t(h)""".stripMargin))

  /** M4: evaluation metrics (ML.EVALUATE shape, part3:539-553): in-sample
    * MAE / max abs error of the naive one-step forecast per series.
    */
  val m4: GraftQuery = GraftQuery(
    "m4_eval_metrics",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("bucket_ts")
      series(s, d)
        .withColumn("prev", lag("demand", 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("abs_err", abs(col("demand") - col("prev")))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          (sum(col("abs_err").cast("decimal(28,6)")).cast("double") / count(lit(1))).as("mae"),
          max("abs_err").as("max_abs_err"))
    },
    Some("""WITH base AS (
           |  SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS b,
           |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand
           |  FROM events GROUP BY 1, 2),
           |l AS (SELECT user_id, demand, lag(demand) OVER (PARTITION BY user_id ORDER BY b) AS prev FROM base),
           |e AS (SELECT user_id, ABS(demand - prev) AS abs_err FROM l WHERE prev IS NOT NULL)
           |SELECT user_id, count(*) AS n,
           |       CAST(SUM(CAST(abs_err AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS mae,
           |       max(abs_err) AS max_abs_err
           |FROM e GROUP BY user_id""".stripMargin))

  val all: Seq[GraftQuery] = Seq(m4, m5, m6)
}
