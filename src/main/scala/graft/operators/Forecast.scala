package graft.operators

import graft.api.GraftQuery
import graft.core.Tables
import graft.functions.Funcs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One observed point of a keyed demand series. */
final case class SeriesPoint(user_id: Long, bucket_ts: java.sql.Timestamp, demand: Double)

/** One bucketed point with its covariate and seasonal residual (M3 input). */
final case class XregPoint(
    user_id: Long, bucket_ts: java.sql.Timestamp, demand: Double, x: Long, resid: Double)

/** M3b input point: adds the holiday-indicator covariate g. */
final case class XregHPoint(
    user_id: Long, bucket_ts: java.sql.Timestamp, demand: Double, x: Long,
    g: Long, resid: Double)

/** M3b per-series moments for the 4-regressor (1, t, x, holiday) normal
  * equations: exact integer sums for the design matrix, t-ordered float
  * folds for the response moments.
  */
final case class XregHMoments(
    user_id: Long, last_b: java.sql.Timestamp, n: Double, umean: Double,
    st: Double, stt: Double, sx: Double, sxx: Double, stx: Double,
    sg: Double, stg: Double, sxg: Double, sgg: Double,
    sy: Double, sty: Double, sxy: Double, sgy: Double, srr: Double)

/** Per-series regression moments (M3): exact integer sums for the design
  * matrix, t-ordered float folds for the demand/residual moments.
  */
final case class XregMoments(
    user_id: Long, last_b: java.sql.Timestamp, n: Double, umean: Double,
    st: Double, stt: Double, sx: Double, sxx: Double, stx: Double,
    sy: Double, sty: Double, sxy: Double, srr: Double)

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
  * Four models: seasonal-naive ("last value") with +/-10% intervals, drift
  * (last + h * mean slope) matching the TimesFM-shaped surface (M6), AR(1)
  * mean reversion (m7), and the seasonal + covariate XREG regression (m3).
  * All deterministic, hence oracle-checkable.
  */
object Forecast {

  val Horizon = 12
  val BucketSeconds = 300L

  /** Holt-Winters season length in buckets (one hour of 5-minute
    * buckets — the shortest cycle the demand series actually repeats).
    */
  val SeasonLen = 12

  /** Inverse standard-normal CDF — Acklam's 2003 rational approximation
    * (public domain, |relative error| < 1.15e-9). Runs on the DRIVER while
    * building the plan, so the z-score enters both the Spark expression
    * tree and the oracle SQL as the same double literal; cross-engine
    * bit-exactness never depends on two libm erfinv implementations
    * agreeing.
    */
  def invNorm(p: Double): Double = {
    require(p > 0.0 && p < 1.0, s"invNorm domain (0,1), got $p")
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val dd = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pl = 0.02425
    if (p < pl) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((dd(0) * q + dd(1)) * q + dd(2)) * q + dd(3)) * q + 1)
    } else if (p <= 1 - pl) {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      val q = math.sqrt(-2 * math.log(1 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((dd(0) * q + dd(1)) * q + dd(2)) * q + dd(3)) * q + 1)
    }
  }

  /** Two-sided z multiplier for a central `confidence` interval. */
  def zFor(confidence: Double): Double = {
    require(confidence > 0.0 && confidence < 1.0,
      s"confidence must be in (0,1), got $confidence")
    invNorm(0.5 + confidence / 2.0)
  }

  /** Round-trip string of the default 0.9-confidence z — spliced verbatim
    * into the registry queries' oracle SQL so DuckDB parses the identical
    * double.
    */
  private val Z90: String = java.lang.Double.toString(zFor(0.9))

  /** US federal holidays 2023-2025, observed dates — the static calendar
    * behind m3b's HOLIDAY_REGION='US' covariate (reference part3:524). A
    * literal dim, no I/O: at scale this is exactly the broadcast-joined
    * 11-rows-per-year table a production calendar would be.
    */
  val UsHolidays: Seq[String] = Seq(
    "2023-01-02", "2023-01-16", "2023-02-20", "2023-05-29", "2023-06-19",
    "2023-07-04", "2023-09-04", "2023-10-09", "2023-11-10", "2023-11-23",
    "2023-12-25",
    "2024-01-01", "2024-01-15", "2024-02-19", "2024-05-27", "2024-06-19",
    "2024-07-04", "2024-09-02", "2024-10-14", "2024-11-11", "2024-11-28",
    "2024-12-25",
    "2025-01-01", "2025-01-20", "2025-02-17", "2025-05-26", "2025-06-19",
    "2025-07-04", "2025-09-01", "2025-10-13", "2025-11-11", "2025-11-27",
    "2025-12-25")

  /** Cofactor-expansion text for a 3x3 / 4x4 determinant over named moment
    * columns. The SAME generated string is spliced into the Spark
    * selectExpr AND the DuckDB oracle SQL, so both engines evaluate an
    * identical IEEE expression tree — textual identity is the whole
    * bit-exactness argument for the 4-regressor Cramer solve.
    */
  private def det3s(m: IndexedSeq[String]): String =
    s"(${m(0)} * (${m(4)} * ${m(8)} - ${m(5)} * ${m(7)}) - ${m(1)} * (${m(3)} * ${m(8)} - ${m(5)} * ${m(6)}) + ${m(2)} * (${m(3)} * ${m(7)} - ${m(4)} * ${m(6)}))"

  private def det4s(m: IndexedSeq[String]): String = {
    val r = m.grouped(4).toIndexedSeq
    def minor(col: Int): String = det3s(
      (1 to 3).flatMap(ri => (0 to 3).filter(_ != col).map(ci => r(ri)(ci))).toIndexedSeq)
    s"(${r(0)(0)} * ${minor(0)} - ${r(0)(1)} * ${minor(1)} + ${r(0)(2)} * ${minor(2)} - ${r(0)(3)} * ${minor(3)})"
  }

  /** Normal-equation matrix for regressors (1, t, x, g) and its Cramer
    * column replacements, as shared expression text.
    */
  private val H4M = Vector("n", "st", "sx", "sg",
    "st", "stt", "stx", "stg",
    "sx", "stx", "sxx", "sxg",
    "sg", "stg", "sxg", "sgg")
  private val H4Y = Vector("sy", "sty", "sxy", "sgy")
  private def h4Repl(col: Int): Vector[String] =
    Vector.tabulate(16)(i => if (i % 4 == col) H4Y(i / 4) else H4M(i))
  private val D4 = det4s(H4M)
  private val D4A = det4s(h4Repl(0))
  private val D4B = det4s(h4Repl(1))
  private val D4C = det4s(h4Repl(2))
  private val D4D = det4s(h4Repl(3))

  private def series(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), timestampBucket(col("ts"), BucketSeconds).as("bucket_ts"))
      .agg(decAvg(col("value")).as("demand"))

  /** Public DataFrame-in API (see graft.api.Graft): per-series forecast
    * over an arbitrary bucketed series table with (user_id: long,
    * bucket_ts: timestamp, demand: double) columns. `model` is one of
    * "naive" | "drift" | "ar1" | "holt" | "hw" (additive Holt-Winters —
    * series shorter than 2·[[SeasonLen]] emit no rows); emits `horizon`
    * rows per series in the
    * ML.FORECAST output shape — the reference's
    * `ML.FORECAST(model, STRUCT(horizon, confidence))` signature
    * (part3:556-578) maps onto (horizon, confidence) here.
    *
    * Intervals are MODEL intervals, not cosmetic bands: σ² is the
    * one-step residual variance of the model's own in-sample fit (folded
    * in ascending t order — the cross-engine bit-exactness contract), and
    * the h-step half-width is z(confidence)·σ·√(varScale(h)) where
    * varScale is h for the random-walk-innovation models (naive/drift)
    * and Σ_{j<h} φ^{2j} — the exact MA(∞) truncation — for AR(1). z comes
    * from [[invNorm]] on the driver, never from executor-side libm.
    */
  def forecast(seriesDf: DataFrame, model: String, horizon: Int = Horizon,
      confidence: Double = 0.9): DataFrame = {
    // a bad model name must fail plan-building with a clear message, not
    // surface as a MatchError task failure deep inside flatMapGroups
    require(Set("naive", "drift", "ar1", "holt", "hw", "theta", "kalman")(model),
      s"unknown forecast model '$model' (expected one of naive|drift|ar1|holt|hw|theta|kalman)")
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    val z = zFor(confidence)
    val s = seriesDf.sparkSession
    import s.implicits._
    seriesDf.as[SeriesPoint]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid: Long, it: Iterator[SeriesPoint]) =>
        val pts = it.toVector.sortBy(_.bucket_ts.getTime)
        val lastP = pts.last
        val n = pts.size
        val slope =
          if (n == 1) 0.0 else (lastP.demand - pts.head.demand) / (n - 1).toDouble
        // AR(1) moments, every fold in ascending t order (the cross-engine
        // bit-exactness contract — the oracle replays them with ordered
        // list_reduce): mean, then lag-1 num/den around it
        val mean = pts.foldLeft(0.0)(_ + _.demand) / n
        val phi =
          if (n == 1) 0.0
          else {
            var num = 0.0; var den = 0.0; var i = 1
            while (i < n) {
              num += (pts(i).demand - mean) * (pts(i - 1).demand - mean)
              den += (pts(i - 1).demand - mean) * (pts(i - 1).demand - mean)
              i += 1
            }
            if (den == 0.0) 0.0 else num / den
          }
        // Holt linear exponential smoothing (Holt 1957; Hyndman &
        // Athanasopoulos, "Forecasting: Principles and Practice" — public
        // literature): level/trend recursion with fixed α=0.5, β=0.3, FPP
        // initialization l₁=y₁, b₁=y₂−y₁. ONE ascending-t fold computes
        // the final (level, trend) AND the squared one-step residuals —
        // the oracle replays it as a struct-state list_reduce, so every
        // intermediate double matches bitwise. Constants are decimal
        // LITERALS on both sides (0.7 written out, never 1−0.3 — the two
        // differ in the last ulp as doubles).
        val holt =
          if (model != "holt") (0.0, 0.0, 0.0)
          else if (n == 1) (pts.head.demand, 0.0, 0.0)
          else {
            var l = pts.head.demand
            var b = pts(1).demand - pts.head.demand
            var acc = 0.0
            var i = 1
            while (i < n) {
              val yi = pts(i).demand
              val e = yi - (l + b)
              acc += e * e
              val ln = 0.5 * yi + 0.5 * (l + b)
              val bn = 0.3 * (ln - l) + 0.7 * b
              l = ln; b = bn; i += 1
            }
            (l, b, acc / (n - 1).toDouble)
          }
        // Additive Holt-Winters (level + trend + season, ETS(A,A,A) shape;
        // Winters 1960; FPP §7.3 — public literature) with fixed α=0.5,
        // β=0.3, γ=0.2 and season length m = [[SeasonLen]] buckets. FPP
        // initialization over the first two seasons: l_m = mean(y_1..y_m),
        // b_m = (mean(y_{m+1}..y_{2m}) − l_m)/m, s_i = y_i − l_m for
        // i ≤ m. ONE ascending-t recursion from t = m+1 carries
        // (l, b, seasonal list, Σe²); the oracle replays it as a recursive
        // CTE whose state row carries the SAME columns (the seasonal list
        // rides along as a LIST column), so every intermediate double is
        // bitwise-identical cross-engine. Series shorter than two seasons
        // cannot initialize and emit NO forecast rows (mirrored by the
        // oracle's n >= 2m filter). Complement literals are written out
        // (0.5/0.7/0.8), never 1−α — the two differ in the last ulp.
        val hw: (Double, Double, Array[Double], Double) =
          if (model != "hw" || n < 2 * SeasonLen) null
          else {
            var sum1 = 0.0; var i = 0
            while (i < SeasonLen) { sum1 += pts(i).demand; i += 1 }
            val l0 = sum1 / SeasonLen.toDouble
            var sum2 = 0.0
            while (i < 2 * SeasonLen) { sum2 += pts(i).demand; i += 1 }
            val b0 = (sum2 / SeasonLen.toDouble - l0) / SeasonLen.toDouble
            val sl = Array.ofDim[Double](n)
            i = 0
            while (i < SeasonLen) { sl(i) = pts(i).demand - l0; i += 1 }
            var l = l0; var b = b0; var acc = 0.0
            var t = SeasonLen
            while (t < n) {
              val y = pts(t).demand
              val sPrev = sl(t - SeasonLen)
              val e = y - (l + b + sPrev)
              acc += e * e
              val ln = 0.5 * (y - sPrev) + 0.5 * (l + b)
              val bn = 0.3 * (ln - l) + 0.7 * b
              val sn = 0.2 * (y - (l + b)) + 0.8 * sPrev
              sl(t) = sn; l = ln; b = bn; t += 1
            }
            (l, b, sl, acc / (n - SeasonLen).toDouble)
          }
        // Theta method in its SES-with-drift equivalence (Assimakopoulos &
        // Nikolopoulos 2000; Hyndman & Billah 2003, "Unmasking the Theta
        // method" — public literature), θ = 2, fixed α = 0.5:
        // ŷ_{T+h} = ℓ_T + (h − 1 + 1/α − (1−α)^T/α)·(b̂/2) where ℓ_T is the
        // SES level and b̂ the OLS slope of y on t = 0..n−1. ONE ascending-t
        // fold carries (ℓ, Σy, Σt·y, Σe², (1−α)^t); Σt and Σt² come from
        // the exact closed forms (integral for n < 2^26, so no fold
        // needed). The oracle replays the fold as a recursive CTE with the
        // SAME state columns, so every intermediate double is
        // bitwise-identical cross-engine; 0.5 is a decimal literal on both
        // sides (never 1−α).
        // State: (level, bls, pow05n = (1−α)^n, σ²)
        val theta: (Double, Double, Double, Double) =
          if (model != "theta") (0.0, 0.0, 0.0, 0.0)
          else if (n == 1) (pts.head.demand, 0.0, 0.5, 0.0)
          else {
            var l = pts.head.demand
            var sy = pts.head.demand
            var sty = 0.0
            var acc = 0.0
            var pp = 0.5
            var i = 1
            while (i < n) {
              val yi = pts(i).demand
              val e = yi - l
              acc += e * e
              l = 0.5 * yi + 0.5 * l
              sy += yi
              sty += i.toDouble * yi
              pp *= 0.5
              i += 1
            }
            val nD = n.toDouble
            val stD = (nD - 1.0) * nD / 2.0
            val sttD = (nD - 1.0) * nD * (2.0 * nD - 1.0) / 6.0
            val bls = (nD * sty - stD * sy) / (nD * sttD - stD * stD)
            (l, bls, pp, acc / (n - 1).toDouble)
          }
        // Local-level Kalman filter (Harvey 1989; Durbin & Koopman 2012,
        // "Time Series Analysis by State Space Methods" — public
        // literature): state y_t = l_t + ε, l_t = l_{t-1} + η with fixed
        // q = Var(η) = 0.1, r = Var(ε) = 1.0 (a signal-to-noise RATIO —
        // the innovation variance is estimated from the data as σ² below,
        // so only q/r matters, not their absolute scale). ONE ascending-t
        // recursion carries (l, P, Σe²): P_pred = P + q,
        // K = P_pred/(P_pred + r), l += K·e, P = (1 − K)·P_pred — the
        // oracle replays it as a recursive CTE recomputing P_pred and K
        // inline per step, so every intermediate double matches bitwise.
        // State: (level l_n, posterior variance P_n, σ²)
        val kal: (Double, Double, Double) =
          if (model != "kalman") (0.0, 0.0, 0.0)
          else if (n == 1) (pts.head.demand, 1.0, 0.0)
          else {
            var l = pts.head.demand
            var p = 1.0
            var acc = 0.0
            var i = 1
            while (i < n) {
              val pp = p + 0.1
              val kg = pp / (pp + 1.0)
              val e = pts(i).demand - l
              acc += e * e
              l = l + kg * e
              p = (1.0 - kg) * pp
              i += 1
            }
            (l, p, acc / (n - 1).toDouble)
          }
        // one-step residual variance of the chosen model's in-sample fit:
        // n-1 residuals, ascending-t fold, σ² = Σe²/(n-1)
        val s2 =
          if (model == "hw") (if (hw == null) 0.0 else hw._4)
          else if (model == "holt") holt._3
          else if (model == "theta") theta._4
          else if (model == "kalman") kal._3
          else if (n == 1) 0.0
          else {
            var acc = 0.0; var i = 1
            while (i < n) {
              val e = model match {
                case "naive" => pts(i).demand - pts(i - 1).demand
                case "drift" => pts(i).demand - pts(i - 1).demand - slope
                case "ar1" =>
                  pts(i).demand - (mean + phi * (pts(i - 1).demand - mean))
              }
              acc += e * e; i += 1
            }
            acc / (n - 1).toDouble
          }
        if (model == "hw" && hw == null) Iterator.empty
        else (1 to horizon).iterator.map { h =>
          val ts = new java.sql.Timestamp(lastP.bucket_ts.getTime + h * BucketSeconds * 1000L)
          val (v, varScale) = model match {
            case "naive" => (lastP.demand, h.toDouble)
            case "drift" => (lastP.demand + h * slope, h.toDouble)
            case "ar1" =>
              // phi^h by left-fold multiplication (== the oracle's ordered
              // list_reduce product — pow() is NOT bit-stable cross-engine);
              // varScale g_h = Σ_{j=0}^{h-1} φ^{2j} via the recurrence
              // g_1 = 1, g = 1 + φ²·g — the same ordered fold the oracle runs
              var p = phi; var i = 1
              while (i < h) { p *= phi; i += 1 }
              val phi2 = phi * phi
              var g = 1.0; var j = 1
              while (j < h) { g = 1.0 + phi2 * g; j += 1 }
              (mean + p * (lastP.demand - mean), g)
            case "holt" =>
              // h-step variance scale for additive Holt (FPP §7.5 / state
              // space ETS(A,A,N)): g_h = 1 + Σ_{j=1}^{h-1} (α + j·α·β)²,
              // folded in ascending j — the oracle replays the same fold
              var g = 1.0; var j = 1
              while (j < h) {
                val c = 0.5 + j.toDouble * 0.5 * 0.3
                g += c * c; j += 1
              }
              (holt._1 + h * holt._2, g)
            case "theta" =>
              // SES h-step variance scale g_h = 1 + (h−1)·α² (the theta
              // drift is a deterministic trend, so it adds no variance)
              (theta._1 +
                (h.toDouble - 1.0 + 2.0 - theta._3 * 2.0) * (theta._2 * 0.5),
                1.0 + (h.toDouble - 1.0) * 0.5 * 0.5)
            case "hw" =>
              // ŷ_h = l + h·b + s_{n+h−m} (h ≤ m reads the last season's
              // smoothed values); ETS(A,A,A) h-step variance scale
              // g_h = 1 + Σ_{j<h} (α + jαβ + γ·1[j ≡ 0 mod m])², folded
              // ascending j — the seasonal indicator is inert for
              // h ≤ m but written on both engines for the general form
              var g = 1.0; var j = 1
              while (j < h) {
                val c = 0.5 + j.toDouble * 0.5 * 0.3 +
                  (if (j % SeasonLen == 0) 0.2 else 0.0)
                g += c * c; j += 1
              }
              (hw._1 + h * hw._2 + hw._3(n - SeasonLen + h - 1), g)
            case "kalman" =>
              // flat level forecast; h-step predictive variance ratio
              // (P_n + h·q + r)/(P_n + q + r) — the filter's own forecast
              // variance P_n + h·q + r normalized by its one-step value so
              // the σ²·varScale convention matches the other models (σ² IS
              // the measured one-step innovation variance)
              (kal._1,
                (kal._2 + h.toDouble * 0.1 + 1.0) / (kal._2 + 0.1 + 1.0))
          }
          val halfw = z * math.sqrt(s2 * varScale)
          ForecastRow(uid, ts, v, v - halfw, v + halfw)
        }
      }
      .toDF()
  }

  private def forecastKernel(model: String)(s: SparkSession, d: String): DataFrame =
    forecast(series(s, d), model)

  /** M3+M5: per-series seasonal-naive forecast with model intervals
    * (random-walk h-step variance σ²·h from the one-step differences).
    */
  val m5: GraftQuery = GraftQuery(
    "m5_forecast_naive",
    forecastKernel("naive"),
    Some(s"""WITH base AS (
           |  SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS b,
           |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand
           |  FROM events GROUP BY 1, 2),
           |ser AS (SELECT user_id, list(demand ORDER BY b) AS y, max(b) AS last_b,
           |        CAST(count(*) AS INT) AS n FROM base GROUP BY 1),
           |sg AS (SELECT user_id, last_b, y[n] AS last_d,
           |  CASE WHEN n > 1 THEN list_reduce(list_prepend(0.0, list_transform(generate_series(2, n),
           |    i -> (y[i] - y[i-1]) * (y[i] - y[i-1]))), (acc, v) -> acc + v) / (n - 1)
           |    ELSE 0.0 END AS s2
           |  FROM ser)
           |SELECT user_id, last_b + h * INTERVAL '5 minutes' AS forecast_timestamp,
           |       last_d AS forecast_value,
           |       last_d - $Z90 * sqrt(s2 * h) AS lo,
           |       last_d + $Z90 * sqrt(s2 * h) AS hi
           |FROM sg CROSS JOIN generate_series(1, 12) t(h)""".stripMargin))

  /** M6: TimesFM-shaped surface, drift model — same output schema, different
    * method (part3:649-675 signature parity).
    */
  val m6: GraftQuery = GraftQuery(
    "m6_forecast_drift",
    forecastKernel("drift"),
    Some(s"""WITH base AS (
           |  SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS b,
           |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand
           |  FROM events GROUP BY 1, 2),
           |ser AS (SELECT user_id, list(demand ORDER BY b) AS y, max(b) AS last_b,
           |        CAST(count(*) AS INT) AS n FROM base GROUP BY 1),
           |sl AS (SELECT user_id, last_b, n, y, y[n] AS last_d,
           |       CASE WHEN n = 1 THEN 0.0 ELSE (y[n] - y[1]) / CAST(n - 1 AS DOUBLE) END AS slope FROM ser),
           |sg AS (SELECT user_id, last_b, last_d, slope,
           |  CASE WHEN n > 1 THEN list_reduce(list_prepend(0.0, list_transform(generate_series(2, n),
           |    i -> (y[i] - y[i-1] - slope) * (y[i] - y[i-1] - slope))), (acc, v) -> acc + v) / (n - 1)
           |    ELSE 0.0 END AS s2
           |  FROM sl)
           |SELECT user_id, last_b + h * INTERVAL '5 minutes' AS forecast_timestamp,
           |       last_d + h * slope AS forecast_value,
           |       (last_d + h * slope) - $Z90 * sqrt(s2 * h) AS lo,
           |       (last_d + h * slope) + $Z90 * sqrt(s2 * h) AS hi
           |FROM sg CROSS JOIN generate_series(1, 12) t(h)""".stripMargin))

  /** M7b (beyond reference): AR(1) forecast — mean-reverting exponential
    * decay toward the series mean (yhat_h = mean + phi^h * (last - mean)),
    * the classical autoregressive step up from naive/drift and the
    * stationary half of what ARIMA fits. phi is the lag-1 autocovariance
    * ratio in closed form; every fold (mean, num, den, phi^h) runs in
    * ascending t order, so DuckDB reproduces the coefficients AND the decay
    * powers bit-for-bit (pow() would not be bit-stable — the oracle uses an
    * ordered product fold instead). Same single-shuffle per-series kernel
    * shape as m5/m6.
    */
  val m7: GraftQuery = GraftQuery(
    "m7_forecast_ar1",
    forecastKernel("ar1"),
    Some(s"""WITH base AS (
           |  SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS b,
           |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand
           |  FROM events GROUP BY 1, 2),
           |ser AS (SELECT user_id, list(demand ORDER BY b) AS y, max(b) AS last_b,
           |        CAST(count(*) AS INT) AS n FROM base GROUP BY 1),
           |st AS (SELECT user_id, y, last_b, n,
           |       list_reduce(y, (a, b) -> a + b) / n AS mean FROM ser),
           |ph0 AS (SELECT user_id, y, n, last_b, mean, y[n] AS last_d,
           |  CASE WHEN n = 1 THEN 0.0 ELSE list_reduce(list_transform(generate_series(2, n),
           |    i -> (y[i] - mean) * (y[i-1] - mean)), (a, b) -> a + b) END AS num,
           |  CASE WHEN n = 1 THEN 0.0 ELSE list_reduce(list_transform(generate_series(2, n),
           |    i -> (y[i-1] - mean) * (y[i-1] - mean)), (a, b) -> a + b) END AS den
           |  FROM st),
           |ph AS (SELECT user_id, y, n, last_b, mean, last_d,
           |       CASE WHEN den = 0.0 THEN 0.0 ELSE num / den END AS phi FROM ph0),
           |s2c AS (SELECT user_id, last_b, mean, last_d, phi,
           |  CASE WHEN n > 1 THEN list_reduce(list_prepend(0.0, list_transform(generate_series(2, n),
           |    i -> (y[i] - (mean + phi * (y[i-1] - mean))) * (y[i] - (mean + phi * (y[i-1] - mean))))),
           |    (acc, v) -> acc + v) / (n - 1) ELSE 0.0 END AS s2
           |  FROM ph),
           |fc AS (SELECT user_id, last_b + h * INTERVAL '5 minutes' AS forecast_timestamp,
           |       mean + list_reduce(list_transform(generate_series(1, h), x -> phi),
           |         (a, b) -> a * b) * (last_d - mean) AS v,
           |       $Z90 * sqrt(s2 * list_reduce(list_prepend(CAST(1 AS DOUBLE),
           |         list_transform(generate_series(1, h - 1), j -> CAST(0 AS DOUBLE))),
           |         (acc, x) -> 1.0 + phi * phi * acc)) AS halfw
           |       FROM s2c CROSS JOIN generate_series(1, 12) t(h))
           |SELECT user_id, forecast_timestamp, v AS forecast_value,
           |       v - halfw AS lo, v + halfw AS hi FROM fc""".stripMargin))

  /** M10 (beyond reference): Holt linear exponential smoothing — the
    * trend-capable member of the exponential-smoothing family (the ETS
    * half of classical forecasting, next to m7's AR half). Level/trend
    * recursion with fixed α=0.5, β=0.3 (see [[forecast]]); forecast
    * ŷ_h = l_n + h·b_n with model intervals from the one-step residual
    * variance scaled by the ETS(A,A,N) h-step factor
    * 1 + Σ_{j<h} (α+jαβ)². The oracle replays the level/trend/residual
    * recursion as a recursive CTE stepping ascending-t, one row of
    * (l, b, Σe²) state per series per step — every intermediate double
    * bitwise-identical cross-engine. (NOT a struct-state list_reduce:
    * DuckDB 1.0 computes chained struct folds with mixed-generation
    * accumulator fields — single steps are right, chains are not.)
    */
  val m10: GraftQuery = GraftQuery(
    "m10_forecast_holt",
    forecastKernel("holt"),
    Some(s"""WITH RECURSIVE base AS (
           |  SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS b,
           |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand
           |  FROM events GROUP BY 1, 2),
           |ser AS (SELECT user_id, list(demand ORDER BY b) AS y, max(b) AS last_b,
           |        CAST(count(*) AS INT) AS n FROM base GROUP BY 1),
           |rec AS (
           |  SELECT user_id, y, n, last_b, 1 AS i, y[1] AS l,
           |         CASE WHEN n = 1 THEN CAST(0 AS DOUBLE) ELSE y[2] - y[1] END AS b,
           |         CAST(0 AS DOUBLE) AS s
           |  FROM ser
           |  UNION ALL
           |  SELECT user_id, y, n, last_b, i + 1,
           |         CAST(0.5 AS DOUBLE) * y[i+1] + CAST(0.5 AS DOUBLE) * (l + b),
           |         CAST(0.3 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * y[i+1]
           |             + CAST(0.5 AS DOUBLE) * (l + b)) - l)
           |           + CAST(0.7 AS DOUBLE) * b,
           |         s + (y[i+1] - (l + b)) * (y[i+1] - (l + b))
           |  FROM rec WHERE i < n),
           |sg AS (SELECT user_id, last_b, l, b,
           |       CASE WHEN n > 1 THEN s / CAST(n - 1 AS DOUBLE)
           |            ELSE CAST(0 AS DOUBLE) END AS s2 FROM rec WHERE i = n),
           |fc AS (SELECT user_id, last_b + h * INTERVAL '5 minutes' AS forecast_timestamp,
           |       l + h * b AS v,
           |       $Z90 * sqrt(s2 * list_reduce(
           |         list_prepend(CAST(1 AS DOUBLE), list_transform(generate_series(1, h - 1),
           |           j -> (CAST(0.5 AS DOUBLE) + (j * CAST(0.5 AS DOUBLE)) * CAST(0.3 AS DOUBLE))
           |              * (CAST(0.5 AS DOUBLE) + (j * CAST(0.5 AS DOUBLE)) * CAST(0.3 AS DOUBLE)))),
           |         (acc, cc) -> acc + cc)) AS halfw
           |       FROM sg CROSS JOIN generate_series(1, 12) t(h))
           |SELECT user_id, forecast_timestamp, v AS forecast_value,
           |       v - halfw AS lo, v + halfw AS hi FROM fc""".stripMargin))

  /** M11 (beyond reference): additive Holt-Winters — the seasonal member
    * of the exponential-smoothing family (ETS(A,A,A) shape), completing
    * the ladder m5 naive → m6 drift → m7 AR(1) → m10 Holt → seasonal.
    * Season = [[SeasonLen]] 5-minute buckets (one hour); FPP two-season
    * initialization, fixed α=0.5 β=0.3 γ=0.2 (see [[forecast]]). The
    * oracle replays the level/trend/season recursion as a recursive CTE
    * whose per-step state row carries the seasonal values as a LIST
    * column (list_append per step — each step reads s_{t−m} from the
    * carried list, exactly as the Scala fold reads its array). Series
    * shorter than two seasons emit no rows on either engine (all sf0.01
    * series are ≥ 49 points, so every series forecasts here).
    *
    * Scale: same single-shuffle per-series kernel as m5–m10 — one
    * groupByKey on the series id, per-series state is one series plus
    * its seasonal array (bounded by series length, not corpus size), and
    * the recursion is one ascending pass. 100-TB posture is identical to
    * m10's (the measured r6 exponent family).
    */
  val m11: GraftQuery = GraftQuery(
    "m11_forecast_holt_winters",
    forecastKernel("hw"),
    Some(s"""WITH RECURSIVE base AS (
           |  SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS b,
           |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand
           |  FROM events GROUP BY 1, 2),
           |ser AS (SELECT user_id, list(demand ORDER BY b) AS y, max(b) AS last_b,
           |        CAST(count(*) AS INT) AS n FROM base GROUP BY 1),
           |el AS (SELECT * FROM ser WHERE n >= 24),
           |i0 AS (SELECT user_id, y, n, last_b,
           |  list_reduce(list_prepend(CAST(0 AS DOUBLE), y[1:12]), (a, v) -> a + v)
           |    / CAST(12 AS DOUBLE) AS l0,
           |  list_reduce(list_prepend(CAST(0 AS DOUBLE), y[13:24]), (a, v) -> a + v)
           |    / CAST(12 AS DOUBLE) AS m2 FROM el),
           |rec AS (
           |  SELECT user_id, y, n, last_b, 12 AS i, l0 AS l,
           |         (m2 - l0) / CAST(12 AS DOUBLE) AS b,
           |         list_transform(y[1:12], v -> v - l0) AS sl,
           |         CAST(0 AS DOUBLE) AS s
           |  FROM i0
           |  UNION ALL
           |  SELECT user_id, y, n, last_b, i + 1,
           |         CAST(0.5 AS DOUBLE) * (y[i+1] - sl[i+1-12]) + CAST(0.5 AS DOUBLE) * (l + b),
           |         CAST(0.3 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * (y[i+1] - sl[i+1-12])
           |             + CAST(0.5 AS DOUBLE) * (l + b)) - l) + CAST(0.7 AS DOUBLE) * b,
           |         list_append(sl, CAST(0.2 AS DOUBLE) * (y[i+1] - (l + b))
           |             + CAST(0.8 AS DOUBLE) * sl[i+1-12]),
           |         s + (y[i+1] - (l + b + sl[i+1-12])) * (y[i+1] - (l + b + sl[i+1-12]))
           |  FROM rec WHERE i < n),
           |sg AS (SELECT user_id, last_b, n, l, b, sl,
           |       s / CAST(n - 12 AS DOUBLE) AS s2 FROM rec WHERE i = n),
           |fc AS (SELECT user_id, last_b + h * INTERVAL '5 minutes' AS forecast_timestamp,
           |       l + h * b + sl[n - 12 + h] AS v,
           |       $Z90 * sqrt(s2 * list_reduce(
           |         list_prepend(CAST(1 AS DOUBLE), list_transform(generate_series(1, h - 1),
           |           j -> (CAST(0.5 AS DOUBLE) + (j * CAST(0.5 AS DOUBLE)) * CAST(0.3 AS DOUBLE)
           |              + CASE WHEN j % 12 = 0 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)
           |              * (CAST(0.5 AS DOUBLE) + (j * CAST(0.5 AS DOUBLE)) * CAST(0.3 AS DOUBLE)
           |              + CASE WHEN j % 12 = 0 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END))),
           |         (acc, cc) -> acc + cc)) AS halfw
           |       FROM sg CROSS JOIN generate_series(1, 12) t(h))
           |SELECT user_id, forecast_timestamp, v AS forecast_value,
           |       v - halfw AS lo, v + halfw AS hi FROM fc""".stripMargin))

  /** M3: ARIMA_PLUS_XREG-shaped model (part3:510-533): hour-of-day seasonal
    * component plus per-series linear regression on a time index AND an
    * exogenous covariate (bucket event count — the XREG), solved in closed
    * form via the 3x3 normal equations (Cramer). Every moment is an exact
    * integer sum or a DECIMAL(28,6) sum, so DuckDB reproduces the
    * coefficients bit-for-bit and the whole model is oracle-checked —
    * BQML internals stay out of scope (SURVEY §7.3), but this delivers the
    * promised seasonality + covariates, deterministically.
    *
    * Scale: two aggregations over the bucketed series (one per (user, hod),
    * one per user) + a 12-row-per-series fan-out — no per-point state, no
    * window wider than the series groupBy; the same shape BQML's
    * CREATE MODEL fan-out has.
    */
  val m3: GraftQuery = GraftQuery(
    "m3_forecast_xreg",
    (s, d) => {
      import s.implicits._
      // the bucketed series feeds three consumers (seasonal means, the
      // moment kernel, and the forecast's seasonal join); recomputing the
      // bucket agg is cheaper than caching it (measured: columnar
      // materialization of the ~series-sized frame costs more than two
      // extra scans at bench scale — at 100 TB a model-fit pipeline would
      // materialize the training frame to storage instead)
      val base = Tables.events(s, d)
        .groupBy(col("user_id"), timestampBucket(col("ts"), BucketSeconds).as("bucket_ts"))
        .agg(decAvg(col("value")).as("demand"), count(lit(1)).as("x"))
      // seasonal means and regression moments accumulate COMPUTED doubles,
      // so they use a bucket-ordered left fold (bit-identical to the
      // oracle's list_reduce) — a plain sum is order-nondeterministic and a
      // decimal cast of a computed double hits the Spark-vs-DuckDB
      // shortest-repr rounding divergence
      val seas = base.groupBy(col("user_id"), hour(col("bucket_ts")).as("hod"))
        .agg(sort_array(collect_list(struct(col("bucket_ts").as("b"),
          col("demand").as("v")))).as("pp"), count(lit(1)).as("cnt"))
        .withColumn("smean",
          expr("aggregate(transform(pp, s -> s.v), 0D, (acc, v) -> acc + v)") / col("cnt"))
        .select("user_id", "hod", "smean")
      // one-pass typed kernel per series: t index from the bucket order,
      // exact integer design-matrix sums, ordered float folds for the rest
      val m = base.withColumn("hod", hour(col("bucket_ts")))
        .join(seas, Seq("user_id", "hod"))
        .withColumn("resid", col("demand") - col("smean"))
        .select("user_id", "bucket_ts", "demand", "x", "resid").as[XregPoint]
        .groupByKey(_.user_id)
        .mapGroups { (uid: Long, it: Iterator[XregPoint]) =>
          val v = it.toArray.sortBy(_.bucket_ts.getTime)
          var stL = 0L; var sttL = 0L; var sxL = 0L; var sxxL = 0L; var stxL = 0L
          var sumD = 0.0; var sy = 0.0; var sty = 0.0; var sxy = 0.0; var srr = 0.0
          var i = 0
          while (i < v.length) {
            val p = v(i); val t = i.toLong
            stL += t; sttL += t * t; sxL += p.x; sxxL += p.x * p.x; stxL += t * p.x
            sumD += p.demand; sy += p.resid
            sty += t.toDouble * p.resid; sxy += p.x.toDouble * p.resid
            srr += p.resid * p.resid
            i += 1
          }
          val n = v.length.toDouble
          XregMoments(uid, v.last.bucket_ts, n, sumD / n, stL.toDouble, sttL.toDouble,
            sxL.toDouble, sxxL.toDouble, stxL.toDouble, sy, sty, sxy, srr)
        }
        .toDF()
      // normal-equation determinants; the formula TEXT matches the oracle so
      // both engines evaluate the identical IEEE expression tree
      val coef = m.selectExpr("user_id", "last_b", "n", "umean", "st", "stt",
          "sx", "sxx", "stx", "sy", "sty", "sxy", "srr",
          "n * (stt * sxx - stx * stx) - st * (st * sxx - stx * sx) + sx * (st * stx - stt * sx) AS det",
          "sy * (stt * sxx - stx * stx) - st * (sty * sxx - stx * sxy) + sx * (sty * stx - stt * sxy) AS det_a",
          "n * (sty * sxx - stx * sxy) - sy * (st * sxx - stx * sx) + sx * (st * sxy - sty * sx) AS det_b",
          "n * (stt * sxy - sty * stx) - st * (st * sxy - sty * sx) + sy * (st * stx - stt * sx) AS det_c",
          "n * stt - st * st AS den2",
          "n * sty - st * sy AS num2")
        .selectExpr("user_id", "last_b", "n", "umean", "st", "stt", "sx",
          "sxx", "stx", "sy", "sty", "sxy", "srr", "sx / n AS xbar",
          "CASE WHEN det <> 0.0 THEN det_a / det WHEN den2 <> 0.0 THEN (sy - (num2 / den2) * st) / n ELSE sy / n END AS ca",
          "CASE WHEN det <> 0.0 THEN det_b / det WHEN den2 <> 0.0 THEN num2 / den2 ELSE 0.0 END AS cb",
          "CASE WHEN det <> 0.0 THEN det_c / det ELSE 0.0 END AS cc")
        // in-sample residual variance of the fitted model, expanded from the
        // same moments (SSE = Σ(r - a - b·t - c·x)² in quadratic form) — no
        // second pass over the points; greatest(...) guards the tiny
        // negative SSE float cancellation can produce
        .selectExpr("user_id", "last_b", "n", "umean", "xbar", "ca", "cb", "cc",
          "CASE WHEN n > 1 THEN greatest(srr - 2 * (ca * sy + cb * sty + cc * sxy) + ca * ca * n + 2 * ca * cb * st + 2 * ca * cc * sx + cb * cb * stt + 2 * cb * cc * stx + cc * cc * sxx, 0.0) / n ELSE 0.0 END AS s2")
      coef
        .select(col("user_id"), col("last_b"), col("n"), col("umean"), col("xbar"),
          col("ca"), col("cb"), col("cc"), col("s2"),
          explode(sequence(lit(1), lit(Horizon))).as("h"))
        .withColumn("forecast_timestamp",
          expr(s"timestampadd(SECOND, h * $BucketSeconds, last_b)"))
        .withColumn("hod", hour(col("forecast_timestamp")))
        .join(seas, Seq("user_id", "hod"), "left")
        .withColumn("forecast_value",
          coalesce(col("smean"), col("umean")) + col("ca") +
            col("cb") * (col("n") - 1 + col("h")) + col("cc") * col("xbar"))
        .select(col("user_id"), col("forecast_timestamp"), col("forecast_value"),
          expr(s"forecast_value - $Z90 * sqrt(s2 * h)").as("lo"),
          expr(s"forecast_value + $Z90 * sqrt(s2 * h)").as("hi"))
    },
    Some(s"""WITH base AS (SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS b,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand,
           |  count(*) AS x FROM events GROUP BY 1, 2),
           |seas AS (SELECT user_id, hour(b) AS hod,
           |  list_reduce(list_transform(list(struct_pack(b := b, v := demand) ORDER BY b),
           |    s -> s.v), (acc, v) -> acc + v) / count(*) AS smean
           |  FROM base GROUP BY 1, 2),
           |idx AS (SELECT base.*, s.smean, demand - s.smean AS resid,
           |  row_number() OVER (PARTITION BY base.user_id ORDER BY b) - 1 AS t
           |  FROM base JOIN seas s ON base.user_id = s.user_id AND hour(base.b) = s.hod),
           |m0 AS (SELECT user_id,
           |  CAST(count(*) AS DOUBLE) AS n, max(b) AS last_b,
           |  CAST(sum(t) AS DOUBLE) AS st, CAST(sum(t*t) AS DOUBLE) AS stt,
           |  CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(x*x) AS DOUBLE) AS sxx,
           |  CAST(sum(t*x) AS DOUBLE) AS stx,
           |  list(struct_pack(t := t, r := resid, xx := x, dm := demand) ORDER BY t) AS l
           |  FROM idx GROUP BY 1),
           |m AS (SELECT user_id, n, last_b, st, stt, sx, sxx, stx,
           |  list_reduce(list_transform(l, s -> s.dm), (acc, v) -> acc + v) / n AS umean,
           |  list_reduce(list_transform(l, s -> s.r), (acc, v) -> acc + v) AS sy,
           |  list_reduce(list_transform(l, s -> s.t * s.r), (acc, v) -> acc + v) AS sty,
           |  list_reduce(list_transform(l, s -> s.xx * s.r), (acc, v) -> acc + v) AS sxy,
           |  list_reduce(list_transform(l, s -> s.r * s.r), (acc, v) -> acc + v) AS srr
           |  FROM m0),
           |dets AS (SELECT *,
           |  n * (stt * sxx - stx * stx) - st * (st * sxx - stx * sx) + sx * (st * stx - stt * sx) AS det,
           |  sy * (stt * sxx - stx * stx) - st * (sty * sxx - stx * sxy) + sx * (sty * stx - stt * sxy) AS det_a,
           |  n * (sty * sxx - stx * sxy) - sy * (st * sxx - stx * sx) + sx * (st * sxy - sty * sx) AS det_b,
           |  n * (stt * sxy - sty * stx) - st * (st * sxy - sty * sx) + sy * (st * stx - stt * sx) AS det_c,
           |  n * stt - st * st AS den2, n * sty - st * sy AS num2 FROM m),
           |coef AS (SELECT user_id, last_b, n, umean, st, stt, sx, sxx, stx, sy, sty, sxy, srr, sx / n AS xbar,
           |  CASE WHEN det <> 0.0 THEN det_a / det WHEN den2 <> 0.0 THEN (sy - (num2 / den2) * st) / n ELSE sy / n END AS ca,
           |  CASE WHEN det <> 0.0 THEN det_b / det WHEN den2 <> 0.0 THEN num2 / den2 ELSE 0.0 END AS cb,
           |  CASE WHEN det <> 0.0 THEN det_c / det ELSE 0.0 END AS cc FROM dets),
           |cs2 AS (SELECT user_id, last_b, n, umean, xbar, ca, cb, cc,
           |  CASE WHEN n > 1 THEN greatest(srr - 2 * (ca * sy + cb * sty + cc * sxy) + ca * ca * n + 2 * ca * cb * st + 2 * ca * cc * sx + cb * cb * stt + 2 * cb * cc * stx + cc * cc * sxx, 0.0) / n ELSE 0.0 END AS s2
           |  FROM coef),
           |fr AS (SELECT c.*, t.h, last_b + h * INTERVAL '5 minutes' AS forecast_timestamp
           |  FROM cs2 c CROSS JOIN generate_series(1, 12) t(h)),
           |fv AS (SELECT fr.user_id, fr.forecast_timestamp, fr.s2, fr.h,
           |  COALESCE(s.smean, fr.umean) + fr.ca + fr.cb * (fr.n - 1 + fr.h) + fr.cc * fr.xbar AS forecast_value
           |  FROM fr LEFT JOIN seas s ON fr.user_id = s.user_id AND hour(fr.forecast_timestamp) = s.hod)
           |SELECT user_id, forecast_timestamp, forecast_value,
           |  forecast_value - $Z90 * sqrt(s2 * h) AS lo,
           |  forecast_value + $Z90 * sqrt(s2 * h) AS hi FROM fv""".stripMargin))

  /** M3b: ARIMA_PLUS_XREG with a holiday regressor — the reference trains
    * with `HOLIDAY_REGION='US'` (part3:524); here the [[UsHolidays]] literal
    * dim broadcast-joins onto the bucketed series as a 0/1 covariate g, and
    * the per-series model grows to four regressors (1, t, x, g) solved by
    * 4x4 Cramer. The determinant text is GENERATED ONCE ([[det4s]]) and
    * spliced into both engines, so the solve stays bit-exact; when a series
    * saw no holiday (g constant 0 => singular matrix) the coefficient CASE
    * chain falls back to m3's 3x3 solve with holiday_coef = 0. Forecast
    * rows look up the future date in the same calendar, so a forecast
    * landing ON a holiday gets the learned holiday_coef shift. Intervals as
    * in m3: sigma^2 from the moment quadratic form, half-width
    * z(0.9)*sigma*sqrt(h).
    *
    * Scale: identical shape to m3 (two aggregations + 12-row fan-out); the
    * holiday dim is 33 literal rows — a broadcast by construction.
    */
  val m3b: GraftQuery = GraftQuery(
    "m3b_forecast_xreg_holiday",
    (s, d) => {
      import s.implicits._
      val hol = UsHolidays.toDF("hds").select(to_date(col("hds")).as("hd"))
      val base = Tables.events(s, d)
        .groupBy(col("user_id"), timestampBucket(col("ts"), BucketSeconds).as("bucket_ts"))
        .agg(decAvg(col("value")).as("demand"), count(lit(1)).as("x"))
      val bg = base
        .join(broadcast(hol), to_date(col("bucket_ts")) === col("hd"), "left")
        .withColumn("g", when(col("hd").isNotNull, lit(1L)).otherwise(lit(0L)))
        .drop("hd")
      val seas = base.groupBy(col("user_id"), hour(col("bucket_ts")).as("hod"))
        .agg(sort_array(collect_list(struct(col("bucket_ts").as("b"),
          col("demand").as("v")))).as("pp"), count(lit(1)).as("cnt"))
        .withColumn("smean",
          expr("aggregate(transform(pp, s -> s.v), 0D, (acc, v) -> acc + v)") / col("cnt"))
        .select("user_id", "hod", "smean")
      val m = bg.withColumn("hod", hour(col("bucket_ts")))
        .join(seas, Seq("user_id", "hod"))
        .withColumn("resid", col("demand") - col("smean"))
        .select("user_id", "bucket_ts", "demand", "x", "g", "resid").as[XregHPoint]
        .groupByKey(_.user_id)
        .mapGroups { (uid: Long, it: Iterator[XregHPoint]) =>
          val v = it.toArray.sortBy(_.bucket_ts.getTime)
          var stL = 0L; var sttL = 0L; var sxL = 0L; var sxxL = 0L; var stxL = 0L
          var sgL = 0L; var stgL = 0L; var sxgL = 0L
          var sumD = 0.0; var sy = 0.0; var sty = 0.0; var sxy = 0.0
          var sgy = 0.0; var srr = 0.0
          var i = 0
          while (i < v.length) {
            val p = v(i); val t = i.toLong
            stL += t; sttL += t * t; sxL += p.x; sxxL += p.x * p.x; stxL += t * p.x
            sgL += p.g; stgL += t * p.g; sxgL += p.x * p.g
            sumD += p.demand; sy += p.resid
            sty += t.toDouble * p.resid; sxy += p.x.toDouble * p.resid
            sgy += p.g.toDouble * p.resid; srr += p.resid * p.resid
            i += 1
          }
          val n = v.length.toDouble
          // sgg = Σg² = Σg exactly, because g ∈ {0,1}
          XregHMoments(uid, v.last.bucket_ts, n, sumD / n, stL.toDouble,
            sttL.toDouble, sxL.toDouble, sxxL.toDouble, stxL.toDouble,
            sgL.toDouble, stgL.toDouble, sxgL.toDouble, sgL.toDouble,
            sy, sty, sxy, sgy, srr)
        }
        .toDF()
      val coef = m.selectExpr("user_id", "last_b", "n", "umean", "st", "stt",
          "sx", "sxx", "stx", "sg", "stg", "sxg", "sgg",
          "sy", "sty", "sxy", "sgy", "srr",
          s"$D4 AS d4", s"$D4A AS d4a", s"$D4B AS d4b", s"$D4C AS d4c", s"$D4D AS d4d",
          "n * (stt * sxx - stx * stx) - st * (st * sxx - stx * sx) + sx * (st * stx - stt * sx) AS det",
          "sy * (stt * sxx - stx * stx) - st * (sty * sxx - stx * sxy) + sx * (sty * stx - stt * sxy) AS det_a",
          "n * (sty * sxx - stx * sxy) - sy * (st * sxx - stx * sx) + sx * (st * sxy - sty * sx) AS det_b",
          "n * (stt * sxy - sty * stx) - st * (st * sxy - sty * sx) + sy * (st * stx - stt * sx) AS det_c",
          "n * stt - st * st AS den2",
          "n * sty - st * sy AS num2")
        .selectExpr("user_id", "last_b", "n", "umean", "st", "stt", "sx",
          "sxx", "stx", "sg", "stg", "sxg", "sgg", "sy", "sty", "sxy", "sgy",
          "srr", "sx / n AS xbar",
          "CASE WHEN d4 <> 0.0 THEN d4a / d4 WHEN det <> 0.0 THEN det_a / det WHEN den2 <> 0.0 THEN (sy - (num2 / den2) * st) / n ELSE sy / n END AS ca",
          "CASE WHEN d4 <> 0.0 THEN d4b / d4 WHEN det <> 0.0 THEN det_b / det WHEN den2 <> 0.0 THEN num2 / den2 ELSE 0.0 END AS cb",
          "CASE WHEN d4 <> 0.0 THEN d4c / d4 WHEN det <> 0.0 THEN det_c / det ELSE 0.0 END AS cc",
          "CASE WHEN d4 <> 0.0 THEN d4d / d4 ELSE 0.0 END AS cd")
        .selectExpr("user_id", "last_b", "n", "umean", "xbar", "ca", "cb", "cc", "cd",
          "CASE WHEN n > 1 THEN greatest(srr - 2 * (ca * sy + cb * sty + cc * sxy + cd * sgy) + ca * ca * n + 2 * ca * cb * st + 2 * ca * cc * sx + 2 * ca * cd * sg + cb * cb * stt + 2 * cb * cc * stx + 2 * cb * cd * stg + cc * cc * sxx + 2 * cc * cd * sxg + cd * cd * sgg, 0.0) / n ELSE 0.0 END AS s2")
      coef
        .select(col("user_id"), col("last_b"), col("n"), col("umean"), col("xbar"),
          col("ca"), col("cb"), col("cc"), col("cd"), col("s2"),
          explode(sequence(lit(1), lit(Horizon))).as("h"))
        .withColumn("forecast_timestamp",
          expr(s"timestampadd(SECOND, h * $BucketSeconds, last_b)"))
        .withColumn("hod", hour(col("forecast_timestamp")))
        .join(seas, Seq("user_id", "hod"), "left")
        .join(broadcast(hol), to_date(col("forecast_timestamp")) === col("hd"), "left")
        .withColumn("gf", when(col("hd").isNotNull, lit(1L)).otherwise(lit(0L)))
        .withColumn("forecast_value",
          coalesce(col("smean"), col("umean")) + col("ca") +
            col("cb") * (col("n") - 1 + col("h")) + col("cc") * col("xbar") +
            col("cd") * col("gf"))
        .select(col("user_id"), col("forecast_timestamp"), col("forecast_value"),
          expr(s"forecast_value - $Z90 * sqrt(s2 * h)").as("lo"),
          expr(s"forecast_value + $Z90 * sqrt(s2 * h)").as("hi"),
          col("cd").as("holiday_coef"))
    },
    Some(s"""WITH hol AS (SELECT CAST(x AS DATE) AS hd FROM (VALUES ${UsHolidays.map(dt => s"('$dt')").mkString(", ")}) t(x)),
           |base AS (SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS b,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand,
           |  count(*) AS x FROM events GROUP BY 1, 2),
           |bg AS (SELECT base.*, CASE WHEN h.hd IS NOT NULL THEN 1 ELSE 0 END AS g
           |  FROM base LEFT JOIN hol h ON CAST(base.b AS DATE) = h.hd),
           |seas AS (SELECT user_id, hour(b) AS hod,
           |  list_reduce(list_transform(list(struct_pack(b := b, v := demand) ORDER BY b),
           |    s -> s.v), (acc, v) -> acc + v) / count(*) AS smean
           |  FROM base GROUP BY 1, 2),
           |idx AS (SELECT bg.*, s.smean, demand - s.smean AS resid,
           |  row_number() OVER (PARTITION BY bg.user_id ORDER BY b) - 1 AS t
           |  FROM bg JOIN seas s ON bg.user_id = s.user_id AND hour(bg.b) = s.hod),
           |m0 AS (SELECT user_id,
           |  CAST(count(*) AS DOUBLE) AS n, max(b) AS last_b,
           |  CAST(sum(t) AS DOUBLE) AS st, CAST(sum(t*t) AS DOUBLE) AS stt,
           |  CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(x*x) AS DOUBLE) AS sxx,
           |  CAST(sum(t*x) AS DOUBLE) AS stx,
           |  CAST(sum(g) AS DOUBLE) AS sg, CAST(sum(t*g) AS DOUBLE) AS stg,
           |  CAST(sum(x*g) AS DOUBLE) AS sxg, CAST(sum(g) AS DOUBLE) AS sgg,
           |  list(struct_pack(t := t, r := resid, xx := x, gg := g, dm := demand) ORDER BY t) AS l
           |  FROM idx GROUP BY 1),
           |m AS (SELECT user_id, n, last_b, st, stt, sx, sxx, stx, sg, stg, sxg, sgg,
           |  list_reduce(list_transform(l, s -> s.dm), (acc, v) -> acc + v) / n AS umean,
           |  list_reduce(list_transform(l, s -> s.r), (acc, v) -> acc + v) AS sy,
           |  list_reduce(list_transform(l, s -> s.t * s.r), (acc, v) -> acc + v) AS sty,
           |  list_reduce(list_transform(l, s -> s.xx * s.r), (acc, v) -> acc + v) AS sxy,
           |  list_reduce(list_transform(l, s -> s.gg * s.r), (acc, v) -> acc + v) AS sgy,
           |  list_reduce(list_transform(l, s -> s.r * s.r), (acc, v) -> acc + v) AS srr
           |  FROM m0),
           |dets AS (SELECT *,
           |  $D4 AS d4, $D4A AS d4a, $D4B AS d4b, $D4C AS d4c, $D4D AS d4d,
           |  n * (stt * sxx - stx * stx) - st * (st * sxx - stx * sx) + sx * (st * stx - stt * sx) AS det,
           |  sy * (stt * sxx - stx * stx) - st * (sty * sxx - stx * sxy) + sx * (sty * stx - stt * sxy) AS det_a,
           |  n * (sty * sxx - stx * sxy) - sy * (st * sxx - stx * sx) + sx * (st * sxy - sty * sx) AS det_b,
           |  n * (stt * sxy - sty * stx) - st * (st * sxy - sty * sx) + sy * (st * stx - stt * sx) AS det_c,
           |  n * stt - st * st AS den2, n * sty - st * sy AS num2 FROM m),
           |coef AS (SELECT user_id, last_b, n, umean, st, stt, sx, sxx, stx, sg, stg, sxg, sgg, sy, sty, sxy, sgy, srr, sx / n AS xbar,
           |  CASE WHEN d4 <> 0.0 THEN d4a / d4 WHEN det <> 0.0 THEN det_a / det WHEN den2 <> 0.0 THEN (sy - (num2 / den2) * st) / n ELSE sy / n END AS ca,
           |  CASE WHEN d4 <> 0.0 THEN d4b / d4 WHEN det <> 0.0 THEN det_b / det WHEN den2 <> 0.0 THEN num2 / den2 ELSE 0.0 END AS cb,
           |  CASE WHEN d4 <> 0.0 THEN d4c / d4 WHEN det <> 0.0 THEN det_c / det ELSE 0.0 END AS cc,
           |  CASE WHEN d4 <> 0.0 THEN d4d / d4 ELSE 0.0 END AS cd FROM dets),
           |cs2 AS (SELECT user_id, last_b, n, umean, xbar, ca, cb, cc, cd,
           |  CASE WHEN n > 1 THEN greatest(srr - 2 * (ca * sy + cb * sty + cc * sxy + cd * sgy) + ca * ca * n + 2 * ca * cb * st + 2 * ca * cc * sx + 2 * ca * cd * sg + cb * cb * stt + 2 * cb * cc * stx + 2 * cb * cd * stg + cc * cc * sxx + 2 * cc * cd * sxg + cd * cd * sgg, 0.0) / n ELSE 0.0 END AS s2
           |  FROM coef),
           |fr AS (SELECT c.*, t.h, last_b + h * INTERVAL '5 minutes' AS forecast_timestamp
           |  FROM cs2 c CROSS JOIN generate_series(1, 12) t(h)),
           |fv AS (SELECT fr.user_id, fr.forecast_timestamp, fr.s2, fr.h, fr.cd,
           |  COALESCE(s.smean, fr.umean) + fr.ca + fr.cb * (fr.n - 1 + fr.h) + fr.cc * fr.xbar + fr.cd * (CASE WHEN hh.hd IS NOT NULL THEN 1 ELSE 0 END) AS forecast_value
           |  FROM fr LEFT JOIN seas s ON fr.user_id = s.user_id AND hour(fr.forecast_timestamp) = s.hod
           |  LEFT JOIN hol hh ON CAST(fr.forecast_timestamp AS DATE) = hh.hd)
           |SELECT user_id, forecast_timestamp, forecast_value,
           |  forecast_value - $Z90 * sqrt(s2 * h) AS lo,
           |  forecast_value + $Z90 * sqrt(s2 * h) AS hi,
           |  cd AS holiday_coef FROM fv""".stripMargin))

  /** M4b: held-out evaluation (the reference evaluates on a fixed held-out
    * December window with MAPE et al., part3:436-440, 539-553): per series,
    * train on all but the last 12 buckets, forecast the held-out 12 with
    * all three models (naive, drift, AR(1) — the M7 model-vs-model
    * comparison), report MAE / MAPE / RMSE and cov90 (empirical coverage of
    * the z(0.9) model interval) per (series, model). MAPE averages over
    * non-zero actuals only; the AR(1) interval uses its exact MA-truncation
    * variance scale, naive/drift the random-walk sqrt(h).
    */
  val m4b: GraftQuery = GraftQuery(
    "m4b_holdout_eval",
    (s, d) => {
      // one partition pass: the rank, the series length, and both train
      // endpoints (newest train point = rank 13 descending, oldest = rank
      // n) come from window aggregates over the SAME user partition — no
      // separate train aggregation, no join, no second shuffle
      val byUser = Window.partitionBy("user_id")
      // pin the window exchange with an explicit per-series repartition:
      // the windowed fold chain below is CPU-bound (O(n_train) array folds
      // per output row), and AQE's byte-based coalescing would otherwise
      // collapse the few-MB shuffle onto ONE task and serialize all of it
      // (guide §2.5 — partition count must follow compute, not bytes, when
      // per-row work dominates). Partition count = defaultParallelism:
      // scale-adaptive, never a local constant; same Exchange count as the
      // ENSURE_REQUIREMENTS exchange it replaces.
      val ev = series(s, d)
        .repartition(s.sparkContext.defaultParallelism, col("user_id"))
        .withColumn("rdesc", row_number().over(byUser.orderBy(col("bucket_ts").desc)))
        .withColumn("n_total", count(lit(1)).over(byUser))
        .withColumn("last_demand",
          max(when(col("rdesc") === Horizon + 1, col("demand"))).over(byUser))
        .withColumn("first_demand",
          max(when(col("rdesc") === col("n_total"), col("demand"))).over(byUser))
        // train-side one-step residuals for the interval model: e_t =
        // y_t - y_{t-1} over TRAIN rows only (train rows are the b-ascending
        // prefix, so a train row's lag is always another train row), folded
        // in b order for the cross-engine bit-exactness contract
        .withColumn("prev", lag("demand", 1).over(byUser.orderBy("bucket_ts")))
        .withColumn("tre", when(col("rdesc") > Horizon && col("prev").isNotNull,
          struct(col("bucket_ts").as("b"), (col("demand") - col("prev")).as("e"))))
        .withColumn("trl", sort_array(collect_list("tre").over(byUser)))
        // the full train series (b-ordered values) feeds the AR(1) fit —
        // mean, lag-1 autocovariance ratio, residual variance — all as
        // ordered folds over the same collected list the oracle replays
        .withColumn("tdd", when(col("rdesc") > Horizon,
          struct(col("bucket_ts").as("b"), col("demand").as("d"))))
        .withColumn("trd", sort_array(collect_list("tdd").over(byUser)))
        .filter(col("n_total") > Horizon && col("rdesc") <= Horizon)
        .withColumn("n_train", col("n_total") - Horizon)
        .withColumn("trd_n", col("n_train").cast("int"))
        .withColumn("slope", when(col("n_train") === 1, lit(0.0))
          .otherwise((col("last_demand") - col("first_demand")) /
            (col("n_train") - 1).cast("double")))
        .withColumn("n_res", (col("n_train") - 1).cast("double"))
        .withColumn("s2n", when(col("n_train") > 1,
          expr("aggregate(transform(trl, s -> s.e * s.e), 0D, (acc, v) -> acc + v)") /
            col("n_res")).otherwise(lit(0.0)))
        .withColumn("s2d", when(col("n_train") > 1,
          expr("aggregate(transform(trl, s -> (s.e - slope) * (s.e - slope)), 0D, (acc, v) -> acc + v)") /
            col("n_res")).otherwise(lit(0.0)))
        .withColumn("tmean",
          expr("aggregate(transform(trd, s -> s.d), 0D, (acc, v) -> acc + v)") /
            col("n_train"))
        .withColumn("lastd", expr("element_at(trd, trd_n).d"))
        .withColumn("arnum", when(col("n_train") > 1,
          expr("aggregate(transform(sequence(2, trd_n), i -> (element_at(trd, i).d - tmean) * (element_at(trd, i - 1).d - tmean)), 0D, (acc, v) -> acc + v)"))
          .otherwise(lit(0.0)))
        .withColumn("arden", when(col("n_train") > 1,
          expr("aggregate(transform(sequence(2, trd_n), i -> (element_at(trd, i - 1).d - tmean) * (element_at(trd, i - 1).d - tmean)), 0D, (acc, v) -> acc + v)"))
          .otherwise(lit(0.0)))
        .withColumn("phi",
          when(col("arden") =!= 0.0, col("arnum") / col("arden")).otherwise(lit(0.0)))
        .withColumn("s2a", when(col("n_train") > 1,
          expr("aggregate(transform(sequence(2, trd_n), i -> (element_at(trd, i).d - (tmean + phi * (element_at(trd, i - 1).d - tmean))) * (element_at(trd, i).d - (tmean + phi * (element_at(trd, i - 1).d - tmean)))), 0D, (acc, v) -> acc + v)") /
            col("n_res")).otherwise(lit(0.0)))
        .withColumn("h", (lit(Horizon + 1) - col("rdesc")).cast("long"))
        // phi^h and the AR(1) variance scale g_h = sum_{j<h} phi^{2j} as
        // per-row ordered folds; Spark's sequence(1, 0) DESCENDS, so the
        // h = 1 case is guarded explicitly (DuckDB's generate_series(1, 0)
        // is empty — the values agree, the guard keeps Spark correct)
        .withColumn("phipow",
          expr("aggregate(transform(sequence(1, CAST(h AS INT)), x -> phi), 1D, (acc, v) -> acc * v)"))
        .withColumn("arvs", when(col("h") === 1, lit(1.0)).otherwise(
          expr("aggregate(transform(sequence(1, CAST(h AS INT) - 1), x -> 0D), 1D, (acc, x) -> 1.0D + phi * phi * acc)")))
      // all three model branches fan out of ONE pass via explode — a
      // unionByName would evaluate the whole windowed subtree per model
      // (Spark does not dedupe shared lineage across union inputs)
      val both = ev.select(col("user_id"), col("h"), col("demand"),
        explode(array(
          struct(lit("naive").as("model"), col("last_demand").as("fv"),
            col("s2n").as("s2"), col("h").cast("double").as("vs")),
          struct(lit("drift").as("model"),
            (col("last_demand") + col("h") * col("slope")).as("fv"),
            col("s2d").as("s2"), col("h").cast("double").as("vs")),
          struct(lit("ar1").as("model"),
            (col("tmean") + col("phipow") * (col("lastd") - col("tmean"))).as("fv"),
            col("s2a").as("s2"), col("arvs").as("vs")))).as("mf"))
        .select(col("user_id"), col("h"), col("demand"),
          col("mf.model").as("model"), col("mf.fv").as("fv"),
          col("mf.s2").as("s2"), col("mf.vs").as("vs"))
        .withColumn("lo", expr(s"fv - $Z90 * sqrt(s2 * vs)"))
        .withColumn("hi", expr(s"fv + $Z90 * sqrt(s2 * vs)"))
      // metrics via an h-ordered left fold, NOT a plain double sum: float
      // addition is order-sensitive and engines accumulate groups in
      // different orders; a fixed fold order makes the sums bit-identical
      // to the oracle (and decimal-casting computed doubles would hit the
      // Spark-vs-DuckDB shortest-repr rounding divergence instead)
      both
        .withColumn("err", col("demand") - col("fv"))
        .groupBy("user_id", "model").agg(
          count(lit(1)).as("n_eval"),
          sum(when(col("demand") =!= 0, 1).otherwise(0)).as("nz"),
          sum(when(col("demand") >= col("lo") && col("demand") <= col("hi"), 1)
            .otherwise(0)).as("n_cov"),
          sort_array(collect_list(struct(col("h").as("h"),
            abs(col("err")).as("ae"),
            (col("err") * col("err")).as("se"),
            col("demand").as("a")))).as("pts"))
        .withColumn("mae",
          expr("aggregate(transform(pts, s -> s.ae), 0D, (acc, v) -> acc + v)") / col("n_eval"))
        .withColumn("mape", when(col("nz") > 0,
          expr("aggregate(transform(pts, s -> CASE WHEN s.a <> 0D THEN s.ae / abs(s.a) ELSE 0D END), 0D, (acc, v) -> acc + v)") / col("nz")))
        .withColumn("rmse",
          sqrt(expr("aggregate(transform(pts, s -> s.se), 0D, (acc, v) -> acc + v)") / col("n_eval")))
        // empirical coverage of the z(0.9) model interval on the held-out
        // window — the direct check that the intervals mean what they claim
        .withColumn("cov90", col("n_cov").cast("double") / col("n_eval"))
        .select("user_id", "model", "n_eval", "mae", "mape", "rmse", "cov90")
    },
    Some(s"""WITH base AS (SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS b,
           |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand
           |  FROM events GROUP BY 1, 2),
           |r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY b DESC) AS rdesc,
           |  count(*) OVER (PARTITION BY user_id) AS n_total FROM base),
           |f AS (SELECT * FROM r WHERE n_total > 12),
           |train AS (SELECT user_id, arg_max(demand, b) AS last_demand,
           |  arg_min(demand, b) AS first_demand, count(*) AS n_train
           |  FROM f WHERE rdesc > 12 GROUP BY 1),
           |sl AS (SELECT user_id, last_demand, n_train,
           |  CASE WHEN n_train = 1 THEN 0.0
           |       ELSE (last_demand - first_demand) / CAST(n_train - 1 AS DOUBLE) END AS slope
           |  FROM train),
           |tr AS (SELECT user_id, b, rdesc,
           |  demand - lag(demand) OVER (PARTITION BY user_id ORDER BY b) AS e FROM f),
           |trs AS (SELECT user_id, list(struct_pack(b := b, e := e) ORDER BY b) AS trl
           |  FROM tr WHERE rdesc > 12 AND e IS NOT NULL GROUP BY 1),
           |trds AS (SELECT user_id, list(struct_pack(b := b, d := demand) ORDER BY b) AS trd
           |  FROM f WHERE rdesc > 12 GROUP BY 1),
           |sv0 AS (SELECT sl.user_id, sl.last_demand, sl.slope, sl.n_train, td.trd,
           |  CASE WHEN sl.n_train > 1 THEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |    list_transform(t.trl, s -> s.e * s.e)), (acc, v) -> acc + v) / CAST(sl.n_train - 1 AS DOUBLE)
           |    ELSE 0.0 END AS s2n,
           |  CASE WHEN sl.n_train > 1 THEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |    list_transform(t.trl, s -> (s.e - sl.slope) * (s.e - sl.slope))), (acc, v) -> acc + v) / CAST(sl.n_train - 1 AS DOUBLE)
           |    ELSE 0.0 END AS s2d,
           |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |    list_transform(td.trd, s -> s.d)), (acc, v) -> acc + v) / sl.n_train AS tmean,
           |  td.trd[CAST(sl.n_train AS INT)].d AS lastd
           |  FROM sl LEFT JOIN trs t ON sl.user_id = t.user_id
           |  JOIN trds td ON sl.user_id = td.user_id),
           |sv1 AS (SELECT *,
           |  CASE WHEN n_train > 1 THEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |    list_transform(generate_series(2, CAST(n_train AS INT)),
           |      i -> (trd[i].d - tmean) * (trd[i-1].d - tmean))), (acc, v) -> acc + v)
           |    ELSE 0.0 END AS arnum,
           |  CASE WHEN n_train > 1 THEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |    list_transform(generate_series(2, CAST(n_train AS INT)),
           |      i -> (trd[i-1].d - tmean) * (trd[i-1].d - tmean))), (acc, v) -> acc + v)
           |    ELSE 0.0 END AS arden
           |  FROM sv0),
           |sv2 AS (SELECT *, CASE WHEN arden <> 0.0 THEN arnum / arden ELSE 0.0 END AS phi FROM sv1),
           |sv AS (SELECT *,
           |  CASE WHEN n_train > 1 THEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |    list_transform(generate_series(2, CAST(n_train AS INT)),
           |      i -> (trd[i].d - (tmean + phi * (trd[i-1].d - tmean))) * (trd[i].d - (tmean + phi * (trd[i-1].d - tmean))))),
           |    (acc, v) -> acc + v) / CAST(n_train - 1 AS DOUBLE)
           |    ELSE 0.0 END AS s2a
           |  FROM sv2),
           |ev AS (SELECT f.user_id, 13 - f.rdesc AS h, f.demand, s.last_demand, s.slope,
           |  s.s2n, s.s2d, s.s2a, s.tmean, s.lastd, s.phi
           |  FROM f JOIN sv s ON f.user_id = s.user_id WHERE f.rdesc <= 12),
           |sc AS (SELECT user_id, h, demand, 'naive' AS model, last_demand AS fv, s2n AS s2,
           |    CAST(h AS DOUBLE) AS vs FROM ev
           |  UNION ALL
           |  SELECT user_id, h, demand, 'drift' AS model, last_demand + h * slope AS fv, s2d AS s2,
           |    CAST(h AS DOUBLE) AS vs FROM ev
           |  UNION ALL
           |  SELECT user_id, h, demand, 'ar1' AS model,
           |    tmean + list_reduce(list_transform(generate_series(1, h), x -> phi),
           |      (a, b) -> a * b) * (lastd - tmean) AS fv,
           |    s2a AS s2,
           |    list_reduce(list_prepend(CAST(1 AS DOUBLE),
           |      list_transform(generate_series(1, h - 1), j -> CAST(0 AS DOUBLE))),
           |      (acc, x) -> 1.0 + phi * phi * acc) AS vs FROM ev),
           |scb AS (SELECT *, fv - $Z90 * sqrt(s2 * vs) AS lo, fv + $Z90 * sqrt(s2 * vs) AS hi FROM sc),
           |pts AS (SELECT user_id, model, count(*) AS n_eval,
           |  SUM(CASE WHEN demand <> 0 THEN 1 ELSE 0 END) AS nz,
           |  SUM(CASE WHEN demand >= lo AND demand <= hi THEN 1 ELSE 0 END) AS n_cov,
           |  list(struct_pack(h := h, ae := abs(demand - fv),
           |    se := (demand - fv)*(demand - fv), a := demand) ORDER BY h) AS l
           |  FROM scb GROUP BY 1, 2)
           |SELECT user_id, model, n_eval,
           |  list_reduce(list_transform(l, s -> s.ae), (acc, v) -> acc + v) / n_eval AS mae,
           |  CASE WHEN nz > 0 THEN list_reduce(list_transform(l,
           |    s -> CASE WHEN s.a <> 0 THEN s.ae / abs(s.a) ELSE 0.0 END), (acc, v) -> acc + v) / nz END AS mape,
           |  sqrt(list_reduce(list_transform(l, s -> s.se), (acc, v) -> acc + v) / n_eval) AS rmse,
           |  CAST(n_cov AS DOUBLE) / n_eval AS cov90
           |FROM pts""".stripMargin))

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

  /** Robust per-series anomaly detection: median/MAD flagging (the
    * classic robust alternative to mean/stddev z-scores — Leys et al.
    * 2013). Each point is flagged when its absolute deviation from the
    * series median exceeds 3·1.4826·MAD (1.4826 makes MAD a consistent σ
    * estimator under normality; the product is spliced as one literal so
    * both engines compare against the identical double).
    *
    * Cross-engine exactness: medians are PERCENTILE_DISC order statistics
    * (actual input elements, lower-median rule — no interpolation
    * arithmetic), deviations are single IEEE subtractions, so the flag
    * boundary is bit-identical in Spark and the oracle.
    *
    * Scale: two keyed aggregations + two shuffle joins, all on user_id;
    * per-key state is one series (bounded by the time range, not corpus
    * size). No window over an unbounded partition, no collect.
    */
  def madAnomalies(seriesDf: DataFrame): DataFrame = {
    val med = seriesDf.groupBy("user_id").agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY demand)").as("med"))
    val dev = seriesDf.join(med, "user_id")
      .withColumn("dev", abs(col("demand") - col("med")))
    val mad = dev.groupBy("user_id").agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)").as("mad"))
    dev.join(mad, "user_id")
      .withColumn("is_anomaly", col("dev") > lit(4.4478) * col("mad"))
      .select("user_id", "bucket_ts", "demand", "med", "mad", "is_anomaly")
  }

  /** M8 (beyond reference): median/MAD anomaly flags over the bucketed
    * demand series — see [[madAnomalies]].
    */
  val m8: GraftQuery = GraftQuery(
    "m8_anomaly_mad",
    (s, d) => madAnomalies(series(s, d)),
    Some("""WITH base AS (
           |  SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS bucket_ts,
           |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand
           |  FROM events GROUP BY 1, 2),
           |med AS (SELECT user_id, quantile_disc(demand, 0.5) AS med FROM base GROUP BY 1),
           |dev AS (SELECT base.user_id, bucket_ts, demand, med, abs(demand - med) AS dev
           |        FROM base JOIN med USING (user_id)),
           |mad AS (SELECT user_id, quantile_disc(dev, 0.5) AS mad FROM dev GROUP BY 1)
           |SELECT user_id, bucket_ts, demand, med, mad,
           |       dev > 4.4478 * mad AS is_anomaly
           |FROM dev JOIN mad USING (user_id)""".stripMargin))

  /** M9 (beyond reference): rolling-origin backtesting — the other half of
    * ML.ARIMA_EVALUATE (reference part3:539-553 evaluates ONE fixed
    * holdout; BQML's backtest table re-fits at k rolled-back origins).
    * The forecast origin rolls back K=3 times in H=4-bucket steps; each
    * fold re-fits all three models (naive / drift / AR(1)) on its own
    * shorter train prefix and scores the next H buckets — emitting the
    * standard per-(series, fold, model) MAE / MAPE / RMSE / cov90 table.
    *
    * One shuffle total: each series is collected once (sorted array),
    * folds x horizon x models fan out of that single row NARROWLY
    * (explode — no join, no re-shuffle), and every training statistic is
    * an ordered fold over a prefix of the SAME array, so DuckDB replays
    * the arithmetic bit-for-bit (the m4b contract). Per-series state is
    * one series array — the documented forecast-family bound; fold
    * re-fits cost K list passes, not K data scans.
    */
  val m9: GraftQuery = {
    val K = 3; val H = 4
    GraftQuery(
      "m9_rolling_origin_backtest",
      (s, d) => {
        // pin the per-series exchange (the m4b fix): the K-fold array
        // re-fits below are CPU-bound per row and AQE's byte-based
        // coalescing would serialize them onto one task; Hash(user_id)
        // satisfies the groupBy's distribution, so this replaces the
        // ENSURE exchange rather than adding one.
        val g = series(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("user_id"))
          .groupBy("user_id")
          .agg(sort_array(collect_list(struct(col("bucket_ts").as("b"),
            col("demand").as("d")))).as("trd"),
            count(lit(1)).as("n_total"))
          // the earliest origin still needs >= 2 train points for a slope
          .filter(col("n_total") > K * H + 1)
          .withColumn("fold", explode(sequence(lit(1), lit(K))))
          .withColumn("tn", (col("n_total") - (lit(K + 1) - col("fold")) * H).cast("int"))
          .withColumn("lastd", expr("element_at(trd, tn).d"))
          .withColumn("slope",
            (col("lastd") - expr("element_at(trd, 1).d")) / (col("tn") - 1).cast("double"))
          .withColumn("nres", (col("tn") - 1).cast("double"))
          .withColumn("s2n",
            expr("aggregate(transform(sequence(2, tn), i -> (element_at(trd, i).d - element_at(trd, i - 1).d) * (element_at(trd, i).d - element_at(trd, i - 1).d)), 0D, (acc, v) -> acc + v)") / col("nres"))
          .withColumn("s2d",
            expr("aggregate(transform(sequence(2, tn), i -> (element_at(trd, i).d - element_at(trd, i - 1).d - slope) * (element_at(trd, i).d - element_at(trd, i - 1).d - slope)), 0D, (acc, v) -> acc + v)") / col("nres"))
          .withColumn("tmean",
            expr("aggregate(transform(sequence(1, tn), i -> element_at(trd, i).d), 0D, (acc, v) -> acc + v)") / col("tn"))
          .withColumn("arnum",
            expr("aggregate(transform(sequence(2, tn), i -> (element_at(trd, i).d - tmean) * (element_at(trd, i - 1).d - tmean)), 0D, (acc, v) -> acc + v)"))
          .withColumn("arden",
            expr("aggregate(transform(sequence(2, tn), i -> (element_at(trd, i - 1).d - tmean) * (element_at(trd, i - 1).d - tmean)), 0D, (acc, v) -> acc + v)"))
          .withColumn("phi",
            when(col("arden") =!= 0.0, col("arnum") / col("arden")).otherwise(lit(0.0)))
          .withColumn("s2a",
            expr("aggregate(transform(sequence(2, tn), i -> (element_at(trd, i).d - (tmean + phi * (element_at(trd, i - 1).d - tmean))) * (element_at(trd, i).d - (tmean + phi * (element_at(trd, i - 1).d - tmean)))), 0D, (acc, v) -> acc + v)") / col("nres"))
          .withColumn("h", explode(sequence(lit(1), lit(H))))
          .withColumn("actual", expr("element_at(trd, tn + h).d"))
          .withColumn("phipow",
            expr("aggregate(transform(sequence(1, h), x -> phi), 1D, (acc, v) -> acc * v)"))
          // Spark's sequence(1, 0) DESCENDS — guard h = 1 explicitly (the
          // m4b arvs contract; DuckDB's empty generate_series agrees)
          .withColumn("arvs", when(col("h") === 1, lit(1.0)).otherwise(
            expr("aggregate(transform(sequence(1, h - 1), x -> 0D), 1D, (acc, x) -> 1.0D + phi * phi * acc)")))
        g.select(col("user_id"), col("fold"), col("h"), col("actual"),
            explode(array(
              struct(lit("naive").as("model"), col("lastd").as("fv"),
                col("s2n").as("s2"), col("h").cast("double").as("vs")),
              struct(lit("drift").as("model"),
                (col("lastd") + col("h") * col("slope")).as("fv"),
                col("s2d").as("s2"), col("h").cast("double").as("vs")),
              struct(lit("ar1").as("model"),
                (col("tmean") + col("phipow") * (col("lastd") - col("tmean"))).as("fv"),
                col("s2a").as("s2"), col("arvs").as("vs")))).as("mf"))
          .select(col("user_id"), col("fold"), col("h"), col("actual"),
            col("mf.model").as("model"), col("mf.fv").as("fv"),
            col("mf.s2").as("s2"), col("mf.vs").as("vs"))
          .withColumn("lo", expr(s"fv - $Z90 * sqrt(s2 * vs)"))
          .withColumn("hi", expr(s"fv + $Z90 * sqrt(s2 * vs)"))
          .withColumn("err", col("actual") - col("fv"))
          .groupBy("user_id", "fold", "model").agg(
            count(lit(1)).as("n_eval"),
            sum(when(col("actual") =!= 0, 1).otherwise(0)).as("nz"),
            sum(when(col("actual") >= col("lo") && col("actual") <= col("hi"), 1)
              .otherwise(0)).as("n_cov"),
            sort_array(collect_list(struct(col("h").as("h"),
              abs(col("err")).as("ae"), (col("err") * col("err")).as("se"),
              col("actual").as("a")))).as("pts"))
          .withColumn("mae",
            expr("aggregate(transform(pts, s -> s.ae), 0D, (acc, v) -> acc + v)") / col("n_eval"))
          .withColumn("mape", when(col("nz") > 0,
            expr("aggregate(transform(pts, s -> CASE WHEN s.a <> 0D THEN s.ae / abs(s.a) ELSE 0D END), 0D, (acc, v) -> acc + v)") / col("nz")))
          .withColumn("rmse",
            sqrt(expr("aggregate(transform(pts, s -> s.se), 0D, (acc, v) -> acc + v)") / col("n_eval")))
          .withColumn("cov90", col("n_cov").cast("double") / col("n_eval"))
          .select("user_id", "fold", "model", "n_eval", "mae", "mape", "rmse", "cov90")
      },
      Some(s"""WITH base AS (SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS b,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand
             |  FROM events GROUP BY 1, 2),
             |g AS (SELECT user_id, list(struct_pack(b := b, d := demand) ORDER BY b) AS trd,
             |  count(*) AS n_total FROM base GROUP BY 1),
             |f0 AS (SELECT user_id, trd, n_total, CAST(fold AS INT) AS fold,
             |  CAST(n_total - ($K + 1 - fold) * $H AS INT) AS tn
             |  FROM g, range(1, ${K + 1}) r(fold) WHERE n_total > ${K * H + 1}),
             |st0 AS (SELECT *, trd[tn].d AS lastd,
             |  (trd[tn].d - trd[1].d) / CAST(tn - 1 AS DOUBLE) AS slope,
             |  CAST(tn - 1 AS DOUBLE) AS nres,
             |  list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(generate_series(2, tn),
             |    i -> (trd[i].d - trd[i-1].d) * (trd[i].d - trd[i-1].d))), (acc, v) -> acc + v) / CAST(tn - 1 AS DOUBLE) AS s2n,
             |  list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(generate_series(1, tn),
             |    i -> trd[i].d)), (acc, v) -> acc + v) / tn AS tmean
             |  FROM f0),
             |st1 AS (SELECT *,
             |  list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(generate_series(2, tn),
             |    i -> (trd[i].d - trd[i-1].d - slope) * (trd[i].d - trd[i-1].d - slope))), (acc, v) -> acc + v) / nres AS s2d,
             |  list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(generate_series(2, tn),
             |    i -> (trd[i].d - tmean) * (trd[i-1].d - tmean))), (acc, v) -> acc + v) AS arnum,
             |  list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(generate_series(2, tn),
             |    i -> (trd[i-1].d - tmean) * (trd[i-1].d - tmean))), (acc, v) -> acc + v) AS arden
             |  FROM st0),
             |st2 AS (SELECT *, CASE WHEN arden <> 0.0 THEN arnum / arden ELSE 0.0 END AS phi FROM st1),
             |st AS (SELECT *,
             |  list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(generate_series(2, tn),
             |    i -> (trd[i].d - (tmean + phi * (trd[i-1].d - tmean))) * (trd[i].d - (tmean + phi * (trd[i-1].d - tmean))))),
             |    (acc, v) -> acc + v) / nres AS s2a
             |  FROM st2),
             |ev AS (SELECT user_id, fold, CAST(h AS INT) AS h, trd[tn + CAST(h AS INT)].d AS actual,
             |  lastd, slope, s2n, s2d, s2a, tmean, phi,
             |  list_reduce(list_transform(generate_series(1, CAST(h AS INT)), x -> phi), (a, b) -> a * b) AS phipow,
             |  list_reduce(list_prepend(CAST(1 AS DOUBLE),
             |    list_transform(generate_series(1, CAST(h AS INT) - 1), j -> CAST(0 AS DOUBLE))),
             |    (acc, x) -> 1.0 + phi * phi * acc) AS arvs
             |  FROM st, range(1, ${H + 1}) rh(h)),
             |sc AS (SELECT user_id, fold, h, actual, 'naive' AS model, lastd AS fv, s2n AS s2,
             |    CAST(h AS DOUBLE) AS vs FROM ev
             |  UNION ALL
             |  SELECT user_id, fold, h, actual, 'drift' AS model, lastd + h * slope AS fv, s2d AS s2,
             |    CAST(h AS DOUBLE) AS vs FROM ev
             |  UNION ALL
             |  SELECT user_id, fold, h, actual, 'ar1' AS model,
             |    tmean + phipow * (lastd - tmean) AS fv, s2a AS s2, arvs AS vs FROM ev),
             |scb AS (SELECT *, fv - $Z90 * sqrt(s2 * vs) AS lo, fv + $Z90 * sqrt(s2 * vs) AS hi FROM sc),
             |pts AS (SELECT user_id, fold, model, count(*) AS n_eval,
             |  SUM(CASE WHEN actual <> 0 THEN 1 ELSE 0 END) AS nz,
             |  SUM(CASE WHEN actual >= lo AND actual <= hi THEN 1 ELSE 0 END) AS n_cov,
             |  list(struct_pack(h := h, ae := abs(actual - fv),
             |    se := (actual - fv)*(actual - fv), a := actual) ORDER BY h) AS l
             |  FROM scb GROUP BY 1, 2, 3)
             |SELECT user_id, fold, model, n_eval,
             |  list_reduce(list_transform(l, s -> s.ae), (acc, v) -> acc + v) / n_eval AS mae,
             |  CASE WHEN nz > 0 THEN list_reduce(list_transform(l,
             |    s -> CASE WHEN s.a <> 0 THEN s.ae / abs(s.a) ELSE 0.0 END), (acc, v) -> acc + v) / nz END AS mape,
             |  sqrt(list_reduce(list_transform(l, s -> s.se), (acc, v) -> acc + v) / n_eval) AS rmse,
             |  CAST(n_cov AS DOUBLE) / n_eval AS cov90
             |FROM pts""".stripMargin))
  }

  /** M15 (beyond reference): per-series Theta-method forecast — the
    * M3-competition benchmark model (Assimakopoulos & Nikolopoulos 2000),
    * in the SES-with-drift form; completes the m5..m11 classical ladder
    * between Holt and the regression models. The oracle replays the
    * engine's exact ascending-t fold as a recursive CTE (state = level,
    * Σy, Σt·y, Σe², (1−α)^t), so every forecast double matches bitwise.
    */
  val m15: GraftQuery = GraftQuery(
    "m15_forecast_theta",
    forecastKernel("theta"),
    Some(s"""WITH RECURSIVE base AS (
           |  SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS b,
           |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand
           |  FROM events GROUP BY 1, 2),
           |ser AS (SELECT user_id, list(demand ORDER BY b) AS y, max(b) AS last_b,
           |        CAST(count(*) AS INT) AS n FROM base GROUP BY 1),
           |rec AS (
           |  SELECT user_id, y, n, last_b, 1 AS i, y[1] AS l, y[1] AS sy,
           |         CAST(0 AS DOUBLE) AS sty, CAST(0 AS DOUBLE) AS s,
           |         CAST(0.5 AS DOUBLE) AS pp
           |  FROM ser
           |  UNION ALL
           |  SELECT user_id, y, n, last_b, i + 1,
           |         CAST(0.5 AS DOUBLE) * y[i+1] + CAST(0.5 AS DOUBLE) * l,
           |         sy + y[i+1],
           |         sty + CAST(i AS DOUBLE) * y[i+1],
           |         s + (y[i+1] - l) * (y[i+1] - l),
           |         pp * CAST(0.5 AS DOUBLE)
           |  FROM rec WHERE i < n),
           |sg AS (SELECT user_id, last_b, l, pp,
           |       CASE WHEN n > 1 THEN s / CAST(n - 1 AS DOUBLE)
           |            ELSE CAST(0 AS DOUBLE) END AS s2,
           |       CASE WHEN n > 1 THEN
           |         (CAST(n AS DOUBLE) * sty
           |            - ((CAST(n AS DOUBLE) - 1.0) * CAST(n AS DOUBLE) / 2.0) * sy)
           |         / (CAST(n AS DOUBLE)
           |              * ((CAST(n AS DOUBLE) - 1.0) * CAST(n AS DOUBLE)
           |                 * (2.0 * CAST(n AS DOUBLE) - 1.0) / 6.0)
           |            - ((CAST(n AS DOUBLE) - 1.0) * CAST(n AS DOUBLE) / 2.0)
           |              * ((CAST(n AS DOUBLE) - 1.0) * CAST(n AS DOUBLE) / 2.0))
           |       ELSE CAST(0 AS DOUBLE) END AS bls
           |       FROM rec WHERE i = n),
           |fc AS (SELECT user_id, last_b + h * INTERVAL '5 minutes' AS forecast_timestamp,
           |       l + (CAST(h AS DOUBLE) - 1.0 + 2.0 - pp * 2.0) * (bls * 0.5) AS v,
           |       $Z90 * sqrt(s2 * (1.0 + (CAST(h AS DOUBLE) - 1.0) * 0.5 * 0.5)) AS halfw
           |       FROM sg CROSS JOIN generate_series(1, 12) t(h))
           |SELECT user_id, forecast_timestamp, v AS forecast_value,
           |       v - halfw AS lo, v + halfw AS hi FROM fc""".stripMargin))

  /** M16 (beyond reference): forecast combination — the equal-weight
    * ensemble of the naive, drift and theta models, with the
    * conservative interval envelope (min lo, max hi). Combinations beat
    * single models on average (the M4 lesson; Bates & Granger 1969), and
    * the envelope is the defensible default when component intervals
    * disagree. Determinism: each leg's outputs are the oracle-proven
    * m5/m6/m15 doubles; every value is quantized to 1e-9 BEFORE the
    * 3-way mean/min/max, so the combination aggregates are exact integer
    * folds in any order.
    */
  /** Public DataFrame-in API (see graft.api.Graft): equal-weight
    * naive/drift/theta ensemble over a (user_id, bucket_ts, demand)
    * series — mean point forecast, envelope interval; see [[m16]].
    */
  def forecastEnsemble(seriesDf: DataFrame, horizon: Int = Horizon,
      confidence: Double = 0.9): DataFrame = {
    Seq("naive", "drift", "theta")
      .map(m => forecast(seriesDf, m, horizon, confidence))
      .map(df => df.select(col("user_id"), col("forecast_timestamp"),
        floor(col("forecast_value") * 1e9 + 0.5).cast("long").as("qv"),
        floor(col("lo") * 1e9 + 0.5).cast("long").as("ql"),
        floor(col("hi") * 1e9 + 0.5).cast("long").as("qh")))
      .reduce(_ unionByName _)
      .groupBy("user_id", "forecast_timestamp")
      .agg((sum("qv").cast("double") / 3.0 / 1e9).as("forecast_value"),
        (min("ql").cast("double") / 1e9).as("lo"),
        (max("qh").cast("double") / 1e9).as("hi"))
  }

  val m16: GraftQuery = GraftQuery(
    "m16_forecast_ensemble",
    (s, d) => forecastEnsemble(series(s, d)),
    Some(s"""WITH RECURSIVE base AS (
           |  SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS b,
           |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand
           |  FROM events GROUP BY 1, 2),
           |ser AS (SELECT user_id, list(demand ORDER BY b) AS y, max(b) AS last_b,
           |        CAST(count(*) AS INT) AS n FROM base GROUP BY 1),
           |nv AS (SELECT user_id, last_b, y[n] AS last_d,
           |  CASE WHEN n > 1 THEN list_reduce(list_prepend(0.0, list_transform(generate_series(2, n),
           |    i -> (y[i] - y[i-1]) * (y[i] - y[i-1]))), (acc, v) -> acc + v) / (n - 1)
           |    ELSE 0.0 END AS s2
           |  FROM ser),
           |leg_n AS (SELECT user_id, last_b + h * INTERVAL '5 minutes' AS fts,
           |       CAST(floor(last_d * 1e9 + 0.5) AS BIGINT) AS qv,
           |       CAST(floor((last_d - $Z90 * sqrt(s2 * h)) * 1e9 + 0.5) AS BIGINT) AS ql,
           |       CAST(floor((last_d + $Z90 * sqrt(s2 * h)) * 1e9 + 0.5) AS BIGINT) AS qh
           |       FROM nv CROSS JOIN generate_series(1, 12) t(h)),
           |dl AS (SELECT user_id, last_b, n, y, y[n] AS last_d,
           |       CASE WHEN n = 1 THEN 0.0 ELSE (y[n] - y[1]) / CAST(n - 1 AS DOUBLE) END AS slope FROM ser),
           |dg AS (SELECT user_id, last_b, last_d, slope,
           |  CASE WHEN n > 1 THEN list_reduce(list_prepend(0.0, list_transform(generate_series(2, n),
           |    i -> (y[i] - y[i-1] - slope) * (y[i] - y[i-1] - slope))), (acc, v) -> acc + v) / (n - 1)
           |    ELSE 0.0 END AS s2
           |  FROM dl),
           |leg_d AS (SELECT user_id, last_b + h * INTERVAL '5 minutes' AS fts,
           |       CAST(floor((last_d + h * slope) * 1e9 + 0.5) AS BIGINT) AS qv,
           |       CAST(floor(((last_d + h * slope) - $Z90 * sqrt(s2 * h)) * 1e9 + 0.5) AS BIGINT) AS ql,
           |       CAST(floor(((last_d + h * slope) + $Z90 * sqrt(s2 * h)) * 1e9 + 0.5) AS BIGINT) AS qh
           |       FROM dg CROSS JOIN generate_series(1, 12) t(h)),
           |rec AS (
           |  SELECT user_id, y, n, last_b, 1 AS i, y[1] AS l, y[1] AS sy,
           |         CAST(0 AS DOUBLE) AS sty, CAST(0 AS DOUBLE) AS s,
           |         CAST(0.5 AS DOUBLE) AS pp
           |  FROM ser
           |  UNION ALL
           |  SELECT user_id, y, n, last_b, i + 1,
           |         CAST(0.5 AS DOUBLE) * y[i+1] + CAST(0.5 AS DOUBLE) * l,
           |         sy + y[i+1],
           |         sty + CAST(i AS DOUBLE) * y[i+1],
           |         s + (y[i+1] - l) * (y[i+1] - l),
           |         pp * CAST(0.5 AS DOUBLE)
           |  FROM rec WHERE i < n),
           |tg AS (SELECT user_id, last_b, l, pp,
           |       CASE WHEN n > 1 THEN s / CAST(n - 1 AS DOUBLE)
           |            ELSE CAST(0 AS DOUBLE) END AS s2,
           |       CASE WHEN n > 1 THEN
           |         (CAST(n AS DOUBLE) * sty
           |            - ((CAST(n AS DOUBLE) - 1.0) * CAST(n AS DOUBLE) / 2.0) * sy)
           |         / (CAST(n AS DOUBLE)
           |              * ((CAST(n AS DOUBLE) - 1.0) * CAST(n AS DOUBLE)
           |                 * (2.0 * CAST(n AS DOUBLE) - 1.0) / 6.0)
           |            - ((CAST(n AS DOUBLE) - 1.0) * CAST(n AS DOUBLE) / 2.0)
           |              * ((CAST(n AS DOUBLE) - 1.0) * CAST(n AS DOUBLE) / 2.0))
           |       ELSE CAST(0 AS DOUBLE) END AS bls
           |       FROM rec WHERE i = n),
           |leg_t AS (SELECT user_id, last_b + h * INTERVAL '5 minutes' AS fts,
           |       CAST(floor((l + (CAST(h AS DOUBLE) - 1.0 + 2.0 - pp * 2.0) * (bls * 0.5)) * 1e9 + 0.5) AS BIGINT) AS qv,
           |       CAST(floor(((l + (CAST(h AS DOUBLE) - 1.0 + 2.0 - pp * 2.0) * (bls * 0.5))
           |         - $Z90 * sqrt(s2 * (1.0 + (CAST(h AS DOUBLE) - 1.0) * 0.5 * 0.5))) * 1e9 + 0.5) AS BIGINT) AS ql,
           |       CAST(floor(((l + (CAST(h AS DOUBLE) - 1.0 + 2.0 - pp * 2.0) * (bls * 0.5))
           |         + $Z90 * sqrt(s2 * (1.0 + (CAST(h AS DOUBLE) - 1.0) * 0.5 * 0.5))) * 1e9 + 0.5) AS BIGINT) AS qh
           |       FROM tg CROSS JOIN generate_series(1, 12) t(h)),
           |u AS (SELECT * FROM leg_n UNION ALL SELECT * FROM leg_d UNION ALL SELECT * FROM leg_t)
           |SELECT user_id, fts AS forecast_timestamp,
           |  CAST(sum(qv) AS DOUBLE) / 3.0 / 1e9 AS forecast_value,
           |  CAST(min(ql) AS DOUBLE) / 1e9 AS lo,
           |  CAST(max(qh) AS DOUBLE) / 1e9 AS hi
           |FROM u GROUP BY 1, 2""".stripMargin))

  /** M17 (beyond reference): per-series autocorrelation function — acf at
    * lags 1..6 of each user's bucketed demand series, the diagnostic that
    * picks between the [[m7]] AR(1) / [[m10]] Holt / [[m11]] seasonal
    * members of the forecast ladder (a spike at the season lag says hw, a
    * geometric decay says ar1) and the residual-whiteness check after a
    * fit. acf_k = Σ_{t>k}(y_t−ȳ)(y_{t−k}−ȳ) / Σ(y_t−ȳ)², every fold in
    * ascending t order, replayed by the oracle as ordered list_reduce
    * over the same list (the m7 moment discipline — 0.0-seeded JVM folds
    * equal element-seeded list_reduce because 0.0 + x is exact); the one
    * division is quantized to 9 dp. Shape: the m5-family single shuffle —
    * one groupByKey on the series id, per-series state bounded by series
    * length, lags emitted from one pass.
    */
  /** Public DataFrame-in API (see graft.api.Graft): the ACF itself over
    * (user_id, bucket_ts, demand); lags 1..min(maxLag, n−1), series
    * shorter than 2 points emit nothing.
    */
  def acf(seriesDf: DataFrame, maxLag: Int = 6): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val s = seriesDf.sparkSession
    import s.implicits._
    seriesDf.as[SeriesPoint]
      .groupByKey(_.user_id)
      .flatMapGroups { (uid: Long, it: Iterator[SeriesPoint]) =>
        val y = it.toVector.sortBy(_.bucket_ts.getTime).map(_.demand)
        val n = y.size
        if (n < 2) Iterator.empty
        else {
          var sy = 0.0
          y.foreach(sy += _)
          val mean = sy / n
          var den = 0.0
          var i = 0
          while (i < n) { val d0 = y(i) - mean; den += d0 * d0; i += 1 }
          (1 to math.min(maxLag, n - 1)).iterator.map { k =>
            var num = 0.0
            var t = k
            while (t < n) { num += (y(t) - mean) * (y(t - k) - mean); t += 1 }
            val a = if (den == 0.0) 0.0
              else math.floor(num / den * 1e9 + 0.5) / 1e9
            (uid, k, a)
          }
        }
      }
      .toDF("user_id", "lag", "acf")
  }

  val m17: GraftQuery = GraftQuery(
    "m17_acf_diagnostics",
    (s, d) => acf(series(s, d)),
    Some("""WITH base AS (
           |  SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS b,
           |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand
           |  FROM events GROUP BY 1, 2),
           |ser AS (SELECT user_id, list(demand ORDER BY b) AS y,
           |        CAST(count(*) AS INT) AS n FROM base GROUP BY 1),
           |m AS (SELECT user_id, y, n,
           |        list_reduce(y, (a, b) -> a + b) / n AS mean
           |      FROM ser WHERE n >= 2),
           |dn AS (SELECT *, list_reduce(list_transform(y, v -> (v - mean) * (v - mean)),
           |         (a, b) -> a + b) AS den FROM m),
           |lg AS (SELECT unnest(generate_series(1, 6)) AS lag),
           |ac AS (SELECT user_id, lag, den,
           |         list_reduce(list_transform(generate_series(lag + 1, n),
           |           t -> (y[t] - mean) * (y[t - lag] - mean)), (a, b) -> a + b) AS num
           |       FROM dn CROSS JOIN lg WHERE lag <= n - 1)
           |SELECT user_id, CAST(lag AS INT) AS lag,
           |  CASE WHEN den = 0 THEN 0.0
           |       ELSE floor(num / den * 1e9 + 0.5) / 1e9 END AS acf
           |FROM ac""".stripMargin))

  /** M18 (beyond reference): Ljung-Box portmanteau statistic per series —
    * Q(h) = n(n+2)·Σ_{k≤h} r_k²/(n−k) over the [[m17]] autocorrelations
    * (h = 6), THE standard "is anything left in this series/residual"
    * test that turns m17's per-lag diagnostics into one decision number
    * (compare to χ²_h). Determinism: each r_k is the m17 9-dp-quantized
    * value, each r_k²/(n−k) term is quantized to an integer at 1e15 and
    * the 6-term fold is an exact BIGINT sum (the d11 discipline — SQL SUM
    * has no defined order), then one integer product n(n+2) and one
    * division, re-quantized at 9 dp. Same single-shuffle series kernel as
    * m17.
    */
  val m18: GraftQuery = GraftQuery(
    "m18_ljung_box",
    (s, d) => {
      val a = acf(series(s, d))
      val n = series(s, d).groupBy("user_id").agg(count(lit(1)).as("n"))
      a.join(n, "user_id")
        .select(col("user_id"), col("n"),
          floor(col("acf") * col("acf") / (col("n") - col("lag")) * 1e15 + 0.5)
            .cast("long").as("term"))
        .groupBy("user_id", "n").agg(sum("term").as("ts"))
        .select(col("user_id"), col("n"),
          (floor((col("n") * (col("n") + 2)).cast("double") *
            (col("ts").cast("double") / 1e15) * 1e9 + 0.5).cast("double") / 1e9)
            .as("q_stat"))
    },
    Some("""WITH base AS (
           |  SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS b,
           |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand
           |  FROM events GROUP BY 1, 2),
           |ser AS (SELECT user_id, list(demand ORDER BY b) AS y,
           |        CAST(count(*) AS INT) AS n FROM base GROUP BY 1),
           |m AS (SELECT user_id, y, n,
           |        list_reduce(y, (a, b) -> a + b) / n AS mean
           |      FROM ser WHERE n >= 2),
           |dn AS (SELECT *, list_reduce(list_transform(y, v -> (v - mean) * (v - mean)),
           |         (a, b) -> a + b) AS den FROM m),
           |lg AS (SELECT unnest(generate_series(1, 6)) AS lag),
           |ac AS (SELECT user_id, n, lag,
           |         CASE WHEN den = 0 THEN 0.0
           |              ELSE floor(list_reduce(list_transform(generate_series(lag + 1, n),
           |                t -> (y[t] - mean) * (y[t - lag] - mean)), (a, b) -> a + b)
           |                / den * 1e9 + 0.5) / 1e9 END AS acf
           |       FROM dn CROSS JOIN lg WHERE lag <= n - 1),
           |tm AS (SELECT user_id, n,
           |         CAST(sum(CAST(floor(acf * acf / (n - lag) * 1e15 + 0.5) AS BIGINT)) AS BIGINT) AS ts
           |       FROM ac GROUP BY 1, 2)
           |SELECT user_id, CAST(n AS BIGINT) AS n,
           |  floor(CAST(n * (n + 2) AS DOUBLE) * (CAST(ts AS DOUBLE) / 1e15) * 1e9 + 0.5) / 1e9 AS q_stat
           |FROM tm""".stripMargin))

  /** M19 (beyond reference): pinball-loss backtest of an empirical-quantile
    * forecaster — the quantile-forecast evaluation [[m4]]'s point metrics
    * (MAE/RMSE) cannot see. Split the bucketed series at the global time
    * midpoint; the forecaster predicts each series' train-side type-1
    * order-statistic quantile (the classic strong baseline for
    * probabilistic demand forecasting) and every test point is scored
    * with L_q(y, ŷ) = q·(y−ŷ)⁺ + (1−q)·(ŷ−y)⁺ at q ∈ {0.1, 0.5, 0.9}.
    * One row per q with the pooled mean loss: the number a forecasting
    * team tracks per quantile head.
    *
    * Shape: one bucket aggregate, one per-series train fold (collect_list
    * is bounded by the CALENDAR — buckets per series, not raw rows), one
    * equi-join test×preds, and a 3-row final aggregate. Determinism: the
    * order statistic is arr[ceil(q·n)] with q forced to DOUBLE on both
    * engines (IEEE ceil agrees bit-for-bit); each loss term is quantized
    * to a 1e9-scaled BIGINT before the unordered SUM (the d22 discipline).
    */
  val m19: GraftQuery = GraftQuery(
    "m19_pinball_backtest",
    (s, d) => {
      val ser = series(s, d).select(col("user_id"),
        unix_micros(col("bucket_ts")).as("us"), col("demand"))
      val mid = ser.agg(expr("(min(us) + max(us)) div 2").as("mid_us"))
      val sp = ser.crossJoin(broadcast(mid))
      val train = sp.filter(col("us") < col("mid_us"))
      val test = sp.filter(col("us") >= col("mid_us"))
      val preds = train.groupBy("user_id")
        .agg(sort_array(collect_list(col("demand"))).as("arr"),
          count(lit(1)).as("n"))
      val qs = s.range(1)
        .select(explode(array(lit(0.1), lit(0.5), lit(0.9))).as("q"))
      test.join(preds, "user_id").crossJoin(broadcast(qs))
        .withColumn("pred",
          element_at(col("arr"), ceil(col("q") * col("n")).cast("int")))
        .withColumn("term", when(col("demand") >= col("pred"),
            col("q") * (col("demand") - col("pred")))
          .otherwise((lit(1.0) - col("q")) * (col("pred") - col("demand"))))
        .withColumn("term_q", floor(col("term") * 1e9 + 0.5).cast("long"))
        .groupBy("q").agg(count(lit(1)).as("n_points"), sum("term_q").as("sq"))
        .select(col("q"), col("n_points"),
          ((col("sq").cast("double") / 1e9) / col("n_points")).as("pinball"))
    },
    Some("""WITH base AS (
           |  SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS b,
           |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand
           |  FROM events GROUP BY 1, 2),
           |ser AS (SELECT user_id, epoch_us(b) AS us, demand FROM base),
           |m AS (SELECT (min(us) + max(us)) // 2 AS mid_us FROM ser),
           |tr AS (SELECT user_id, list_sort(list(demand)) AS arr, count(*) AS n
           |       FROM ser, m WHERE us < mid_us GROUP BY user_id),
           |te AS (SELECT user_id, demand FROM ser, m WHERE us >= mid_us),
           |q AS (SELECT unnest([0.1::DOUBLE, 0.5::DOUBLE, 0.9::DOUBLE]) AS q),
           |p AS (SELECT te.demand, q.q,
           |        tr.arr[CAST(ceil(q.q * tr.n) AS INT)] AS pred
           |      FROM te JOIN tr USING (user_id) CROSS JOIN q),
           |t AS (SELECT q, CAST(floor((CASE WHEN demand >= pred
           |          THEN q * (demand - pred)
           |          ELSE (1.0 - q) * (pred - demand) END) * 1e9 + 0.5) AS BIGINT) AS term_q
           |      FROM p)
           |SELECT q, count(*) AS n_points,
           |  (CAST(sum(term_q) AS DOUBLE) / 1e9) / count(*) AS pinball
           |FROM t GROUP BY q""".stripMargin))

  /** M20 (beyond reference): Croston's method (1972) for INTERMITTENT
    * demand — the forecaster for series whose buckets are mostly empty,
    * where the m5–m11 ladder systematically under-forecasts (smoothing
    * zeros drags the level down; Croston instead smooths demand SIZE and
    * demand INTERVAL separately and forecasts their ratio). The sparse
    * per-user 5-minute event series is exactly this shape: materialized
    * buckets are the nonzero demands, the gaps between their bucket
    * indexes are the intervals — no zero-filling pass is needed.
    *
    * Per series (positions q_j = bucket index from epoch, demands z_j,
    * both in ascending time): ẑ init = z_1, p̂ init = mean interval
    * (q_n−q_1)/(n−1) (1.0 for a single demand), then for j ≥ 2 the
    * α = 0.1 EWMAs ẑ ← 0.1·z_j + 0.9·ẑ and p̂ ← 0.1·(q_j−q_{j−1}) +
    * 0.9·p̂. Output per series: demand count, ẑ, p̂, the Croston
    * per-bucket rate ẑ/p̂ and the Syntetos-Boylan (SBA) bias-corrected
    * (1−α/2)·ẑ/p̂.
    *
    * Determinism: positions are exact integer bucket indexes; every EWMA
    * step is the identical `0.1*z + 0.9*s` IEEE expression chained in
    * ascending order, replayed by the oracle as a recursive CTE (the m10
    * discipline — struct-state list_reduce chains are NOT bit-stable in
    * DuckDB); no libm anywhere, so no quantization is needed. Shape: the
    * m5-family single shuffle — one groupByKey on the series id, state
    * bounded by series length.
    */
  /** Public DataFrame-in API (see graft.api.Graft): Croston/SBA over any
    * bucketed sparse series (user_id, bucket_ts, demand); `bucketSeconds`
    * sets the grain the intervals are counted in.
    */
  def croston(seriesDf: DataFrame, alpha: Double = 0.1,
      bucketSeconds: Long = BucketSeconds): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
    val s = seriesDf.sparkSession
    import s.implicits._
    seriesDf.as[SeriesPoint]
      .groupByKey(_.user_id)
      .mapGroups { (uid: Long, it: Iterator[SeriesPoint]) =>
        val pts = it.toVector.sortBy(_.bucket_ts.getTime)
        val q = pts.map(_.bucket_ts.getTime / (bucketSeconds * 1000L))
        val n = pts.size
        var zh = pts.head.demand
        var ph =
          if (n == 1) 1.0 else (q.last - q.head).toDouble / (n - 1).toDouble
        var j = 1
        while (j < n) {
          zh = alpha * pts(j).demand + (1.0 - alpha) * zh
          ph = alpha * (q(j) - q(j - 1)).toDouble + (1.0 - alpha) * ph
          j += 1
        }
        (uid, n.toLong, zh, ph, zh / ph, (1.0 - alpha / 2.0) * (zh / ph))
      }
      .toDF("user_id", "n_demands", "z_hat", "p_hat", "croston", "sba")
  }

  val m20: GraftQuery = GraftQuery(
    "m20_croston",
    (s, d) => croston(series(s, d)),
    Some("""WITH RECURSIVE base AS (
           |  SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS b,
           |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand
           |  FROM events GROUP BY 1, 2),
           |ser AS (SELECT user_id, list(demand ORDER BY b) AS y,
           |        list(epoch_us(b) // 300000000 ORDER BY b) AS q,
           |        CAST(count(*) AS INT) AS n FROM base GROUP BY 1),
           |rec AS (
           |  SELECT user_id, y, q, n, 1 AS i, y[1] AS zh,
           |         CASE WHEN n = 1 THEN CAST(1.0 AS DOUBLE)
           |              ELSE CAST(q[n] - q[1] AS DOUBLE) / CAST(n - 1 AS DOUBLE) END AS ph
           |  FROM ser
           |  UNION ALL
           |  SELECT user_id, y, q, n, i + 1,
           |         CAST(0.1 AS DOUBLE) * y[i+1] + CAST(0.9 AS DOUBLE) * zh,
           |         CAST(0.1 AS DOUBLE) * CAST(q[i+1] - q[i] AS DOUBLE)
           |           + CAST(0.9 AS DOUBLE) * ph
           |  FROM rec WHERE i < n)
           |SELECT user_id, CAST(n AS BIGINT) AS n_demands, zh AS z_hat, ph AS p_hat,
           |  zh / ph AS croston, 0.95 * (zh / ph) AS sba
           |FROM rec WHERE i = n""".stripMargin))

  /** M22 (beyond reference): hierarchical forecast coherence — per
    * horizon step, the DIRECT global forecast vs the BOTTOM-UP sum of
    * per-event-type forecasts on the same global grid, plus the
    * reconciliation ratio. The children are zero-filled onto the COMMON
    * bucket spine before fitting: on a shared support every linear-in-y
    * forecaster (here per-series OLS lines) is exactly additive, so
    * bottom-up ≡ direct up to quantization and the ratio pins to 1 —
    * the coherence identity this op regression-gates. The identity is
    * easy to lose silently: fitting each child only on its ACTIVE
    * buckets (the natural, wrong implementation) treats
    * conditional-on-active demand as dense and overshoots the total
    * ~5× on this corpus — the classic bottom-up overforecast bug this
    * gate exists to catch. A production reconciler (Hyndman et al.'s
    * trace-minimization family) starts from exactly this spine-aligned
    * base and redistributes residual incoherence of NONLINEAR members.
    *
    * Determinism: integer bucket coordinates rebased to the global
    * origin (keeps OLS moments inside BIGINT/2^53), exact centi-unit
    * demand sums, slope/intercept as fixed IEEE ratios of exact integer
    * moments, each child's horizon value 1e4-quantized BEFORE the
    * unordered cross-child sum. Shape: one bucket aggregate, a
    * spine-bounded fill (types × calendar buckets), one moments
    * aggregate per level, a 12-row horizon domain.
    */
  val m22: GraftQuery = GraftQuery(
    "m22_forecast_reconciliation",
    (s, d) => {
      val stepUs = BucketSeconds * 1000000L
      // bucket series in integer coordinates: t = bucket index rebased to
      // the global origin (shift keeps every OLS moment inside BIGINT/2^53),
      // y100 = exact centi-units of the 2-dp DECIMAL bucket sum
      val ser0 = Tables.events(s, d)
        .groupBy(col("event_type"), timestampBucket(col("ts"), BucketSeconds).as("b"))
        .agg(decSum(col("value")).as("demand"))
        .select(col("event_type"), expr(s"unix_micros(b) div $stepUs").as("tr"),
          floor(col("demand") * 100 + 0.5).cast("long").as("y100"))
      // common spine: every type gets every observed bucket, absent = 0
      val spine = ser0.select("event_type").distinct()
        .crossJoin(ser0.select("tr").distinct())
      val filled = spine.join(ser0, Seq("event_type", "tr"), "left")
        .na.fill(0L, Seq("y100"))
      val origin = ser0.agg(min("tr").as("t0"), max("tr").as("tmax"))
      val ser = filled.crossJoin(broadcast(origin))
        .select(col("event_type"), (col("tr") - col("t0")).as("t"), col("y100"),
          (col("tmax") - col("t0")).as("tg"), col("t0"))
      // per-child OLS line over integer moments (shift-safe, BIGINT-exact)
      def ols(df: DataFrame, keys: Seq[String]) = df.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("n"),
          sum("t").as("st"), sum("y100").as("sy"),
          sum(col("t") * col("t")).as("stt"),
          sum(col("t") * col("y100")).as("sty"),
          first("tg").as("tg"), first("t0").as("t0"))
        .withColumn("den",
          col("n").cast("double") * col("stt").cast("double") -
            col("st").cast("double") * col("st").cast("double"))
        .withColumn("b", when(col("den") === 0, lit(0.0)).otherwise(
          (col("n").cast("double") * col("sty").cast("double") -
            col("st").cast("double") * col("sy").cast("double")) / col("den")))
        .withColumn("a",
          (col("sy").cast("double") - col("b") * col("st").cast("double")) /
            col("n").cast("double"))
      val u = ols(ser, Seq("event_type"))
      val gSer = ser.groupBy("t", "tg", "t0").agg(sum("y100").as("y100"))
      val g = ols(gSer.withColumn("event_type", lit("_total")), Seq("event_type"))
        .select(col("a").as("ga"), col("b").as("gb"),
          col("tg").as("gtg"), col("t0").as("gt0"))
      val hs = s.range(1, 13).select(col("id").cast("int").as("h"))
      // child line evaluated at the global grid tg + h, 1e4-quantized in
      // centi-units (=> 1e6-scaled units) BEFORE the cross-child sum
      val qu = u.crossJoin(broadcast(hs))
        .withColumn("qv",
          floor((col("a") + col("b") * (col("tg") + col("h")).cast("double"))
            * 1e4 + 0.5).cast("long"))
      qu.groupBy("h").agg(sum("qv").as("sq"))
        .crossJoin(broadcast(g))
        .select(col("h"),
          timestamp_micros((col("gt0") + col("gtg") + col("h")) * stepUs)
            .as("forecast_timestamp"),
          ((col("ga") + col("gb") * (col("gtg") + col("h")).cast("double")) / 100.0)
            .as("global_direct"),
          (col("sq").cast("double") / 1e6).as("bottom_up_sum"),
          (((col("ga") + col("gb") * (col("gtg") + col("h")).cast("double")) / 100.0) /
            (col("sq").cast("double") / 1e6)).as("reconcile_ratio"))
    },
    Some(s"""WITH ser0 AS (
            |  SELECT event_type,
            |         epoch_us(time_bucket(INTERVAL '5 minutes', ts)) // ${300000000L} AS tr,
            |         CAST(floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) * 100 + 0.5) AS BIGINT) AS y100
            |  FROM events GROUP BY 1, 2),
            |sp AS (SELECT et.event_type, tt.tr
            |       FROM (SELECT DISTINCT event_type FROM ser0) et
            |       CROSS JOIN (SELECT DISTINCT tr FROM ser0) tt),
            |fl AS (SELECT sp.event_type, sp.tr, coalesce(ser0.y100, 0) AS y100
            |       FROM sp LEFT JOIN ser0 USING (event_type, tr)),
            |o AS (SELECT min(tr) AS t0, max(tr) AS tmax FROM ser0),
            |ser AS (SELECT event_type, tr - o.t0 AS t, y100,
            |               o.tmax - o.t0 AS tg, o.t0 AS t0 FROM fl, o),
            |u0 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
            |         CAST(sum(t) AS BIGINT) AS st, CAST(sum(y100) AS BIGINT) AS sy,
            |         CAST(sum(t * t) AS BIGINT) AS stt, CAST(sum(t * y100) AS BIGINT) AS sty,
            |         any_value(tg) AS tg FROM ser GROUP BY 1),
            |u1 AS (SELECT *, CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
            |         - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) AS den FROM u0),
            |u AS (SELECT *, CASE WHEN den = 0 THEN CAST(0 AS DOUBLE)
            |        ELSE (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
            |          - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE)) / den END AS b
            |      FROM u1),
            |ua AS (SELECT *, (CAST(sy AS DOUBLE) - b * CAST(st AS DOUBLE))
            |         / CAST(n AS DOUBLE) AS a FROM u),
            |gs0 AS (SELECT t, any_value(tg) AS tg, any_value(t0) AS t0,
            |          CAST(sum(y100) AS BIGINT) AS y100 FROM ser GROUP BY 1),
            |g0 AS (SELECT CAST(count(*) AS BIGINT) AS n,
            |         CAST(sum(t) AS BIGINT) AS st, CAST(sum(y100) AS BIGINT) AS sy,
            |         CAST(sum(t * t) AS BIGINT) AS stt, CAST(sum(t * y100) AS BIGINT) AS sty,
            |         any_value(tg) AS gtg, any_value(t0) AS gt0 FROM gs0),
            |g1 AS (SELECT *, CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
            |         - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) AS den FROM g0),
            |g2 AS (SELECT *, CASE WHEN den = 0 THEN CAST(0 AS DOUBLE)
            |         ELSE (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
            |           - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE)) / den END AS gb
            |       FROM g1),
            |g AS (SELECT gtg, gt0, gb, (CAST(sy AS DOUBLE) - gb * CAST(st AS DOUBLE))
            |        / CAST(n AS DOUBLE) AS ga FROM g2),
            |h AS (SELECT CAST(unnest(generate_series(1, 12)) AS INT) AS h),
            |qu AS (SELECT h.h, CAST(floor((ua.a + ua.b * CAST(ua.tg + h.h AS DOUBLE))
            |         * 1e4 + 0.5) AS BIGINT) AS qv
            |       FROM ua CROSS JOIN h),
            |sq AS (SELECT h, CAST(sum(qv) AS BIGINT) AS sq FROM qu GROUP BY 1)
            |SELECT sq.h, make_timestamp((g.gt0 + g.gtg + sq.h) * ${300000000L}) AS forecast_timestamp,
            |  (g.ga + g.gb * CAST(g.gtg + sq.h AS DOUBLE)) / 100.0 AS global_direct,
            |  CAST(sq.sq AS DOUBLE) / 1e6 AS bottom_up_sum,
            |  ((g.ga + g.gb * CAST(g.gtg + sq.h AS DOUBLE)) / 100.0)
            |    / (CAST(sq.sq AS DOUBLE) / 1e6) AS reconcile_ratio
            |FROM sq CROSS JOIN g""".stripMargin))

  /** M24 (beyond reference): local-level Kalman filter forecast — the
    * state-space member of the per-series family (m5 naive → m6 drift →
    * m7 AR(1) → m10 Holt → m11 HW → m20 Croston → this), and the simplest
    * model with a principled GROWING-uncertainty flat forecast: the level
    * is a random walk, so the h-step predictive variance widens by q per
    * step even though the point forecast is flat (naive's variance
    * heuristic, derived instead of assumed). Fixed q/r = 0.1/1.0; see the
    * kernel comment in [[forecast]]. The oracle replays the filter
    * recursion as a recursive CTE carrying (l, P, Σe²), recomputing
    * P_pred = P + q and K = P_pred/(P_pred + r) inline exactly as the
    * Scala fold does — every intermediate double bitwise-identical.
    *
    * Scale: the m5–m11 single-shuffle per-series kernel — one groupByKey
    * on series id, one ascending pass per series, state O(1).
    */
  val m24: GraftQuery = GraftQuery(
    "m24_forecast_kalman",
    forecastKernel("kalman"),
    Some(s"""WITH RECURSIVE base AS (
           |  SELECT user_id, time_bucket(INTERVAL '5 minutes', ts) AS b,
           |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/COUNT(value) AS demand
           |  FROM events GROUP BY 1, 2),
           |ser AS (SELECT user_id, list(demand ORDER BY b) AS y, max(b) AS last_b,
           |        CAST(count(*) AS INT) AS n FROM base GROUP BY 1),
           |rec AS (
           |  SELECT user_id, y, n, last_b, 1 AS i, y[1] AS l,
           |         CAST(1.0 AS DOUBLE) AS p, CAST(0 AS DOUBLE) AS s
           |  FROM ser
           |  UNION ALL
           |  SELECT user_id, y, n, last_b, i + 1,
           |         l + ((p + CAST(0.1 AS DOUBLE)) / ((p + CAST(0.1 AS DOUBLE)) + CAST(1.0 AS DOUBLE)))
           |             * (y[i+1] - l),
           |         (CAST(1.0 AS DOUBLE)
           |            - ((p + CAST(0.1 AS DOUBLE)) / ((p + CAST(0.1 AS DOUBLE)) + CAST(1.0 AS DOUBLE))))
           |           * (p + CAST(0.1 AS DOUBLE)),
           |         s + (y[i+1] - l) * (y[i+1] - l)
           |  FROM rec WHERE i < n),
           |sg AS (SELECT user_id, last_b, l, p,
           |       CASE WHEN n > 1 THEN s / CAST(n - 1 AS DOUBLE)
           |            ELSE CAST(0 AS DOUBLE) END AS s2 FROM rec WHERE i = n),
           |fc AS (SELECT user_id, last_b + h * INTERVAL '5 minutes' AS forecast_timestamp,
           |       l AS v,
           |       $Z90 * sqrt(s2 * ((p + h * CAST(0.1 AS DOUBLE) + CAST(1.0 AS DOUBLE))
           |                         / (p + CAST(0.1 AS DOUBLE) + CAST(1.0 AS DOUBLE)))) AS halfw
           |       FROM sg CROSS JOIN generate_series(1, 12) t(h))
           |SELECT user_id, forecast_timestamp, v AS forecast_value,
           |       v - halfw AS lo, v + halfw AS hi FROM fc""".stripMargin))

  /** Gradient-descent iterations for [[m25]] — fixed so both engines run
    * the identical optimization trajectory.
    */
  private val LogRegIters = 10

  /** Public DataFrame-in API (see graft.api.Graft): distributed
    * full-batch logistic-regression TRAINING inside the engine — the
    * ML.TRAIN counterpart to the m5-m24 forecast table functions. Fits
    * σ(w0 + w1·f1 + w2·f2) to a binary label by [[LogRegIters]] steps of
    * exact full-batch gradient descent (η = 1): per step ONE aggregate
    * over the feature table computes the gradient, the weight update
    * happens on the driver (a bounded 3-number collect per step — the
    * centroid-collect precedent, never data-sized), and the next step's
    * plan embeds the new weights as literals. Input columns: (y: double
    * 0/1, f1: double, f2: double). Returns one row
    * (n, w0, w1, w2, accuracy).
    *
    * Cross-engine determinism: σ is quantized to 1e-6 the instant it is
    * computed (exp is the one libm call — the x45 ulp-straddle residual
    * risk), every per-row gradient term is then quantized to an exact
    * BIGINT, so the gradient SUM is order-independent and the whole
    * 10-step trajectory is bitwise-replayable — the oracle runs it as a
    * recursive CTE whose state row carries (w0, w1, w2) plus the
    * feature lists, exactly the m10 discipline.
    *
    * Scale: one slim feature materialization (persisted — at 100 TB this
    * is the feature-table write every trainer does), then 10 × (scan +
    * 4-value reduce). No shuffle grows with iterations; the driver holds
    * 3 doubles.
    */
  /** 1e-6-quantized sigmoid of the linear score under weights `w`, as an
    * exact BIGINT in [0, 1e6] — the shared determinism seam of the
    * training loop, the accuracy readout, and [[logRegScoreDeciles]].
    */
  private def qsigL(w: (Double, Double, Double)): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val z = lit(w._1) + lit(w._2) * col("f1") + lit(w._3) * col("f2")
    floor((lit(1.0) / (lit(1.0) + exp(-z))) * 1e6 + 0.5).cast("long")
  }

  /** Z-score standardization from 1e-6-quantized decimal-exact moments —
    * the front half of [[trainLogReg]], shared with the scoring path so
    * train-time and serve-time features are identical by construction.
    */
  private def logRegStandardize(feats0: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    // Pass-through columns (e.g. a doc_id for [[logRegScoreById]]) ride
    // along untouched; m25/x60 pass bare (y, f1, f2) and are unaffected.
    val others = feats0.columns.filterNot(Set("y", "f1", "f2")).toSeq.map(col)
    val raw = feats0.select(others ++ Seq(col("y").cast("double").as("y"),
      col("f1").cast("double").as("f1"), col("f2").cast("double").as("f2")): _*)
    // Internal z-score standardization — what every GD trainer does, and
    // what makes η = 1 converge instead of oscillating on the dominant
    // feature. Moments come from 1e-6-quantized features accumulated as
    // exact DECIMALs (per-row long products fit; the SUM would overflow a
    // BIGINT at 10⁸ rows, hence decimal accumulation — DuckDB's HUGEINT
    // sum is the same exact integer), so μ and σ are bitwise-identical
    // cross-engine.
    def qf(c: org.apache.spark.sql.Column) =
      floor(c * 1e6 + 0.5).cast("long")
    def dsum(c: org.apache.spark.sql.Column) =
      sum(c.cast(DecimalType(38, 0))).cast("double")
    val mo = raw.agg(count(lit(1)).as("nn"),
      dsum(qf(col("f1"))).as("s1"), dsum(qf(col("f1")) * qf(col("f1"))).as("q1"),
      dsum(qf(col("f2"))).as("s2"), dsum(qf(col("f2")) * qf(col("f2"))).as("q2"))
      .head()
    require(mo.getAs[Long]("nn") > 0, "logReg: empty feature table")
    val nD = mo.getAs[Long]("nn").toDouble
    def mu(s: String) = (mo.getAs[Double](s) / 1e6) / nD
    def sd(q: String, s: String) =
      math.sqrt((mo.getAs[Double](q) / 1e12) / nD - mu(s) * mu(s))
    val (sd1, sd2) = (sd("q1", "s1"), sd("q2", "s2"))
    // A constant feature (sd == 0, or NaN from catastrophic cancellation)
    // would standardize to Infinity/NaN and GD would silently train
    // garbage weights — fail at plan build, like the forecast model's
    // require, not at readout.
    require(sd1 > 0 && sd2 > 0,
      s"logReg: feature standard deviations must be positive (sd1=$sd1, " +
        s"sd2=$sd2, n=${nD.toLong}) — a constant feature column cannot be " +
        "z-scored; drop or replace it")
    raw.select(others ++ Seq(col("y"),
      ((col("f1") - lit(mu("s1"))) / lit(sd1)).as("f1"),
      ((col("f2") - lit(mu("s2"))) / lit(sd2)).as("f2")): _*)
  }

  /** The [[LogRegIters]]-step GD loop over an (already standardized,
    * ideally persisted) feature table — returns the final weights.
    */
  private def logRegGD(feats: DataFrame): (Double, Double, Double) = {
    import org.apache.spark.sql.functions._
    def sq(w: (Double, Double, Double)) = qsigL(w).cast("double") / 1e6
    def qt(w: (Double, Double, Double), x: org.apache.spark.sql.Column) =
      floor((col("y") - sq(w)) * x * 1e6 + 0.5).cast("long")
    var w = (0.0, 0.0, 0.0)
    var i = 0
    while (i < LogRegIters) {
      val g = feats.agg(
        sum(qt(w, lit(1.0))).as("g0"), sum(qt(w, col("f1"))).as("g1"),
        sum(qt(w, col("f2"))).as("g2"), count(lit(1)).as("n")).head()
      val nD = g.getAs[Long]("n").toDouble
      w = (w._1 + (g.getAs[Long]("g0").toDouble / 1e6) / nD,
        w._2 + (g.getAs[Long]("g1").toDouble / 1e6) / nD,
        w._3 + (g.getAs[Long]("g2").toDouble / 1e6) / nD)
      i += 1
    }
    w
  }

  def trainLogReg(feats0: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val feats = logRegStandardize(feats0).persist()
    try {
      val w = logRegGD(feats)
      feats.agg(
        count(lit(1)).as("n"),
        (sum(when((qsigL(w) > 500000L) === (col("y") === 1.0), 1).otherwise(0))
          .cast("double") / count(lit(1)).cast("double")).as("accuracy"))
        .select(col("n"), lit(w._1).as("w0"), lit(w._2).as("w1"),
          lit(w._3).as("w2"), col("accuracy"))
    } finally { feats.unpersist(); () }
  }

  /** Public DataFrame-in API (see graft.api.Graft): model-based quality
    * filtering — the FineWeb-Edu/phi-style pipeline stage: TRAIN the
    * [[trainLogReg]] classifier on the labeled feature table, then SCORE
    * every row with the frozen weights and report the corpus score
    * histogram (decile = ⌊σ_q/10⁵⌋ of the 1e-6-quantized sigmoid,
    * clamped to 9). A curation run keeps the top deciles; the histogram
    * is the artifact that picks the threshold. Returns (decile, n_docs).
    *
    * Scale: training is [[LogRegIters]] scan+reduce passes, scoring is
    * ONE more codegen'd scan with the weights as literals — nothing
    * data-sized ever reaches the driver. Determinism: the trajectory is
    * m25's, and each score quantizes before bucketing, so the histogram
    * is exact cross-engine.
    */
  def logRegScoreDeciles(feats0: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val feats = logRegStandardize(feats0).persist()
    try {
      val w = logRegGD(feats)
      feats
        .groupBy(least(lit(9L),
          floor(qsigL(w).cast("double") / 100000.0).cast("long")).as("decile"))
        .agg(count(lit(1)).as("n_docs"))
    } finally { feats.unpersist(); () }
  }

  /** Per-row frozen-weight scores for an id-keyed feature table: train the
    * [[trainLogReg]] trajectory on (y, f1, f2), then emit each row's
    * 1e-6-quantized sigmoid score next to its id — the building block the
    * Pretrain capstone filters on (x60 reports the corpus histogram of the
    * same scores; this keys them). Determinism: qsig is the exact integer
    * quantization of the m25 trajectory's scoring expression, so a
    * threshold compare on it is cross-engine exact.
    */
  def logRegScoreById(feats0: DataFrame, idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.functions._
    val feats = logRegStandardize(feats0).persist()
    try {
      val w = logRegGD(feats)
      // materialize before unpersist: the caller's frame must not silently
      // recompute the 10-pass GD input once the cache is dropped
      feats.select(col(idCol), qsigL(w).as("qsig")).localCheckpoint()
    } finally { feats.unpersist(); () }
  }

  /** Shared feature/label shape for [[m25]]: predict lang == 'en' from
    * two document-shape features (token count / 100, chars per token —
    * the identical str_split semantics both engines expose).
    */
  private def logRegFeatures(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.documents(s, d).select(
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
      (size(split(col("text"), " ")).cast("double") / 100.0).as("f1"),
      (col("n_chars").cast("double") /
        size(split(col("text"), " ")).cast("double")).as("f2"))
  }

  /** M25 (beyond reference): in-engine logistic-regression training — see
    * [[trainLogReg]]. The oracle replays all 10 gradient steps as a
    * recursive CTE carrying the weights and the (order-aligned) feature
    * lists; every quantized σ, gradient term, and weight double is
    * bitwise-identical cross-engine, as is the final accuracy. (On this
    * synthetic corpus the shape features carry almost no lang signal, so
    * the converged model lands at the majority-class base rate — the
    * op's contract is the exact distributed training trajectory, not
    * this demo model's lift.)
    */
  val m25: GraftQuery = GraftQuery(
    "m25_train_logreg",
    (s, d) => trainLogReg(logRegFeatures(s, d)),
    Some(s"""WITH RECURSIVE f0 AS (
           |  SELECT doc_id, CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
           |                      ELSE CAST(0.0 AS DOUBLE) END AS y,
           |         CAST(len(str_split(text, ' ')) AS DOUBLE) / 100.0 AS f1,
           |         CAST(n_chars AS DOUBLE)
           |           / CAST(len(str_split(text, ' ')) AS DOUBLE) AS f2
           |  FROM documents),
           |fq AS (SELECT doc_id, y, f1, f2,
           |         CAST(floor(f1 * 1e6 + 0.5) AS BIGINT) AS qf1,
           |         CAST(floor(f2 * 1e6 + 0.5) AS BIGINT) AS qf2 FROM f0),
           |mo AS (SELECT CAST(count(*) AS DOUBLE) AS nd,
           |         CAST(sum(qf1) AS DOUBLE) AS s1, CAST(sum(qf1 * qf1) AS DOUBLE) AS q1,
           |         CAST(sum(qf2) AS DOUBLE) AS s2, CAST(sum(qf2 * qf2) AS DOUBLE) AS q2
           |       FROM fq),
           |f AS (SELECT doc_id, y,
           |        (f1 - (s1 / 1e6) / nd)
           |          / sqrt((q1 / 1e12) / nd - ((s1 / 1e6) / nd) * ((s1 / 1e6) / nd)) AS f1,
           |        (f2 - (s2 / 1e6) / nd)
           |          / sqrt((q2 / 1e12) / nd - ((s2 / 1e6) / nd) * ((s2 / 1e6) / nd)) AS f2
           |      FROM fq, mo),
           |ser AS (SELECT list(y ORDER BY doc_id) AS ys,
           |               list(f1 ORDER BY doc_id) AS f1s,
           |               list(f2 ORDER BY doc_id) AS f2s,
           |               CAST(count(*) AS BIGINT) AS n FROM f),
           |rec AS (
           |  SELECT ys, f1s, f2s, n, 0 AS i, CAST(0.0 AS DOUBLE) AS w0,
           |         CAST(0.0 AS DOUBLE) AS w1, CAST(0.0 AS DOUBLE) AS w2
           |  FROM ser
           |  UNION ALL
           |  SELECT ys, f1s, f2s, n, i + 1,
           |    w0 + (CAST(list_sum(list_transform(range(1, CAST(n + 1 AS INT)), k ->
           |      CAST(floor((ys[k] - CAST(floor((1.0 / (1.0 + exp(-(w0 + w1 * f1s[k] + w2 * f2s[k]))))
           |        * 1e6 + 0.5) AS BIGINT) / 1e6) * 1e6 + 0.5) AS BIGINT))) AS DOUBLE) / 1e6)
           |      / CAST(n AS DOUBLE),
           |    w1 + (CAST(list_sum(list_transform(range(1, CAST(n + 1 AS INT)), k ->
           |      CAST(floor((ys[k] - CAST(floor((1.0 / (1.0 + exp(-(w0 + w1 * f1s[k] + w2 * f2s[k]))))
           |        * 1e6 + 0.5) AS BIGINT) / 1e6) * f1s[k] * 1e6 + 0.5) AS BIGINT))) AS DOUBLE) / 1e6)
           |      / CAST(n AS DOUBLE),
           |    w2 + (CAST(list_sum(list_transform(range(1, CAST(n + 1 AS INT)), k ->
           |      CAST(floor((ys[k] - CAST(floor((1.0 / (1.0 + exp(-(w0 + w1 * f1s[k] + w2 * f2s[k]))))
           |        * 1e6 + 0.5) AS BIGINT) / 1e6) * f2s[k] * 1e6 + 0.5) AS BIGINT))) AS DOUBLE) / 1e6)
           |      / CAST(n AS DOUBLE)
           |  FROM rec WHERE i < $LogRegIters)
           |SELECT n, w0, w1, w2,
           |  CAST(list_sum(list_transform(range(1, CAST(n + 1 AS INT)), k ->
           |    CASE WHEN (CAST(floor((1.0 / (1.0 + exp(-(w0 + w1 * f1s[k] + w2 * f2s[k]))))
           |        * 1e6 + 0.5) AS BIGINT) > 500000) = (ys[k] = 1.0)
           |      THEN 1 ELSE 0 END)) AS DOUBLE) / CAST(n AS DOUBLE) AS accuracy
           |FROM rec WHERE i = $LogRegIters""".stripMargin))

  /** X60 (beyond reference): model-based quality filter — see
    * [[logRegScoreDeciles]]. The oracle replays m25's full training
    * trajectory, then scores every document with the frozen weights and
    * buckets the quantized sigmoid into deciles.
    */
  val x60: GraftQuery = GraftQuery(
    "x60_model_quality_filter",
    (s, d) => logRegScoreDeciles(logRegFeatures(s, d)),
    Some(s"""WITH RECURSIVE f0 AS (
           |  SELECT doc_id, CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
           |                      ELSE CAST(0.0 AS DOUBLE) END AS y,
           |         CAST(len(str_split(text, ' ')) AS DOUBLE) / 100.0 AS f1,
           |         CAST(n_chars AS DOUBLE)
           |           / CAST(len(str_split(text, ' ')) AS DOUBLE) AS f2
           |  FROM documents),
           |fq AS (SELECT doc_id, y, f1, f2,
           |         CAST(floor(f1 * 1e6 + 0.5) AS BIGINT) AS qf1,
           |         CAST(floor(f2 * 1e6 + 0.5) AS BIGINT) AS qf2 FROM f0),
           |mo AS (SELECT CAST(count(*) AS DOUBLE) AS nd,
           |         CAST(sum(qf1) AS DOUBLE) AS s1, CAST(sum(qf1 * qf1) AS DOUBLE) AS q1,
           |         CAST(sum(qf2) AS DOUBLE) AS s2, CAST(sum(qf2 * qf2) AS DOUBLE) AS q2
           |       FROM fq),
           |f AS (SELECT doc_id, y,
           |        (f1 - (s1 / 1e6) / nd)
           |          / sqrt((q1 / 1e12) / nd - ((s1 / 1e6) / nd) * ((s1 / 1e6) / nd)) AS f1,
           |        (f2 - (s2 / 1e6) / nd)
           |          / sqrt((q2 / 1e12) / nd - ((s2 / 1e6) / nd) * ((s2 / 1e6) / nd)) AS f2
           |      FROM fq, mo),
           |ser AS (SELECT list(y ORDER BY doc_id) AS ys,
           |               list(f1 ORDER BY doc_id) AS f1s,
           |               list(f2 ORDER BY doc_id) AS f2s,
           |               CAST(count(*) AS BIGINT) AS n FROM f),
           |rec AS (
           |  SELECT ys, f1s, f2s, n, 0 AS i, CAST(0.0 AS DOUBLE) AS w0,
           |         CAST(0.0 AS DOUBLE) AS w1, CAST(0.0 AS DOUBLE) AS w2
           |  FROM ser
           |  UNION ALL
           |  SELECT ys, f1s, f2s, n, i + 1,
           |    w0 + (CAST(list_sum(list_transform(range(1, CAST(n + 1 AS INT)), k ->
           |      CAST(floor((ys[k] - CAST(floor((1.0 / (1.0 + exp(-(w0 + w1 * f1s[k] + w2 * f2s[k]))))
           |        * 1e6 + 0.5) AS BIGINT) / 1e6) * 1e6 + 0.5) AS BIGINT))) AS DOUBLE) / 1e6)
           |      / CAST(n AS DOUBLE),
           |    w1 + (CAST(list_sum(list_transform(range(1, CAST(n + 1 AS INT)), k ->
           |      CAST(floor((ys[k] - CAST(floor((1.0 / (1.0 + exp(-(w0 + w1 * f1s[k] + w2 * f2s[k]))))
           |        * 1e6 + 0.5) AS BIGINT) / 1e6) * f1s[k] * 1e6 + 0.5) AS BIGINT))) AS DOUBLE) / 1e6)
           |      / CAST(n AS DOUBLE),
           |    w2 + (CAST(list_sum(list_transform(range(1, CAST(n + 1 AS INT)), k ->
           |      CAST(floor((ys[k] - CAST(floor((1.0 / (1.0 + exp(-(w0 + w1 * f1s[k] + w2 * f2s[k]))))
           |        * 1e6 + 0.5) AS BIGINT) / 1e6) * f2s[k] * 1e6 + 0.5) AS BIGINT))) AS DOUBLE) / 1e6)
           |      / CAST(n AS DOUBLE)
           |  FROM rec WHERE i < $LogRegIters),
           |fin AS (SELECT * FROM rec WHERE i = $LogRegIters),
           |ks AS (SELECT unnest(range(1, CAST(n AS INT) + 1)) AS k,
           |              w0, w1, w2, f1s, f2s FROM fin),
           |sc AS (SELECT least(9, CAST(floor((1.0 / (1.0 + exp(-(w0
           |         + w1 * f1s[CAST(k AS INT)] + w2 * f2s[CAST(k AS INT)]))))
           |         * 1e6 + 0.5) AS BIGINT) // 100000) AS decile FROM ks)
           |SELECT decile, CAST(count(*) AS BIGINT) AS n_docs
           |FROM sc GROUP BY 1""".stripMargin))

  val all: Seq[GraftQuery] =
    Seq(m3, m3b, m4, m4b, m5, m6, m7, m8, m9, m10, m11, m15, m16, m17, m18, m19, m20, m22,
      m24, m25, x60)
}
