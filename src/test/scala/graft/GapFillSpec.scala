package graft

import graft.operators.GapFill
import org.apache.spark.sql.functions._

class GapFillSpec extends SparkSpec {

  import SparkSpec.spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val sparse = Seq(
    (1L, ts("2024-01-01 00:00:00"), 10.0),
    (1L, ts("2024-01-01 00:15:00"), 40.0), // 2 missing buckets between
    (1L, ts("2024-01-01 00:20:00"), 20.0),
    (2L, ts("2024-01-01 00:00:00"), 5.0)   // single-point series
  ).toDF("user_id", "bucket_ts", "demand")

  private lazy val filled =
    GapFill.linear(sparse, Seq("user_id"), "bucket_ts", "demand", 300)
      .orderBy("user_id", "bucket_ts").collect()

  test("spine is dense: one row per 5-min bucket from min to max per key") {
    val u1 = filled.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getTimestamp(1).toString) === Array(
      "2024-01-01 00:00:00.0", "2024-01-01 00:05:00.0", "2024-01-01 00:10:00.0",
      "2024-01-01 00:15:00.0", "2024-01-01 00:20:00.0"))
  }

  test("observed points are preserved exactly") {
    val byTs = filled.filter(_.getLong(0) == 1L)
      .map(r => r.getTimestamp(1).toString -> r.getDouble(2)).toMap
    assert(byTs("2024-01-01 00:00:00.0") === 10.0)
    assert(byTs("2024-01-01 00:15:00.0") === 40.0)
    assert(byTs("2024-01-01 00:20:00.0") === 20.0)
  }

  test("gaps are linearly interpolated") {
    val byTs = filled.filter(_.getLong(0) == 1L)
      .map(r => r.getTimestamp(1).toString -> r.getDouble(2)).toMap
    assert(byTs("2024-01-01 00:05:00.0") === 20.0) // 10 + (40-10)*1/3
    assert(byTs("2024-01-01 00:10:00.0") === 30.0) // 10 + (40-10)*2/3
  }

  test("single-point series yields exactly its own point") {
    val u2 = filled.filter(_.getLong(0) == 2L)
    assert(u2.length === 1 && u2.head.getDouble(2) === 5.0)
  }

  test("kernel variant agrees exactly with the window variant") {
    val base = graft.core.Tables.events(spark, sf)
      .groupBy($"user_id", graft.functions.Funcs.timestampBucket($"ts", 300).as("bucket_ts"))
      .agg(avg("value").as("demand"))
    val win = GapFill.linear(base, Seq("user_id"), "bucket_ts", "demand", 300)
      .orderBy("user_id", "bucket_ts").collect().map(_.toSeq)
    val ker = GapFill.linearKernel(base, "user_id", "bucket_ts", "demand", 300)
      .orderBy("user_id", "bucket_ts").collect().map(_.toSeq)
    assert(win.length === ker.length)
    win.zip(ker).foreach { case (a, b) => assert(a === b) }
  }

  test("kernel variant matches on the crafted sparse fixture too") {
    val ker = GapFill.linearKernel(sparse, "user_id", "bucket_ts", "demand", 300)
      .orderBy("user_id", "bucket_ts").collect().map(_.toSeq)
    assert(ker.toSeq === filled.map(_.toSeq).toSeq)
  }

  test("interpolated values stay within the bracketing observations") {
    val out = GapFill.linear(
      graft.core.Tables.events(spark, sf)
        .groupBy($"user_id", graft.functions.Funcs.timestampBucket($"ts", 300).as("bucket_ts"))
        .agg(avg("value").as("demand")),
      Seq("user_id"), "bucket_ts", "demand", 300)
    val (mn, mx) = {
      val r = out.agg(min("demand"), max("demand")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (omn, omx) = {
      val r = graft.core.Tables.events(spark, sf).agg(min("value"), max("value")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    assert(mn >= omn - 1e-9 && mx <= omx + 1e-9)
  }
}
