package graft

import graft.functions.Funcs._
import org.apache.spark.sql.functions._

class FuncsSpec extends SparkSpec {

  import SparkSpec.spark.implicits._

  test("timestampBucket floors to the bucket start") {
    val df = Seq("2024-01-01 00:09:58.778549", "2024-01-01 00:05:00", "2024-01-01 00:04:59")
      .toDF("s").select(timestampBucket(to_timestamp($"s"), 300).as("b"))
    val got = df.collect().map(_.getTimestamp(0).toString)
    assert(got === Array("2024-01-01 00:05:00.0", "2024-01-01 00:05:00.0", "2024-01-01 00:00:00.0"))
  }

  test("timestampBucket property: multiple of 300, floor within one bucket") {
    val rng = new scala.util.Random(42)
    val epochs = Seq.fill(200)(math.abs(rng.nextLong()) % 4102444800L)
    val rows = epochs.toDF("e").select(timestamp_seconds($"e").as("ts"))
      .select(unix_timestamp(timestampBucket($"ts", 300)).as("b"), unix_timestamp($"ts").as("t"))
      .collect()
    rows.foreach { r =>
      val (b, t) = (r.getLong(0), r.getLong(1))
      assert(b % 300 === 0)
      assert(b <= t && t - b < 300)
    }
  }

  test("safeDivide returns 0 on zero or null divisor") {
    val df = Seq((1.0, 0.0), (1.0, 2.0)).toDF("a", "b")
      .select(safeDivide($"a", $"b").as("r"))
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(0.0, 0.5))
    val withNull = Seq((1.0, Option.empty[Double])).toDF("a", "b")
      .select(safeDivide($"a", $"b").as("r"))
    assert(withNull.head().getDouble(0) === 0.0)
  }

  test("MTA timestamp format round-trips at second grain") {
    val df = Seq("2024-06-05 14:03:02", "2024-01-01 00:00:00", "2024-12-31 12:59:59")
      .toDF("s")
      .select(to_timestamp($"s").as("ts"))
      .select($"ts", parseMtaTimestamp(formatMtaTimestamp($"ts")).as("rt"))
    assert(df.filter($"ts" =!= $"rt").count() === 0)
  }

  test("decSum is exact for 2-decimal inputs") {
    val vals = Seq(0.1, 0.2, 0.3, 185.22, 9.64, 106.03)
    val got = vals.toDF("v").agg(decSum($"v")).head().getDouble(0)
    assert(got === 301.49)
  }
}
