package graft.serve

import graft.core.Tables
import graft.sim.BusSim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The webapp query surface (reference webapp/buses-dashboard: bq_service.py,
  * main.py endpoints) as library functions — each Flask endpoint maps to one
  * pre-built DataFrame the dashboard would poll. No web framework: the
  * reference's UI layer is out of engine scope (SURVEY §3.3); these are the
  * query semantics behind it.
  */
object QueryService {

  /** GET /bus_lines — the dimension table (main.py:74-88 shape). */
  def busLines(s: SparkSession, d: String): DataFrame =
    BusSim.busLines(s, d, BusSim.stationCount(s, d))
      .select("bus_line_id", "bus_line", "frequency_minutes", "n_stops")

  /** GET /bus_state — latest per-line state from the simulation
    * (pyspark-job.py:177-204 shape: line, remaining, totals, last update).
    */
  def busState(s: SparkSession, d: String): DataFrame =
    BusSim.rides(s, d)
      .groupBy("bus_line_id", "bus_line")
      .agg(
        max_by(col("remaining_at_stop"), struct(col("timestamp_at_stop"), col("bus_ride_id")))
          .as("remaining_at_stop"),
        max_by(col("passengers_on_bus"), struct(col("timestamp_at_stop"), col("bus_ride_id")))
          .as("total_passengers"),
        max_by(col("total_capacity"), struct(col("timestamp_at_stop"), col("bus_ride_id")))
          .as("total_capacity"),
        max(col("timestamp_at_stop")).as("update_timestamp"))

  /** GET /demand?line=... — per-line demand series (bq_service.py:33-50). */
  def demandByLine(s: SparkSession, d: String, line: String): DataFrame =
    BusSim.endToEnd(s, d).filter(col("bus_line") === line).orderBy("bucket_ts")

  /** Replay feed (kafka_service.py:71-104): historical rides rebased onto a
    * fixed anchor, as the JSON envelopes the producer would emit, in send
    * order. The reference paces 1 msg/sec from a driver loop; pacing is a
    * client concern — this returns the ordered payload stream.
    */
  def replayFeed(s: SparkSession, d: String, anchor: String): DataFrame = {
    val rides = BusSim.rides(s, d)
    val maxTs = rides.agg(max("timestamp_at_stop")).head().getTimestamp(0)
    rides
      .withColumn("send_ts",
        col("timestamp_at_stop") + (lit(anchor).cast("timestamp") - lit(maxTs)))
      .select(col("send_ts"),
        to_json(struct(col("bus_ride_id"), col("bus_line"), col("bus_stop_id"),
          col("remaining_at_stop"), col("send_ts").as("timestamp_at_stop"))).as("payload"))
      .orderBy("send_ts")
  }
}

/** Thin CLI over [[QueryService]]: `runMain graft.serve.ServeCli <sfDir>
  * <bus_lines|bus_state|demand|replay> [arg]` — prints JSON lines, the same
  * wire format the dashboard polls for.
  */
object ServeCli {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cmd = if (args.length > 1) args(1) else "bus_lines"
    val spark = graft.core.Sessions.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = cmd match {
      case "bus_lines" => QueryService.busLines(spark, sfDir)
      case "bus_state" => QueryService.busState(spark, sfDir)
      case "demand"    => QueryService.demandByLine(spark, sfDir, args(2))
      case "replay"    => QueryService.replayFeed(spark, sfDir, "2025-06-01 00:00:00").limit(20)
      case other       => sys.error(s"unknown command: $other")
    }
    df.toJSON.collect().foreach(println)
    spark.stop()
  }
}
