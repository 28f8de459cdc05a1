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

  /** Rides served from a MATERIALIZED snapshot table — the reference
    * dashboard polls the bus_rides TABLE, it never re-runs the simulation
    * per request (part2:629-631). The first call per (session, dir) runs
    * the sim once and writes a [[graft.core.Snapshots]] version; every
    * poll after that is a parquet scan whose lineage contains no sim
    * kernel at all, so dashboard QPS costs a scan + small agg, not a
    * simulation. ServeSpec asserts the second call re-executes nothing.
    */
  def servedRides(s: SparkSession, d: String): DataFrame =
    served.getOrElseUpdate((s, d), {
      val table = "serve_rides_" + Integer.toHexString(d.hashCode)
      graft.core.Snapshots.reset(table)
      graft.core.Snapshots.write(s, table, BusSim.rides(s, d))
      graft.core.Snapshots.latest(s, table)
    })

  private val served =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** GET /bus_lines — the dimension table (main.py:74-88 shape). */
  def busLines(s: SparkSession, d: String): DataFrame =
    BusSim.busLines(s, d, BusSim.stationCount(s, d))
      .select("bus_line_id", "bus_line", "frequency_minutes", "n_stops")

  /** GET /bus_state — latest per-line state from the simulation
    * (pyspark-job.py:177-204 shape: line, remaining, totals, last update).
    */
  def busState(s: SparkSession, d: String): DataFrame =
    servedRides(s, d)
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
    BusSim.demandRollup(servedRides(s, d))
      .filter(col("bus_line") === line).orderBy("bucket_ts")

  /** GET /rides window fetch (bq_service.py:52-86): rides inside a
    * timestamp window, with the ride id's YEAR rebased (the reference
    * rewrites 2024 ids to the current year via REGEXP_REPLACE) and
    * `timestamp_at_stop` shifted forward — the "serve history as if it
    * were happening now" trick the dashboard runs on every poll. The
    * reference anchors on now(); fixed window + fixed shift keep it
    * deterministic and oracle-checkable.
    */
  def ridesWindow(s: SparkSession, d: String, start: String, stop: String,
      shiftDays: Int): DataFrame =
    servedRides(s, d)
      .filter(col("timestamp_at_stop").between(
        lit(start).cast("timestamp"), lit(stop).cast("timestamp")))
      .withColumn("bus_ride_id", regexp_replace(col("bus_ride_id"),
        "^(\\d+)_(\\d{4})-(\\d{2})-(\\d{2})_(\\d{2})-(\\d{2})-(\\d{2})$",
        "$1_2025-$3-$4_$5-$6-$7"))
      .withColumn("timestamp_at_stop",
        col("timestamp_at_stop") + expr(s"INTERVAL $shiftDays DAYS"))

  /** Replay feed (kafka_service.py:71-104): historical rides rebased onto a
    * fixed anchor, as the JSON envelopes the producer would emit, in send
    * order. The reference paces 1 msg/sec from a driver loop; pacing is a
    * client concern — this returns the ordered payload stream.
    */
  def replayFeed(s: SparkSession, d: String, anchor: String): DataFrame = {
    val rides = servedRides(s, d)
    val maxTs = rides.agg(max("timestamp_at_stop")).head().getTimestamp(0)
    rides
      .withColumn("send_ts",
        col("timestamp_at_stop") + (lit(anchor).cast("timestamp") - lit(maxTs)))
      .select(col("send_ts"),
        to_json(struct(col("bus_ride_id"), col("bus_line"), col("bus_stop_id"),
          col("remaining_at_stop"), col("send_ts").as("timestamp_at_stop"))).as("payload"))
      .orderBy("send_ts")
  }

  /** The windowed ride fetch as a driver-checked query: the full sim
    * pipeline + the serve-layer rebase, hash-proven end to end (the DuckDB
    * oracle replays the simulation fold AND the regex/shift/window).
    */
  val serveRidesWindow: graft.api.GraftQuery = graft.api.GraftQuery(
    "serve_rides_window",
    (s, d) => ridesWindow(s, d, "2024-01-02 06:00:00", "2024-01-02 12:00:00", 365),
    Some(BusSim.simFoldSql +
      """SELECT regexp_replace(bus_ride_id,
        |    '^(\d+)_(\d{4})-(\d{2})-(\d{2})_(\d{2})-(\d{2})-(\d{2})$',
        |    '\1_2025-\3-\4_\5-\6-\7') AS bus_ride_id,
        |  bus_line_id, bus_line, bus_size, seating_capacity, standing_capacity,
        |  total_capacity, bus_stop_id, bus_stop_index, last_stop,
        |  timestamp_at_stop + to_days(365) AS timestamp_at_stop,
        |  waiting_passengers, passengers_boarding, passengers_alighting,
        |  passengers_on_bus, remaining_at_stop
        |FROM fold
        |WHERE timestamp_at_stop BETWEEN TIMESTAMP '2024-01-02 06:00:00'
        |  AND TIMESTAMP '2024-01-02 12:00:00'""".stripMargin))

  /** Search endpoint: top-k documents by Okapi BM25 against the engine's
    * fixed demo query terms (see [[graft.operators.TextOps.bm25Score]] —
    * the term list is the per-request parameterization seam). Serving
    * shape at scale: the scoring is one scan + broadcast df/stats joins,
    * and the top-k is a TakeOrdered (per-partition heads, no global
    * sort); a production deployment fronts this with the x31 scores
    * materialized as an inverted index, same dataflow.
    */
  def docSearch(s: SparkSession, d: String, k: Int = 10): DataFrame =
    graft.operators.TextOps.bm25Score(graft.core.Tables.documents(s, d))
      .orderBy(col("bm25").desc, col("doc_id")).limit(k)

  /** The search endpoint as a driver-checked query: the x31 scoring SQL
    * wrapped with the identical deterministic top-10 (score-desc, doc-id
    * tie-break).
    */
  val serveDocSearch: graft.api.GraftQuery = graft.api.GraftQuery(
    "serve_doc_search",
    (s, d) => docSearch(s, d),
    graft.operators.TextOps.x31.oracle.map(x31Sql =>
      s"""SELECT doc_id, bm25 FROM ($x31Sql)
         |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin))

  /** Vector-search endpoint: top-k neighbors of the demo query vectors
    * (vec_id < 5 — the per-request parameterization seam), served from
    * the PERSISTED IVF index: built once per sf dir under a
    * _SUCCESS-gated scratch (the s26 seed pattern), so every subsequent
    * request pays only the centroid broadcast + partition-pruned posting
    * reads — the build-once/query-many serving shape next to
    * [[docSearch]]'s text arm (a production deployment fuses the two with
    * x62's RRF).
    */
  def vecSearch(s: SparkSession, d: String, k: Int = 3): DataFrame = {
    val sfLeaf = new java.io.File(d).getName
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-scratch/serve_vecidx_$sfLeaf"
    val emb = graft.core.Tables.embeddings(s, d)
    // gate on BOTH success markers (the s26 rule: a half-built scratch
    // must re-seed, not get trusted)
    if (!(new java.io.File(s"$path/centroids/_SUCCESS").exists() &&
          new java.io.File(s"$path/postings/_SUCCESS").exists()))
      graft.operators.VectorOps.buildIvfIndex(emb, path)
    graft.operators.VectorOps.searchIvfIndex(s, path,
      emb.filter(col("vec_id") < 5), k = k, probes = 2)
  }

  /** The vector endpoint as a driver-checked query — the v2 IVF replay
    * (same centroids/assignment/probing), q = the demo query set.
    */
  val serveVecSearch: graft.api.GraftQuery = graft.api.GraftQuery(
    "serve_vec_search",
    (s, d) => vecSearch(s, d),
    Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |cents AS (SELECT vec_id AS k_id, e AS ke FROM v
           |          ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
           |assign AS (SELECT vec_id, e, k_id AS cluster FROM (
           |  SELECT v.vec_id, v.e, c.k_id, row_number() OVER (PARTITION BY v.vec_id
           |    ORDER BY list_cosine_similarity(v.e, c.ke) DESC, c.k_id) AS rk
           |  FROM v CROSS JOIN cents c) WHERE rk = 1),
           |q AS (SELECT * FROM v WHERE vec_id < 5),
           |probes AS (SELECT vec_id AS q_id, e AS qe, k_id AS cluster FROM (
           |  SELECT q.vec_id, q.e, c.k_id, row_number() OVER (PARTITION BY q.vec_id
           |    ORDER BY list_cosine_similarity(q.e, c.ke) DESC, c.k_id) AS rk
           |  FROM q CROSS JOIN cents c) WHERE rk <= 2)
           |SELECT q_id, neighbor_id, cos FROM (
           |  SELECT p.q_id, a.vec_id AS neighbor_id, list_cosine_similarity(p.qe, a.e) AS cos
           |  FROM probes p JOIN assign a USING (cluster) WHERE a.vec_id != p.q_id)
           |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) <= 3""".stripMargin))

  val all: Seq[graft.api.GraftQuery] =
    Seq(serveRidesWindow, serveDocSearch, serveVecSearch)
}

/** Thin CLI over [[QueryService]]: `runMain graft.serve.ServeCli <sfDir>
  * <bus_lines|bus_state|demand|rides|replay|doc_search|vec_search> [arg]`
  * — prints JSON lines, the same
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
      case "rides"     => QueryService.ridesWindow(spark, sfDir,
        "2024-01-02 06:00:00", "2024-01-02 12:00:00", 365).limit(20)
      case "replay"    => QueryService.replayFeed(spark, sfDir, "2025-06-01 00:00:00").limit(20)
      case "doc_search" => QueryService.docSearch(spark, sfDir)
      case "vec_search" => QueryService.vecSearch(spark, sfDir)
      case other       => sys.error(s"unknown command: $other")
    }
    df.toJSON.collect().foreach(println)
    spark.stop()
  }
}
