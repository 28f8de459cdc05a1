package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table IO layer over the driver-generated test data (TESTDATA.md): one
  * Parquet file per table at `sfDir`.
  *
  * This is the single seam where storage layout is decided. At 100 TB these
  * become Iceberg/Delta tables partitioned by their time keys and
  * sorted/clustered for min-max file skipping (reference clusters its 1e9-row
  * ridership fact by `transit_timestamp` — lakehouse_part1_load_data.py:574);
  * the query layer only ever sees a DataFrame, so swapping the loader is
  * enough. Scans stay declarative (`spark.read.parquet`) so Catalyst keeps
  * predicate pushdown + column pruning.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table carries a TIMESTAMP(NANOS) parquet column, which the
    * vectorized reader rejects. Read it as raw nanos and truncate to the
    * engine's microsecond grain with integral division (a double division
    * would lose precision above 2^53 ns); DuckDB applies the same ns -> us
    * truncation, so the two engines agree on values.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = loadEvents(s, d)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
