package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory: one place for the confs that affect plan quality.
  *
  * AQE stays on (runtime shuffle-partition coalescing + skew-join splitting —
  * the 100-TB safety nets); shuffle partitions default to the local core
  * count so local runs don't pay 200-task scheduling overhead, while a real
  * cluster deployment would size this to 2-3x total cores. Session time zone
  * is pinned to UTC so timestamp functions are reproducible against the
  * DuckDB oracle.
  */
object Sessions {

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    configure(SparkSession.builder().master(s"local[$cores]"), cores).getOrCreate()

  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      // Let AQE re-optimize (coalesce/skew-split) plans that sit under a
      // cache: off (the default) every .cache()'d stage of a composed
      // pipeline (curate, the pretrain ladder, the sim rides table)
      // executes with raw static shuffle partitioning — locally that is
      // dozens of near-empty tasks per cached stage; at scale it is the
      // same skew/coalesce exposure AQE exists to fix. The trade (cached
      // plan partitioning may change between runs) only matters to
      // consumers that depend on cached output partitioning, which this
      // engine never does.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
}
