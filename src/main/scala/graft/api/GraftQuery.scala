package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability, exposed to the driver harness.
  *
  * @param name   stable id, prefixed by the SURVEY.md §2 operator id it covers
  * @param build  (session, sfDir) => result DataFrame
  * @param oracle equivalent DuckDB SQL over the same parquet tables; None for
  *               ops whose semantics DuckDB cannot replicate (driver then does
  *               a rows-only check)
  * @param bench  include in the Bench harness run
  */
final case class GraftQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    bench: Boolean = true)

object GraftQuery {
  /** Assemble registries into the driver-contract maps, detecting dup names. */
  def toMaps(all: Seq[GraftQuery])
      : (Map[String, (SparkSession, String) => DataFrame], Map[String, String]) = {
    val dups = all.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(",")}")
    (all.map(q => q.name -> q.build).toMap,
      all.collect { case GraftQuery(n, _, Some(sql), _) => n -> sql }.toMap)
  }
}
