package graft

import graft.functions.Funcs.withConfs

/** Jar-gated Iceberg integration (DIVERGENCES #6): the catalog seam in
  * graft.core.Tables / operators/Sources is provider-agnostic, and
  * operators/Snapshots reproduces the snapshot contract on Parquet; this
  * spec is the missing runtime half. It cancels (assume) while
  * `iceberg-spark-runtime` is absent, and the day the jar lands it proves —
  * with zero code change — that the same SQL surface the engine already
  * uses (CREATE/INSERT/SELECT, snapshot metadata, `VERSION AS OF` time
  * travel) runs against a real Iceberg hadoop catalog.
  *
  * The catalog confs are runtime-scoped (v2 catalog lookup reads SQLConf at
  * resolution time), so no special session is needed.
  */
class IcebergIntegrationSpec extends SparkSpec {

  test("iceberg hadoop catalog round-trip: DDL, insert, snapshots, time travel (jar-gated)") {
    assume(SparkSpec.canLoad("org.apache.iceberg.spark.SparkCatalog"),
      "iceberg-spark-runtime not on classpath — Parquet-provider coverage applies")
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft-iceberg-wh"
    withConfs(spark,
      "spark.sql.catalog.graft_ice" -> "org.apache.iceberg.spark.SparkCatalog",
      "spark.sql.catalog.graft_ice.type" -> "hadoop",
      "spark.sql.catalog.graft_ice.warehouse" -> wh) {
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_ice.db")
      spark.sql("DROP TABLE IF EXISTS graft_ice.db.t")
      spark.sql("CREATE TABLE graft_ice.db.t (id BIGINT, v STRING) USING iceberg")
      spark.sql("INSERT INTO graft_ice.db.t VALUES (1, 'a'), (2, 'b')")
      spark.sql("INSERT INTO graft_ice.db.t VALUES (3, 'c')")
      assert(spark.table("graft_ice.db.t").count() === 3L)

      // snapshot metadata table — the s21 snapshot-diff contract for real
      val snaps = spark.sql(
        "SELECT snapshot_id FROM graft_ice.db.t.snapshots ORDER BY committed_at")
        .collect().map(_.getLong(0))
      assert(snaps.length >= 2, "two inserts must leave two snapshots")

      // time travel — the s16 contract for real
      val atFirst = spark.sql(
        s"SELECT count(*) FROM graft_ice.db.t VERSION AS OF ${snaps.head}")
        .head().getLong(0)
      assert(atFirst === 2L, "the first snapshot must predate the second insert")

      spark.sql("DROP TABLE graft_ice.db.t")
    }
  }
}
