package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming semantics against an in-memory source (SURVEY §5.3): alert
  * filtering, latest-state with tombstone, multi-batch state evolution,
  * two concurrent queries (T7).
  */
class StreamingSpec extends SparkSpec {

  import SparkSpec.spark.implicits._

  private case class Update(id: Long, line: String, remaining: Long, lastStop: Boolean)

  test("alert branch emits exactly the rows matching the filter, append mode") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Update]
    val q = in.toDF().filter($"remaining" > 0)
      .writeStream.format("memory").queryName("st_alerts").outputMode("append").start()
    in.addData(Update(1, "A", 5, false), Update(2, "A", 0, false), Update(3, "B", 2, false))
    q.processAllAvailable()
    assert(spark.table("st_alerts").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
    q.stop()
  }

  test("latest-state branch: max_by per key, tombstone drops the line, complete mode") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Update]
    val q = in.toDF().groupBy($"line")
      .agg(max_by($"remaining", $"id").as("remaining"),
        max_by($"lastStop", $"id").as("tombstoned"))
      .filter(!$"tombstoned")
      .writeStream.format("memory").queryName("st_state").outputMode("complete").start()

    in.addData(Update(1, "A", 5, false), Update(2, "B", 7, false))
    q.processAllAvailable()
    assert(spark.table("st_state").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("A" -> 5L, "B" -> 7L))

    // state evolves across micro-batches; B's last update is a tombstone
    in.addData(Update(3, "A", 9, false), Update(4, "B", 0, true))
    q.processAllAvailable()
    assert(spark.table("st_state").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("A" -> 9L))
    q.stop()
  }

  test("two concurrent queries run from one source and awaitAnyTermination works") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Update]
    val df = in.toDF()
    val q1 = df.filter($"remaining" > 0).writeStream.format("memory")
      .queryName("st_t7_alerts").outputMode("append").start()
    val q2 = df.groupBy($"line").agg(count(lit(1)).as("n")).writeStream.format("memory")
      .queryName("st_t7_state").outputMode("complete").start()
    in.addData(Update(1, "A", 5, false), Update(2, "B", 0, false))
    q1.processAllAvailable(); q2.processAllAvailable()
    assert(spark.table("st_t7_alerts").count() === 1)
    assert(spark.table("st_t7_state").count() === 2)
    q1.stop(); q2.stop()
    spark.streams.awaitAnyTermination(1000)
  }

  test("file-source streaming query t5 equals its batch equivalent") {
    val streamed = graft.operators.StreamingOps.t5.build(spark, sf)
      .orderBy("user_id").collect()
    val batch = graft.operators.Relational.u3.build(spark, sf)
      .select("user_id", "last_type", "last_value", "last_event_id")
      .orderBy("user_id").collect()
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }
}
