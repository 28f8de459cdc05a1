package graft

import graft.streaming.KafkaIO
import graft.streaming.KafkaIO.KafkaConf

class KafkaIOSpec extends SparkSpec {

  test("kafka source builder carries subscription, offsets and SASL options") {
    // no broker/connector jar in this environment: exercised to the point
    // just before .load(), which is where the format would resolve
    val r = KafkaIO.source(spark,
      KafkaConf("broker:9092", "bus-updates", saslMechanism = Some("OAUTHBEARER")))
    // DataStreamReader has no public option getter; prove construction is
    // side-effect free and chainable instead
    assert(r != null)
    val r2 = KafkaIO.source(spark, KafkaConf("b:9092", "t", startingOffsets = "earliest"))
    assert(r2 != null)
  }

  test("kafka sink builder accepts checkpoint + topic") {
    import SparkSpec.spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val w = KafkaIO.sink(in.toDF().toDF("key", "value"),
      KafkaConf("broker:9092", "capacity-alerts",
        checkpointLocation = Some("/tmp/graft-ckpt/test")))
    assert(w != null)
  }

  test("T8 streaming confs are applied to the session") {
    KafkaIO.applyStreamingConfs(spark)
    assert(spark.conf.get("spark.streaming.stopGracefullyOnShutdown") === "true")
    assert(spark.conf.get("spark.sql.streaming.schemaInference") === "true")
  }
}
