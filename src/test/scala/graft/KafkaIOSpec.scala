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

  /** Jar-gated integration (DIVERGENCES #7): the day the environment gains
    * `spark-sql-kafka-0-10`, this activates with zero code change and
    * proves the option surface actually resolves the Kafka provider and
    * yields the fixed Kafka schema. Until then it cancels (assume), which
    * scalatest reports as canceled, not failed.
    */
  test("kafka source resolves the connector and exposes the Kafka schema (jar-gated)") {
    assume(SparkSpec.canLoad("org.apache.spark.sql.kafka010.KafkaSourceProvider"),
      "spark-sql-kafka not on classpath — option-surface-only coverage applies")
    val df = KafkaIO.source(spark,
      KafkaConf("broker:9092", "bus-updates", startingOffsets = "earliest")).load()
    assert(df.isStreaming)
    assert(df.schema.fieldNames.toSet === Set(
      "key", "value", "topic", "partition", "offset", "timestamp", "timestampType"))
  }

  test("T8 streaming confs are applied to the session") {
    KafkaIO.applyStreamingConfs(spark)
    assert(spark.conf.get("spark.streaming.stopGracefullyOnShutdown") === "true")
    assert(spark.conf.get("spark.sql.streaming.schemaInference") === "true")
  }
}
