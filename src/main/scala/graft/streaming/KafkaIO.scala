package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter}
import org.apache.spark.sql.Row

/** Kafka source/sink configuration surface (SURVEY.md §2.1 S9/S10, §2.10 T1;
  * reference assets/code/pyspark-job.py:121-168): builds fully-configured
  * streaming readers/writers with the reference's subscription, offset and
  * SASL options.
  *
  * The spark-sql-kafka connector jar is not shipped in this environment
  * (zero egress), so these builders are exercised up to option construction
  * in tests, and the file-source pipelines in
  * [[graft.operators.StreamingOps]] carry the end-to-end streaming
  * semantics. On a real cluster this is the only file that changes: call
  * `.load()` / `.start()` on the returned builders.
  */
object KafkaIO {

  final case class KafkaConf(
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "latest",
      saslMechanism: Option[String] = None, // e.g. OAUTHBEARER
      checkpointLocation: Option[String] = None)

  /** S9/T1: subscription source with the reference's options. */
  def source(spark: SparkSession, conf: KafkaConf): DataStreamReader = {
    val r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", conf.bootstrapServers)
      .option("subscribe", conf.topic)
      .option("startingOffsets", conf.startingOffsets)
    conf.saslMechanism.fold(r) { mech =>
      r.option("kafka.security.protocol", "SASL_SSL")
        .option("kafka.sasl.mechanism", mech)
    }
  }

  /** S10: value-topic sink, append mode, checkpointed. */
  def sink(df: DataFrame, conf: KafkaConf): DataStreamWriter[Row] = {
    val w = df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", conf.bootstrapServers)
      .option("topic", conf.topic)
      .outputMode("append")
    conf.checkpointLocation.fold(w)(c => w.option("checkpointLocation", c))
  }

  /** T8: the reference's graceful-shutdown + streaming schema-inference
    * session confs (pyspark-job.py:80-81), applied to a session.
    */
  def applyStreamingConfs(spark: SparkSession): Unit = {
    spark.conf.set("spark.streaming.stopGracefullyOnShutdown", "true")
    spark.conf.set("spark.sql.streaming.schemaInference", "true")
  }
}
