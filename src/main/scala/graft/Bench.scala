package graft

import graft.core.Sessions
import org.apache.spark.sql.SparkSession

/** Benchmark harness: times every bench-tagged query at SPARK_GRAFT_SF_DIR,
  * forcing full execution with a noop-format write (count() would let
  * Catalyst collapse scan-only plans to metadata reads and under-measure).
  * Failures are reported per-query instead of being timed as if they ran.
  * Prints exactly one JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup on the smallest SF so per-query timings measure the
    // engine, not JIT compilation of the first query to run.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val results = SparkEntry.benchQueries.map { q =>
      val t0 = System.nanoTime()
      val ok =
        try { q.build(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}"); false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] ${q.name} $sec%.2fs ok=$ok")
      (q.name, sec, ok)
    }
    val okResults = results.filter(_._3)
    val qs = okResults.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = okResults.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
