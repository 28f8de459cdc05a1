package graft

import graft.core.Sessions
import org.apache.spark.sql.SparkSession

/** Dev harness behind SCALE.md's wave probes: time registry queries at two
  * scale factors and print the measured scaling exponent
  * log(t2/t1)/log(sf2/sf1). Not part of the driver contract — a builder
  * tool, kept in-tree so the probe method is reproducible.
  *
  * Usage: runMain graft.ScaleProbe <sfDir1> <sfDir2> <sfRatio> <names,csv>
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir1, dir2, ratioS, namesS) = args.take(4)
    val ratio = ratioS.toDouble
    val names = namesS.split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the JIT/codegen path so t(1x) is not dominated by first-query cost
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"| op | t(1x) s | t(${ratio}%.0fx) s | exponent |")
    println("|---|---|---|---|")
    names.foreach { n =>
      time(n, dir1) // cold warm-up of this query's own plan shape
      val t1 = time(n, dir1)
      val t2 = time(n, dir2)
      val exp = math.log(t2 / t1) / math.log(ratio)
      println(f"| $n | $t1%.2f | $t2%.2f | $exp%.2f |")
    }
    spark.stop()
  }
}
