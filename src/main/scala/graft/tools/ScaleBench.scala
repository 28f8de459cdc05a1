package graft.tools

import graft.core.Sessions
import org.apache.spark.sql.SparkSession

/** The measured answer to "would this plan survive a 10x scale-up?" for
  * the WHOLE bench headline set (VERDICT r8 next-round #3) — SCALE.md's
  * per-family probe exponents, promoted to a committed per-query artifact.
  *
  * Runs every headline query at the base SF and at a `factor`x
  * shape-preserving replica (see [[ScaleProbe.replicate]] for why naive
  * row copies would measure the wrong workload), best-of-2 each with the
  * cache cleared per attempt, and writes SCALEBENCH.json with the
  * per-query measured exponent e = log(tf/t1)/log(f).
  *
  * Gate: any query with e > 1.15 is super-linear — a hidden scale-killer
  * — and FAILS the run, with one guard against self-deception: queries
  * whose 10x time is still under 2 s (or whose 1x time is under 0.3 s)
  * are recorded but not gated, because at those durations the "exponent"
  * measures scheduler jitter, not dataflow. The fixed-size families
  * (sim_* generate from the 25-line network; s17/s18/s21 are
  * write-dominated at any SF) naturally land near exponent 0.
  *
  * Usage: runMain graft.tools.ScaleBench [baseSfDir] [factor]
  */
object ScaleBench {

  final case class Row(name: String, t1: Double, tf: Double, exp: Double,
      gated: Boolean)

  private def time(s: SparkSession, name: String, dir: String): Double = {
    def once(): Double = {
      s.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(s, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val out = s"${System.getProperty("java.io.tmpdir")}/graft-scale/x$factor"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleProbe.replicate(spark, base, out, factor)

    try graft.SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val rows = graft.Bench.headline.toSeq.sorted.map { name =>
      val t1 = time(spark, name, base)
      val tf = time(spark, name, out)
      val exp = math.log(tf / t1) / math.log(factor.toDouble)
      val gated = tf >= 2.0 && t1 >= 0.3
      System.err.println(
        f"[scalebench] $name 1x=$t1%.2fs ${factor}x=$tf%.2fs exp=$exp%.2f gated=$gated")
      Row(name, t1, tf, exp, gated)
    }
    val violations = rows.filter(r => r.gated && r.exp > 1.15)
    val json = rows.map(r =>
        f""""${r.name}":{"t1":${r.t1}%.3f,"tf":${r.tf}%.3f,"exp":${r.exp}%.2f,"gated":${r.gated}%b}""")
      .mkString(",")
    val viol = violations.map("\"" + _.name + "\"").mkString("[", ",", "]")
    val doc =
      s"""{"base":"$base","factor":$factor,"queries":{$json},"violations":$viol}"""
    val w = new java.io.PrintWriter("SCALEBENCH.json", "UTF-8")
    try w.println(doc) finally w.close()
    println(doc)
    spark.stop()
    require(violations.isEmpty,
      s"super-linear headline queries at ${factor}x: ${violations.map(_.name)}")
  }
}
