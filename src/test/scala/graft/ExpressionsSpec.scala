package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSpec {

  import SparkSpec.spark.implicits._

  GraftExtensions.register(spark)

  test("native timestamp_bucket equals the composed helper, incl. pre-1970") {
    val rng = new scala.util.Random(5)
    val epochs = Seq.fill(300)(rng.nextLong() % 4102444800L) // pos and neg
    val df = epochs.toDF("e").select(timestamp_seconds($"e").as("ts"))
      .select(
        graft.functions.Funcs.timestampBucket($"ts", 300).as("helper"),
        call_function("graft_timestamp_bucket", $"ts", lit(300L)).as("native"))
    assert(df.filter($"helper" =!= $"native").count() === 0)
  }

  test("native timestamp_bucket stays in whole-stage codegen") {
    val df = graft.core.Tables.events(spark, sf)
      .select(call_function("graft_timestamp_bucket", col("ts"), lit(300L)).as("b"))
    // whole-stage codegen renders as a "*(n)" prefix in executedPlan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_timestamp_bucket"), plan)
  }

  test("native graft_cosine equals the HOF fold form bitwise") {
    val e = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
    val a = e.select(col("vec_id"), col("e").as("a_e"))
    val b = e.select((col("vec_id") + 1).as("vec_id"), col("e").as("b_e"))
    val paired = a.join(b, "vec_id")
      .withColumn("native", call_function("graft_cosine", col("a_e"), col("b_e")))
      .withColumn("hof",
        expr("aggregate(zip_with(a_e, b_e, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)") /
          (sqrt(expr("aggregate(a_e, 0.0D, (acc, x) -> acc + x * x)")) *
            sqrt(expr("aggregate(b_e, 0.0D, (acc, x) -> acc + x * x)"))))
    assert(paired.count() > 0)
    assert(paired.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("native array_jaccard equals the composed intersect/union form") {
    val nonEmpty = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("a")),
      (Seq("a", "a", "b"), Seq("b", "b", "c")), // dup elements
      (Seq("x"), Seq.empty[String])
    ).toDF("a", "b")
      .select(
        call_function("graft_array_jaccard", $"a", $"b").as("native"),
        (size(array_intersect($"a", $"b")).cast("double") /
          size(array_union($"a", $"b"))).as("composed"))
      .collect()
    nonEmpty.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    assert(nonEmpty(0).getDouble(0) === 0.5)
    assert(nonEmpty(1).getDouble(0) === 1.0)

    // composed form raises ANSI divide-by-zero on empty/empty; the native
    // expression defines union=0 as similarity 0
    val empty = Seq((Seq.empty[String], Seq.empty[String])).toDF("a", "b")
      .select(call_function("graft_array_jaccard", $"a", $"b").as("native")).head()
    assert(empty.getDouble(0) === 0.0)
  }

  test("latest_by_seq typed aggregate matches max_by + tombstone semantics") {
    val df = Seq(
      ("a", 1L, 10.0, false), ("a", 3L, 30.0, false), ("a", 2L, 20.0, false),
      ("b", 1L, 5.0, false), ("b", 2L, 0.0, true), // b's latest is tombstoned
      ("c", 7L, 70.0, false)
    ).toDF("k", "seq", "v", "tomb")
    df.createOrReplaceTempView("lbs_test")
    val got = spark.sql(
      "SELECT k, graft_latest_by_seq(v, seq, tomb) AS lv FROM lbs_test GROUP BY k ORDER BY k")
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(got.toSeq === Seq("a" -> 30.0, "b" -> null, "c" -> 70.0))
  }

  test("graft_bottom_k: distinct, capped at k, sorted, merges across partitions") {
    import SparkSpec.spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    // 200 hashes with duplicates, spread over 8 partitions so the partial
    // buffers must merge; expected = 5 smallest distinct values
    val vals = (1 to 100).flatMap(i => Seq(i.toLong * 7, i.toLong * 7))
    val df = vals.toDF("h").repartition(8)
    df.createOrReplaceTempView("bk_test")
    val got = spark.sql("SELECT graft_bottom_k(h, 5) AS sk FROM bk_test")
      .head().getSeq[Long](0)
    assert(got === Seq(7L, 14L, 21L, 28L, 35L))
    // group smaller than k returns the whole distinct set, sorted
    val small = spark.sql(
      "SELECT graft_bottom_k(h, 64) AS sk FROM (SELECT * FROM bk_test WHERE h <= 21)")
      .head().getSeq[Long](0)
    assert(small === Seq(7L, 14L, 21L))
  }

  test("extensions class injects via SparkSessionExtensions API") {
    // separate session built with the extensions conf
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .appName("graft-ext-test")
      .getOrCreate()
    try {
      val r = s2.sql("SELECT graft_array_jaccard(array('a','b'), array('b')) AS j").head()
      assert(r.getDouble(0) === 0.5)
    } finally () // shared-JVM session: do not stop, it would kill the context
  }
}
