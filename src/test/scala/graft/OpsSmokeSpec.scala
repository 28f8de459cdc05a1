package graft

import org.apache.spark.sql.functions._

/** Every registry query must build and run at sf0.001; targeted row-level
  * assertions where semantics pin the answer.
  */
class OpsSmokeSpec extends SparkSpec {

  private lazy val results =
    SparkEntry.registry.map(q => q.name -> q.build(spark, sf)).toMap

  test("registry has no duplicate names and every oracle key exists") {
    assert(SparkEntry.queries.keySet == SparkEntry.registry.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  for (q <- SparkEntry.registry) {
    test(s"${q.name} runs and has a sane schema") {
      val df = results(q.name)
      assert(df.schema.fields.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("j5 conservation invariant returns zero rows") {
    assert(results("j5_verification_residual").count() === 0)
  }

  test("o3 returns exactly 10 rows in descending price order") {
    val rows = results("o3_limit_topk").collect()
    assert(rows.length === 10)
    val prices = rows.map(_.getDouble(1))
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("w1 dedup keeps exactly one row per (user, event_type)") {
    val df = results("w1_rownumber_dedup")
    assert(df.groupBy("user_id", "event_type").count().filter(col("count") > 1).count() === 0)
  }

  test("x1 exact dedup covers every document") {
    val total = results("x1_exact_dedup_md5").agg(sum("n")).head().getLong(0)
    assert(total === graft.core.Tables.documents(spark, sf).count())
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
