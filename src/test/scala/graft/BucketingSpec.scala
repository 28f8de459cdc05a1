package graft

import graft.operators.{Relational, Sources}
import org.apache.spark.sql.functions._

/** Plan-shape gates for the scale techniques: bucketing must actually
  * remove the exchange, and salting must actually flatten the hot key.
  */
class BucketingSpec extends SparkSpec {

  test("s17 bucketed join plans with NO exchange on either side") {
    val join = Sources.bucketedJoin(spark, sf)
    val plan = join.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan must use the bucket layout:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    // a local per-bucket Sort remains: Spark only elides it via the legacy
    // bucketed-scan-ordering flag; the shuffle is the cost that matters
  }

  test("s17 result matches the plain (unbucketed) join") {
    val bucketed = Sources.s17.build(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val plain = graft.core.Tables.orders(spark, sf)
      .join(graft.core.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"), graft.functions.Funcs.decSum(col("o_totalprice")).as("total"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(bucketed.sameElements(plain))
  }

  test("j12 salting flattens the hot key across salt buckets") {
    // the raw skewed key piles ~1/3 of lineitem onto key 1; after salting,
    // the hot key's rows spread across 8 (key, salt) groups of similar size
    val fact = graft.core.Tables.lineitem(spark, sf)
      .withColumn("k", when(pmod(col("l_partkey"), lit(3)) === 0, lit(1))
        .otherwise(col("l_partkey")))
      .withColumn("salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(8)))
    val hot = fact.filter(col("k") === 1).groupBy("salt").count().collect()
    assert(hot.length === 8, "hot key must occupy all 8 salt buckets")
    val sizes = hot.map(_.getLong(1))
    assert(sizes.max.toDouble / sizes.min < 2.0,
      s"salted buckets should be near-uniform: ${sizes.mkString(",")}")
  }

  test("a14/a15 sketch gates hold") {
    assert(Relational.a14.build(spark, sf).filter(!col("within_5pct")).count() === 0)
    assert(Relational.a15.build(spark, sf).filter(!col("within_2pct")).count() === 0)
  }
}
