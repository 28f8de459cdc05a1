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

  test("j11 as-of: matched purchase is at-or-before the click, per user") {
    val ev = graft.core.Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("asof_purchase_id"))
    val matched = results("j11_asof_join").filter(col("asof_purchase_id").isNotNull)
    val bad = matched.join(purchases, Seq("asof_purchase_id"))
      .filter(col("p_user") =!= col("user_id") || col("p_ts") > col("ts"))
    assert(bad.count() === 0)
    // and no LATER purchase is still at-or-before the click (true as-of)
    val latest = matched
      .join(purchases.select(col("p_user"), col("p_ts")),
        col("p_user") === col("user_id") && col("p_ts") <= col("ts"))
      .groupBy("event_id", "asof_purchase_id").agg(max("p_ts").as("best_ts"))
    val notBest = latest
      .join(purchases.select(col("asof_purchase_id"), col("p_ts")), Seq("asof_purchase_id"))
      .filter(col("p_ts") < col("best_ts"))
    assert(notBest.count() === 0)
    assert(results("j11_asof_join").count() ===
      ev.filter(col("event_type") === "click").count())
  }

  test("w2 sessionize: sessions are disjoint and gaps within a session <= 30 min") {
    val s2 = results("w2_sessionize")
    // session event counts sum to the full stream
    val total = s2.agg(sum("n_events")).head().getLong(0)
    assert(total === graft.core.Tables.events(spark, sf).count())
    // consecutive sessions of a user are separated by > 30 min
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_seq")
    val gaps = s2.withColumn("prev_end", lag("session_end", 1).over(w))
      .filter(col("prev_end").isNotNull)
      .filter(unix_timestamp(col("session_start")) - unix_timestamp(col("prev_end")) <= 1800)
    assert(gaps.count() === 0)
  }

  test("a18 grouping sets: grand-total row equals the full table count") {
    val df = results("a18_grouping_sets")
    val grand = df.filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
    assert(grand.count() === 1)
    assert(grand.head().getLong(2) === graft.core.Tables.lineitem(spark, sf).count())
    // per-flag subtotals re-aggregate to the grand total
    val flags = df.filter(col("l_returnflag").isNotNull && col("l_linestatus").isNull)
    assert(flags.agg(sum("n")).head().getLong(0) === grand.head().getLong(2))
  }

  test("w3 lead/lag: exactly one null-delta row per user, count preserved") {
    val df = results("w3_lead_lag_delta")
    val ev = graft.core.Tables.events(spark, sf)
    assert(df.count() === ev.count())
    val firsts = df.filter(col("delta").isNull).groupBy("user_id").count()
    assert(firsts.filter(col("count") =!= 1).count() === 0)
    assert(firsts.count() === ev.select("user_id").distinct().count())
  }

  test("s22 compaction preserves every order row") {
    val df = results("s22_compaction")
    assert(df.agg(sum("n")).head().getLong(0) ===
      graft.core.Tables.orders(spark, sf).count())
  }

  test("t16 streaming sessions: disjoint per user, events conserved") {
    val t16 = results("t16_stream_session_window")
    assert(t16.agg(sum("n_events")).head().getLong(0) ===
      graft.core.Tables.events(spark, sf).count())
    // session_window end = last event + gap; consecutive sessions never overlap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_start")
    val overlaps = t16.withColumn("prev_end", lag("session_end", 1).over(w))
      .filter(col("prev_end").isNotNull && col("session_start") < col("prev_end"))
    assert(overlaps.count() === 0)
  }

  test("j13 range join: every match inside its window, none missed") {
    val ev = graft.core.Tables.events(spark, sf)
      .select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    val got = results("j13_range_join").select("event_id", "window_day").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    assert(got.nonEmpty)
    got.foreach { case (id, day) =>
      val off = ev(id).getTime - day.getTime
      assert(off >= 8L * 3600000 && off < 16L * 3600000,
        s"event $id at ${ev(id)} outside window of $day")
    }
    // completeness: every event in [08:00,16:00) of its own day is matched
    val expected = ev.count { case (_, ts) =>
      val ms = (ts.getTime - java.sql.Timestamp.valueOf(
        ts.toLocalDateTime.toLocalDate.atStartOfDay).getTime)
      ms >= 8L * 3600000 && ms < 16L * 3600000
    }
    assert(got.length === expected)
  }

  test("serve_rides_window rebases the ride-id year and shifts timestamps") {
    val rows = results("serve_rides_window")
      .select("bus_ride_id", "timestamp_at_stop").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0).matches("""\d+_2025-\d{2}-\d{2}_\d{2}-\d{2}-\d{2}"""),
        s"ride id not rebased: ${r.getString(0)}")
      // window [2024-01-02 06:00, 12:00] + 365 days lands in Jan 2025
      val ts = r.getTimestamp(1).toString
      assert(ts.startsWith("2025-01-01"), s"timestamp not shifted: $ts")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
