package graft

/** Registry-wide plan-quality gate: no query may plan a CartesianProduct
  * (the all-pairs shape that sinks at scale — broadcast nested-loop against
  * a bounded side is the allowed non-equi form) and nothing may fall off
  * the JVM fast path into external eval. Streaming queries are skipped
  * here: their `build` executes the stream (OpsSmokeSpec covers them) and
  * the returned sink table's plan is just a memory scan.
  */
class PlanGuardSpec extends SparkSpec {

  private val skipped = Set(
    "t3_stream_alert_filter", "t5_stream_latest_state",
    "t6_foreachbatch_overwrite", "t11_stream_windowed_agg", "t11_throughput",
    "t12_stream_dedup", "t13_stream_table_mirror",
    "t14_stream_stream_join", "t15_stream_merge_upsert",
    "t16_stream_session_window", "t17_stream_append_eviction",
    "t18_stream_outer_join", "t19_transform_with_state",
    "t20_stream_dedup_within_watermark")

  test("x9_tfidf_topterm: document frequency is never a term-partitioned window") {
    // A Window.partitionBy(term) has no map-side partials and AQE cannot
    // split it: every (doc, term) row of a stopword lands in one task at
    // corpus scale. The plan must keep term-keyed work in HashAggregate
    // (partial+final) and only window by doc_id for the per-doc argmax.
    val plan = SparkEntry.queries("x9_tfidf_topterm")(spark, sf)
      .queryExecution.executedPlan.toString
    // windowspecdefinition's first argument is the partition key; `w` (the
    // term column) must never be it.
    assert(!plan.matches("(?s).*windowspecdefinition\\(w#.*"),
      s"x9 windows by term — skew-unsplittable at scale:\n$plan")
    assert(plan.contains("HashAggregate"),
      s"x9 lost its partial-aggregated df side:\n$plan")
  }

  test("x26_span_dedup: first-occurrence election is a hash agg + join, not a span window") {
    // same skew argument as x9: a window partitioned by span hash would
    // funnel every occurrence of a boilerplate span into one task. The
    // election must stay HashAggregate(min(struct)) + shuffle join.
    val plan = SparkEntry.queries("x26_span_dedup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.matches("(?s).*windowspecdefinition\\(h#.*"),
      s"x26 windows by span hash — skew-unsplittable at scale:\n$plan")
    assert(plan.contains("HashAggregate"),
      s"x26 lost its partial-aggregated election:\n$plan")
  }

  test("x27_triangle_count: every join is a hash/sort-merge equi-join") {
    // the wedge and closing joins must stay equi-joins on computed keys;
    // a nested-loop form would re-introduce the all-pairs shape the
    // degree orientation exists to avoid.
    val plan = SparkEntry.queries("x27_triangle_count")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"x27 fell back to nested-loop join:\n$plan")
  }

  for (q <- SparkEntry.registry if !skipped(q.name)) {
    test(s"${q.name}: no cartesian product, no external eval") {
      val plan = q.build(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans an all-pairs cartesian:\n$plan")
      assert(!plan.contains("BatchEvalPython") && !plan.contains("ArrowEvalPython"),
        s"${q.name} leaves the JVM:\n$plan")
    }
  }
}
