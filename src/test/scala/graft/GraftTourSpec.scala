package graft

import graft.api.Graft
import org.apache.spark.sql.functions._

/** Runs the README "Bring your own parquet" walkthrough verbatim against
  * the test tables, so the doc snippets cannot rot: same facade calls,
  * same argument shapes, plus the minimal sanity asserts a new user would
  * make on each result.
  */
class GraftTourSpec extends SparkSpec {

  test("tour 1: pretrainCorpus — docs in, 13-stage conservation funnel out") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val funnel = Graft.pretrainCorpus(docs)
    val rows = funnel.orderBy("stage_idx").collect()
    assert(rows.length == 13)
    assert(rows.head.getAs[String]("stage") == "input")
    assert(rows.last.getAs[String]("stage") == "curriculum")
    val nDocs = rows.map(_.getAs[Long]("n_docs"))
    assert(nDocs.zip(nDocs.tail).take(9).forall { case (a, b) => b <= a },
      s"funnel must be monotone through the filter stages: ${nDocs.toSeq}")
  }

  test("tour 2: ANN — exact baseline, IVF scale path, ranking eval") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val someQ = emb.filter(col("vec_id") < 10)
    val exact = Graft.annBruteForceTopK(emb, someQ, k = 5)
    val fast = Graft.annIvfTopK(emb, someQ, k = 5, probes = 2)
    val eval = Graft.annRankingEval(emb, someQ, k = 5)
    assert(exact.groupBy("q_id").count().collect().forall(_.getLong(1) == 5L))
    assert(fast.select("q_id").distinct().count() == someQ.count())
    val ev = eval.collect()
    assert(ev.length == someQ.count())
    assert(ev.forall { r =>
      val ndcg = r.getAs[Double]("ndcg"); ndcg >= 0.0 && ndcg <= 1.0
    })
  }

  test("tour 4: mixing audit — overlap matrix, temperature weights, " +
    "epoch waterfill; hygiene — blocklist + bloom decontam") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val overlap = Graft.sourceOverlapMatrix(docs)
    assert(overlap.columns.toSeq ==
      Seq("src_a", "src_b", "n_clusters", "n_doc_pairs"))
    val mix = Graft.temperatureMixture(docs)
    val epochs = Graft.epochWaterfill(docs,
      mix.select(col("source"), col("wq").as("w")))
    val rows = epochs.collect()
    assert(rows.length == docs.select("source").distinct().count())
    assert(rows.forall(r =>
      r.getAs[Long]("alloc_tokens") <= r.getAs[Long]("cap")))
    val kept = Graft.blocklistFilter(docs).filter(col("keep"))
    assert(kept.count() < docs.count(), "the default blocklist must bite here")
    val flags = Graft.bloomDecontam(docs.filter(col("source") =!= "src0"),
      docs.filter(col("source") === "src0"))
    assert(flags.filter(col("flagged")).count() > 0)
  }

  test("tour 3: gap-fill a metric series, then forecast it with intervals") {
    val series = graft.core.Tables.events(spark, sf)
      .groupBy(col("user_id"),
        window(col("ts"), "5 minutes")("start").as("bucket_ts"))
      .agg(sum("value").as("demand"))
    val filled = Graft.gapFillLinear(series, "user_id", "bucket_ts", "demand",
      stepSeconds = 300)
    assert(filled.count() >= series.count(),
      "gap-fill only inserts buckets, never drops them")
    val fc = Graft.forecast(filled, model = "holt", horizon = 12)
    val perKey = fc.groupBy("user_id").count().collect()
    assert(perKey.nonEmpty && perKey.forall(_.getLong(1) == 12L))
    assert(fc.collect().forall { r =>
      r.getAs[Double]("lo") <= r.getAs[Double]("forecast_value") &&
        r.getAs[Double]("forecast_value") <= r.getAs[Double]("hi")
    })
  }
}
