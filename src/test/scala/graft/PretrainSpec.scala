package graft

import graft.operators.Pretrain
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The x66 capstone funnel: structural contract on real test data plus a
  * staged fixture engineered so each deterministic stage's delta is exact
  * (the threshold stages — perplexity quartile / model-score median — get
  * tie-engineered or bounded assertions instead; their operators carry
  * their own exact specs).
  */
class PretrainSpec extends SparkSpec {

  import SparkSpec.spark.implicits._

  private val stageNames = Seq("input", "quality_rules", "perplexity_filter",
    "model_filter", "exact_dedup", "neardup_prune", "containment_prune",
    "decontaminate", "train_split", "token_budget", "packed", "sharded",
    "curriculum")

  private def funnelOf(rows: Array[Row]): Map[Int, (String, Long, Long, Long)] =
    rows.map(r => r.getAs[Int]("stage_idx") ->
      (r.getAs[String]("stage"), r.getAs[Long]("n_units"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap

  test("x66 funnel on sf0.001: 13 ordered stages, monotone filter ladder, " +
    "layout stages conserve docs and tokens") {
    val f = funnelOf(Pretrain.x66.build(spark, sf).collect())
    assert(f.size == 13)
    stageNames.zipWithIndex.foreach { case (n, i) => assert(f(i)._1 == n) }
    // filter ladder (0..9): docs and tokens never increase
    (1 to 9).foreach { i =>
      assert(f(i)._3 <= f(i - 1)._3 && f(i)._4 <= f(i - 1)._4,
        s"stage $i grew: ${f(i)} vs ${f(i - 1)}")
    }
    assert(f(9)._3 > 0, "the ladder emptied the corpus — thresholds broken")
    // layout stages (10..12) conserve the stage-9 corpus exactly
    (10 to 12).foreach { i =>
      assert(f(i)._3 == f(9)._3 && f(i)._4 == f(9)._4,
        s"layout stage $i must conserve docs+tokens: ${f(i)} vs ${f(9)}")
    }
    // unit sanity: packs cover the token mass at 256/window; shard and
    // (band, shard) group counts live in their fixed domains
    assert(f(10)._2 >= (f(9)._4 + 255) / 256, s"packs ${f(10)._2} < token mass / 256")
    assert(f(11)._2 >= 1 && f(11)._2 <= 32)
    assert(f(12)._2 >= 1 && f(12)._2 <= 32)
  }

  test("x82 costed capstone: counts bit-equal the uncosted funnel, every " +
    "materializing stage has a wall time, the dedup stage shuffles") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val costed = Pretrain.pretrainCorpusCosts(docs).collect()
    assert(costed.length == 13)
    val counts = costed.map(r => r.getAs[Int]("stage_idx") ->
      (r.getAs[Long]("n_units"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"))).toMap
    val want = funnelOf(Pretrain.pretrainCorpus(docs).collect())
      .map { case (i, (_, u, d, t)) => i -> ((u, d, t)) }
    assert(counts === want,
      "cost instrumentation must not change the funnel counts")
    val byStage = costed.map(r => r.getAs[String]("stage") ->
      (r.getAs[Long]("wall_ms"), r.getAs[Long]("shuffle_bytes"))).toMap
    // input carries zero cost by construction; every other stage
    // materialized inside its own job group
    stageNames.filterNot(_ == "input").foreach { n =>
      assert(byStage(n)._1 >= 1L, s"stage $n has no wall time")
    }
    assert(byStage("exact_dedup")._2 > 0L,
      "the md5 groupBy stage must report attributed shuffle bytes")
  }

  test("pretrainCorpus releases every cache before returning (r8 advice pin)") {
    // the funnel localCheckpoints its 13-row result and unpersists the
    // shared docs cache — a leaked entry would silently rewrite later
    // queries' plans (InMemoryRelation substitution, see PlanFingerprint)
    // and pin corpus-sized blocks in executor memory for the session's
    // lifetime at 100 TB.
    spark.catalog.clearCache()
    Pretrain.x66.build(spark, sf).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "pretrainCorpus left a cached plan registered after returning")
  }

  test("x66 staged fixture: exact deltas where the stage is deterministic, " +
    "tie-engineered quartile keeps all, no-op stages hold the corpus fixed") {
    // 24 quality-conformant docs with GLOBALLY UNIQUE words: every bigram
    // and unigram count is 1, so every doc's smoothed bigram NLL terms are
    // identical => all share one quantized perplexity (the quartile
    // threshold then keeps ALL of them: p2 == t75 everywhere); unique
    // words also mean zero exact/near-dup/containment pairs. Token counts
    // vary 25..36 so the logreg features have positive variance.
    val good = (1 to 24).map { i =>
      val words = (0 until (25 + (i % 12))).map(j => s"d${i}w$j")
      (i.toLong, words.mkString(" "), if (i % 3 == 0) "en" else "fr",
        if (i % 2 == 0) "srcA" else "srcB")
    }
    val short = Seq((99L, "too short to pass", "en", "srcA"))
    val docs = (good ++ short).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
    val f = funnelOf(Pretrain.pretrainCorpus(docs).collect())

    assert(f(0)._3 == 25L)
    // stage 1 drops exactly the short doc (every other doc passes x14)
    assert(f(1)._3 == 24L, s"quality stage: ${f(1)}")
    // stage 2: engineered perplexity tie -> threshold keeps every doc
    assert(f(2)._3 == 24L, s"tied-quartile stage must keep all: ${f(2)}")
    // stage 3: median-score rule keeps at least half, never grows
    assert(f(3)._3 >= 12L && f(3)._3 <= 24L, s"model filter: ${f(3)}")
    // stages 4-6: unique-word corpus has no duplicate of any kind
    assert(f(4)._3 == f(3)._3 && f(5)._3 == f(3)._3 && f(6)._3 == f(3)._3,
      s"dedup ladder must be a no-op on unique-word docs: ${f(4)}, ${f(5)}, ${f(6)}")
    // stage 7: no src0 source anywhere -> decontamination is a no-op
    assert(f(7)._3 == f(6)._3, s"decontam must be a no-op without src0: ${f(7)}")
    // stage 8/9: split and budget only shrink, never empty here
    assert(f(8)._3 >= 1L && f(8)._3 <= f(7)._3)
    assert(f(9)._3 >= 1L && f(9)._3 <= f(8)._3)
    // budget rule: kept token mass is at most half the stage-8 mass
    assert(f(9)._4 * 2 <= f(8)._4, s"token budget overshot: ${f(9)._4} of ${f(8)._4}")
    (10 to 12).foreach(i => assert(f(i)._3 == f(9)._3 && f(i)._4 == f(9)._4))
  }
}
