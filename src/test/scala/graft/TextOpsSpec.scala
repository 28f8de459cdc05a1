package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Near-dup machinery validated on crafted fixtures (where brute-force
  * ground truth is computable in-test) — complementing the DuckDB oracle,
  * which can only see what exists in the driver data.
  */
class TextOpsSpec extends SparkSpec {

  import SparkSpec.spark.implicits._

  private val vocab = ('a' to 'z').map(c => s"w$c")

  /** base docs + planted near-duplicates (one word in ~20 changed). */
  private lazy val crafted = {
    val rng = new scala.util.Random(7)
    val base = (0 until 40).map { i =>
      i.toLong -> Seq.fill(60)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    }
    val nearDups = (0 until 10).map { i =>
      val (id, text) = base(i)
      val words = text.split(" ")
      words(rng.nextInt(words.length)) = "ZZZ" // one-word mutation
      (100L + id) -> words.mkString(" ")
    }
    (base ++ nearDups).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text").cast("long"))
  }

  private def withCrafted[T](f: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft-text").toString
    crafted.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    f(dir)
  }

  test("x7 minhash-LSH finds every planted 3-gram near-duplicate pair (recall 1.0 here)") {
    withCrafted { dir =>
      // ground truth: brute-force 3-gram jaccard >= 0.9 computed in-test
      def shingles(t: String): Set[String] =
        t.split(" ").sliding(3).map(_.mkString("|")).toSet
      val docs = crafted.select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> shingles(r.getString(1)))
      val truth = (for {
        (a, sa) <- docs; (b, sb) <- docs if a < b
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size if j >= 0.9
      } yield (a, b)).toSet
      assert(truth.nonEmpty, "fixture must contain near-dups")

      val got = TextOps.x7.build(spark, dir).select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === truth)
    }
  }

  test("x5 dup-set detection finds identical word sets and nothing else") {
    withCrafted { dir =>
      def wordSet(t: String): Set[String] = t.split(" ").toSet
      val docs = crafted.select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> wordSet(r.getString(1)))
      val truth = (for {
        (a, sa) <- docs; (b, sb) <- docs if a < b && sa == sb
      } yield (a, b)).toSet
      val got = TextOps.x5.build(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === truth)
    }
  }

  test("x6 simhash: near-dups are close in hamming distance, random pairs far") {
    withCrafted { dir =>
      val sh = TextOps.x6.build(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
      val nearDists = (0 until 10).map(i => ham(sh(i.toLong), sh(100L + i)))
      val farDists = for (a <- 0 until 10; b <- 20 until 30) yield ham(sh(a.toLong), sh(b.toLong))
      assert(nearDists.max <= 6, s"near-dup hamming too large: $nearDists")
      assert(farDists.sum.toDouble / farDists.size > nearDists.sum.toDouble / nearDists.size)
    }
  }

  test("x8 winnowing: shared substrings of >= k+w-1 chars share a fingerprint") {
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val b = "XX quick brown fox jumps over the lazy dog near the river bank tomorrow"
    val fa = TextOps.winnow(a).toSet
    val fb = TextOps.winnow(b).toSet
    assert(fa.intersect(fb).nonEmpty, "overlapping docs must share fingerprints")
    assert(TextOps.winnow(a).toSeq === TextOps.winnow(a).toSeq) // deterministic
    val unrelated = TextOps.winnow("zzz completely different content 12345 qqq ppp").toSet
    assert(fa.intersect(unrelated).size < fa.size / 2)
  }

  test("x4 language id is deterministic") {
    val a = TextOps.x4.build(spark, sf).orderBy("doc_id").collect()
    val b = TextOps.x4.build(spark, sf).orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("x9 tf-idf: the top term of a doc actually occurs in it") {
    val tops = TextOps.x9.build(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tops.nonEmpty)
    tops.foreach { case (id, term) =>
      assert(docs(id).split(" ").contains(term), s"doc $id top term '$term' not present")
    }
  }

  test("x10 hash sample is deterministic and roughly 10%") {
    val a = TextOps.x10.build(spark, sf).collect().map(_.getLong(0)).sorted
    val b = TextOps.x10.build(spark, sf).collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    val total = graft.core.Tables.documents(spark, sf).count()
    assert(a.length > total / 20 && a.length < total / 5,
      s"sample ${a.length} of $total outside the loose 5-20% band")
  }
}
