package graft.operators

import graft.api.GraftQuery
import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (Array[Float] column):
  * brute-force cosine top-k as the correctness baseline, and an IVF
  * (inverted-file) bucketed variant as the 100-TB scale path.
  *
  * All math is done in double with explicit left-fold accumulation
  * (`aggregate(zip_with(...))`) so cosine values are bitwise-identical to
  * DuckDB's `list_cosine_similarity` — no rounding games needed in the
  * oracle. Everything is codegen'd higher-order functions; no UDFs.
  */
object VectorOps {

  /** embedding (array<float>) -> array<double> plus cached squared norm. */
  private def withNorm(df: DataFrame, prefix: String): DataFrame =
    df.select(col("vec_id").as(s"${prefix}_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as(s"${prefix}_e"))
      .withColumn(s"${prefix}_n2",
        expr(s"aggregate(${prefix}_e, 0.0D, (acc, x) -> acc + x * x)"))

  private def cosine(aE: String, bE: String, aN2: String, bN2: String): Column =
    expr(s"aggregate(zip_with($aE, $bE, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)") /
      (sqrt(col(aN2)) * sqrt(col(bN2)))

  /** V1: brute-force cosine top-k (k=3) for a small query set — the exact
    * baseline every ANN variant is measured against. The query side is tiny
    * and broadcast; the corpus is scanned once, partition-local top-k then
    * global per-query rank.
    */
  val v1: GraftQuery = GraftQuery(
    "v1_ann_bruteforce_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val corpus = withNorm(emb, "c")
      val queries = withNorm(emb.filter(col("vec_id") < 10), "q")
      val scored = corpus.join(broadcast(queries), col("c_id") =!= col("q_id"))
        .withColumn("cos", cosine("q_e", "c_e", "q_n2", "c_n2"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select(col("q_id"), col("c_id").as("neighbor_id"), col("cos"))
    },
    Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |q AS (SELECT * FROM v WHERE vec_id < 10),
           |pairs AS (SELECT q.vec_id AS q_id, v.vec_id AS neighbor_id,
           |          list_cosine_similarity(q.e, v.e) AS cos
           |          FROM q JOIN v ON v.vec_id != q.vec_id)
           |SELECT q_id, neighbor_id, cos FROM pairs
           |QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) <= 3""".stripMargin))

  /** Nearest-centroid assignment: deterministic coarse quantizer (every
    * 50th vector is a centroid), one broadcast join + partition-local rank.
    */
  private def ivfAssign(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val corpus = withNorm(emb, "c")
    val cents = withNorm(emb.filter(col("vec_id") % 50 === 0), "k")
    val aw = Window.partitionBy("c_id").orderBy(col("kcos").desc, col("k_id"))
    corpus.join(broadcast(cents), col("c_id").isNotNull)
      .withColumn("kcos", cosine("c_e", "k_e", "c_n2", "k_n2"))
      .withColumn("rk", row_number().over(aw)).filter(col("rk") === 1)
      .select(col("c_id"), col("c_e"), col("c_n2"), col("k_id").as("cluster"))
  }

  /** V2: IVF-bucketed ANN — vectors assigned to their nearest centroid,
    * queries probe their top-2 centroids and rank only within probed
    * posting lists. At 100 TB: the corpus shuffles once on cluster id;
    * queries touch |probe|/K of the data. Approximate by design -> recall
    * vs V1 is ScalaTest-gated, no SQL oracle.
    */
  val v2: GraftQuery = GraftQuery(
    "v2_ann_ivf_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = withNorm(emb.filter(col("vec_id") % 50 === 0), "k")
      val assigned = ivfAssign(s, d)

      // queries probe their 2 nearest centroids
      val queries = withNorm(emb.filter(col("vec_id") < 10), "q")
      val qw = Window.partitionBy("q_id").orderBy(col("kcos").desc, col("k_id"))
      val probes = queries.join(broadcast(cents), col("q_id").isNotNull)
        .withColumn("kcos", cosine("q_e", "k_e", "q_n2", "k_n2"))
        .withColumn("rk", row_number().over(qw)).filter(col("rk") <= 2)
        .select(col("q_id"), col("q_e"), col("q_n2"), col("k_id").as("cluster"))

      // rank within probed posting lists only
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
      assigned.join(broadcast(probes), Seq("cluster"))
        .filter(col("c_id") =!= col("q_id"))
        .withColumn("cos", cosine("q_e", "c_e", "q_n2", "c_n2"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select(col("q_id"), col("c_id").as("neighbor_id"), col("cos"))
    },
    None)

  /** V3: embedding-cosine near-duplicate pairs at 0.95, bucketed by IVF
    * cluster — only same-cluster pairs are compared (never all-pairs; the
    * shuffle key is the cluster id). Highly similar vectors land in the
    * same cluster with near-certainty at this threshold; the brute-force
    * oracle is sound on the driver data (no qualifying cross-cluster pairs)
    * and recall is additionally ScalaTest-gated on crafted fixtures.
    */
  val v3: GraftQuery = GraftQuery(
    "v3_embedding_neardup",
    (s, d) => {
      val assigned = ivfAssign(s, d)
      val b = assigned.select(col("cluster"), col("c_id").as("b_id"),
        col("c_e").as("b_e"), col("c_n2").as("b_n2"))
      assigned.join(b, Seq("cluster")).filter(col("c_id") < col("b_id"))
        .withColumn("cos", cosine("c_e", "b_e", "c_n2", "b_n2"))
        .filter(col("cos") >= 0.95)
        .select(col("c_id").as("a_id"), col("b_id"), col("cos"))
    },
    Some("""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           |list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos
           |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
           |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.95""".stripMargin),
    bench = false)

  val all: Seq[GraftQuery] = Seq(v1, v2, v3)
}
