package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's two hottest helpers —
  * both fully codegen'd (doGenCode) so they stay inside WholeStageCodegen,
  * per the builder brief's preference order: native Expression > UDF.
  */

/** TIMESTAMP_BUCKET(ts, step_seconds) as one arithmetic expression over the
  * internal microsecond long (reference semantics part3:463). Equivalent to
  * [[graft.functions.Funcs.timestampBucket]] (floor semantics, so correct
  * for pre-1970 values too) without the helper's unix_timestamp ->
  * floor(double) -> timestamp_seconds round-trip.
  */
case class TimestampBucketExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = TimestampType
  override def prettyName: String = "graft_timestamp_bucket"

  override protected def nullSafeEval(ts: Any, step: Any): Any = {
    val stepMicros = step.asInstanceOf[Long] * 1000000L
    Math.floorDiv(ts.asInstanceOf[Long], stepMicros) * stepMicros
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ts, step) =>
      s"java.lang.Math.floorDiv($ts, $step * 1000000L) * ($step * 1000000L)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TimestampBucketExpr =
    copy(left = newLeft, right = newRight)
}

/** COSINE_SIMILARITY(a, b) over double arrays in ONE fused pass: dot
  * product and both squared norms accumulate in the same index-order loop,
  * result = dot / (sqrt(na) * sqrt(nb)) — exactly DuckDB
  * `list_cosine_similarity`'s accumulation order and final arithmetic, so
  * oracle parity stays bitwise. Replaces the `aggregate(zip_with(...))`
  * higher-order form, whose lambdas evaluate INTERPRETED per pair — this
  * is a plain codegen'd call in the WholeStageCodegen body.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  @inline private def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val va = a.getDouble(i)
      val vb = b.getDouble(i)
      dot += va * vb
      na += va * va
      nb += vb * vb
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("graftCosine", this, classOf[CosineSimilarityExpr].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$expr.computeJava($a, $b)")
  }

  /** Codegen entry point (generated Java calls back into this instance). */
  def computeJava(a: ArrayData, b: ArrayData): Double = compute(a, b)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)
}

/** DOT_PRODUCT(a, b) over double arrays: Σ a[i]·b[i] accumulated in index
  * order — the inner-product scoring kernel of maximum-inner-product
  * search (MIPS), where ranking by raw dot differs from cosine whenever
  * corpus norms vary (recommendation scores, unnormalized embeddings).
  * The oracle replays the same ascending-index fold (`list_reduce` over
  * `a[i]*b[i]`), so scores are bitwise-identical cross-engine. Fully
  * codegen'd like [[CosineSimilarityExpr]]; `graft_dot(e, e)` doubles as
  * the squared-norm kernel of the MIPS→cosine norm augmentation.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  @inline private def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("graftDot", this, classOf[DotProductExpr].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$expr.computeJava($a, $b)")
  }

  /** Codegen entry point (generated Java calls back into this instance). */
  def computeJava(a: ArrayData, b: ArrayData): Double = compute(a, b)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** ARRAY_JACCARD(a, b): |A ∩ B| / |A ∪ B| over string arrays in one fused
  * pass — the exact-verify step of the LSH dedup pipeline. The composed
  * form `size(array_intersect)/size(array_union)` materializes two
  * intermediate arrays per row; this allocates only a hash set. Division is
  * the same int->double op the DuckDB oracle performs, so values match
  * bitwise. Returns null only for null inputs; two empty arrays -> 0.0.
  */
case class ArrayJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_array_jaccard"

  @inline private def compute(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) setA.add(a.getUTF8String(i)); i += 1
    }
    val seenB = new java.util.HashSet[UTF8String]()
    var inter = 0
    var j = 0
    while (j < b.numElements()) {
      if (!b.isNullAt(j)) {
        val s = b.getUTF8String(j)
        if (seenB.add(s) && setA.contains(s)) inter += 1
      }
      j += 1
    }
    val union = setA.size() + seenB.size() - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("graftJaccard", this, classOf[ArrayJaccardExpr].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$expr.computeJava($a, $b)")
  }

  /** Codegen entry point (generated Java calls back into this instance). */
  def computeJava(a: ArrayData, b: ArrayData): Double = compute(a, b)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayJaccardExpr =
    copy(left = newLeft, right = newRight)
}
