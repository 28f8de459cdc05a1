package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point: injects the native expressions into a session's
  * function registry. Two ways in:
  *
  *   - cluster deploy: `spark.sql.extensions=graft.plans.GraftExtensions`
  *   - programmatic: `GraftExtensions.register(spark)` (used by the query
  *     library, since the driver harness builds plain sessions)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object GraftExtensions {

  private def functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_timestamp_bucket",
      new ExpressionInfo(classOf[TimestampBucketExpr].getName, "graft_timestamp_bucket"),
      (args: Seq[Expression]) => TimestampBucketExpr(
        org.apache.spark.sql.catalyst.expressions.Cast(args(0),
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.catalyst.expressions.Cast(args(1),
          org.apache.spark.sql.types.LongType))),
    ("graft_array_jaccard",
      new ExpressionInfo(classOf[ArrayJaccardExpr].getName, "graft_array_jaccard"),
      (args: Seq[Expression]) => ArrayJaccardExpr(args(0), args(1))),
    ("graft_cosine",
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "graft_cosine"),
      (args: Seq[Expression]) => CosineSimilarityExpr(args(0), args(1))),
    ("graft_dot",
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProductExpr(args(0), args(1))),
    ("graft_latest_by_seq",
      new ExpressionInfo(classOf[LatestBySeqAgg].getName, "graft_latest_by_seq"),
      (args: Seq[Expression]) => LatestBySeqAgg(args(0), args(1), args(2))
        .toAggregateExpression()),
    ("graft_bottom_k",
      new ExpressionInfo(classOf[BottomKSketchAgg].getName, "graft_bottom_k"),
      (args: Seq[Expression]) => BottomKSketchAgg(args(0), args(1))
        .toAggregateExpression()))

  /** Idempotent registration on a live session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
