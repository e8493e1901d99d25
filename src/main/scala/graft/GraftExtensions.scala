package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.HashExpressions.{MaxMultiplicity, RollingWindowHashes, ShingleMinHash, ShingleSimHash}
import graft.functions.VectorExpressions.DotProduct

/**
 * SparkSessionExtensions hook: registers graft's native expressions as
 * SQL functions, so `spark.sql("SELECT shingle_simhash(shingles) ...")`
 * works next to the Column API. Install with
 *
 *   SparkSession.builder()
 *     .withExtensions(new GraftExtensions)        // programmatic
 *   // or spark.sql.extensions=graft.GraftExtensions (config)
 *
 * SQL surface:
 *   shingle_simhash(array<string>)          -> bigint
 *   shingle_minhash(array<string>, k)       -> array<bigint>
 *   max_multiplicity(array<string>)         -> bigint
 *   rolling_window_hashes(array<string>, w) -> array<bigint>
 *   vec_dot(array<double>, array<double>)   -> double
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder)] =
    Seq(
      (FunctionIdentifier("shingle_simhash"),
        new ExpressionInfo(classOf[ShingleSimHash].getName, "shingle_simhash"),
        (children: Seq[Expression]) => {
          require(children.size == 1, "shingle_simhash takes exactly 1 argument")
          ShingleSimHash(children.head)
        }),
      (FunctionIdentifier("shingle_minhash"),
        new ExpressionInfo(classOf[ShingleMinHash].getName, "shingle_minhash"),
        (children: Seq[Expression]) => {
          require(children.size == 2, "shingle_minhash takes (shingles, k)")
          val k = children(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"shingle_minhash k must be an integer literal, got $other")
          }
          ShingleMinHash(children.head, k)
        }),
      (FunctionIdentifier("max_multiplicity"),
        new ExpressionInfo(classOf[MaxMultiplicity].getName, "max_multiplicity"),
        (children: Seq[Expression]) => {
          require(children.size == 1, "max_multiplicity takes exactly 1 argument")
          MaxMultiplicity(children.head)
        }),
      (FunctionIdentifier("rolling_window_hashes"),
        new ExpressionInfo(classOf[RollingWindowHashes].getName, "rolling_window_hashes"),
        (children: Seq[Expression]) => {
          require(children.size == 2, "rolling_window_hashes takes (tokens, w)")
          val w = children(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"rolling_window_hashes w must be an integer literal, got $other")
          }
          RollingWindowHashes(children.head, w)
        }),
      (FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
        (children: Seq[Expression]) => {
          require(children.size == 2, "vec_dot takes exactly 2 arguments")
          DotProduct(children.head, children(1))
        }))

  /** Register on an already-running session (extensions hooks only run
   * at session build time). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      org.apache.spark.sql.graftglue.Bridge.registerFunction(spark, name, info, builder)
    }
}
