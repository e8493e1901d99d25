package graft

import graft.functions.{VectorExpressions, VectorFunctions => VF}
import org.apache.spark.sql.functions._

/** Native fused dot product: bit equality with the composable Column
 * twin (same ordered fold), null semantics, codegen placement. */
class VectorExpressionsSpec extends SparkSpec {

  import spark.implicits._

  test("native dot is bit-identical to the zip_with/aggregate twin") {
    val df = (0 until 50).map { i =>
      (i.toLong,
        Array.tabulate(64)(d => ((i * 64 + d) % 97).toFloat / 13f - 3f),
        Array.tabulate(64)(d => ((i * 37 + d * 3) % 89).toFloat / 11f - 4f))
    }.toDF("id", "a", "b")
      .select(col("id"), VF.toDouble(col("a")).as("a"), VF.toDouble(col("b")).as("b"))
    val res = df.select(
      VF.dot(col("a"), col("b")).as("native"),
      VF.dotColumns(col("a"), col("b")).as("twin")).collect()
    res.foreach { r =>
      // bit equality, not approximate: both fold 0.0-seeded in index order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null element and length mismatch yield null, like the twin") {
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (2L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),
      (3L, Seq[java.lang.Double](1.0), Seq[java.lang.Double](3.0, 4.0))
    ).toDF("id", "a", "b")
    val rows = df.select(col("id"), VF.dot(col("a"), col("b")).as("native"),
      VF.dotColumns(col("a"), col("b")).as("twin"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) == 11.0 && rows(0).getDouble(2) == 11.0)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }

  test("vec_dot runs inside whole-stage codegen (no fallback)") {
    // a non-foldable input (range) so the projection can't be constant-
    // folded into a LocalTableScan at plan time
    val df = spark.range(4).select(VF.dot(
      array_repeat(col("id").cast("double"), 8),
      array_repeat(lit(2.0), 8)).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks operators inside a WholeStageCodegen stage; the project
    // carrying vec_dot must be one of them (a CodegenFallback expression
    // would strip the asterisk from its Project)
    assert(plan.contains("*(1) Project [vec_dot"), plan)
    // the expression itself appears in the codegen'd project
    assert(df.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    assert(df.orderBy("d").collect().map(_.getDouble(0)).toSeq ==
      Seq(0.0, 16.0, 32.0, 48.0))
  }
}
