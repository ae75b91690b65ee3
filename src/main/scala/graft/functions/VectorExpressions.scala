package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the vector hot path.
  *
  * The built-in formulation `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, +)`
  * allocates an intermediate array and evaluates two lambda closures per
  * element, per pair — in a similarity join that is the entire inner loop.
  * This expression fuses it into one codegen'd while-loop over the two
  * `ArrayData` (no allocation, no virtual calls), keeping the whole join
  * stage inside WholeStageCodegen.
  *
  * Semantics are bit-identical to the HOF version: left-to-right fold,
  * float→double widening per element, double accumulation — so swapping it
  * in changes no query result (the DuckDB oracle parity is unaffected).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Register `vec_dot` in the session's function registry. Spark 4 keeps
    * the Column↔Expression bridge private, so the public route to a custom
    * expression is registration + `expr("vec_dot(...)")`. Idempotent: the
    * existence check keeps repeat calls from re-registering (re-registration
    * is harmless but emits a WARN per call, which pollutes harness stdout).
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot")
    if (!registry.functionExists(ident)) {
      registry.createOrReplaceTempFunction(
        "vec_dot", exprs => FloatVecDot(exprs(0), exprs(1)), "built-in")
    }
  }

  /** Dot product of two float-array columns (double result). Registers the
    * function on the session bound to the active query when first used.
    */
  def vec_dot(spark: SparkSession, a: String, b: String): Column = {
    register(spark)
    expr(s"vec_dot($a, $b)")
  }

  /** Column-argument form, for operands that are constructed Columns
    * rather than named columns — e.g. a `typedLit` centroid array. Same
    * expression, resolved through the registry by name.
    */
  def vec_dot_cols(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("vec_dot", a, b)
  }

  /** Squared L2 norm of a float-array column. */
  def vec_norm_sq(spark: SparkSession, a: String): Column = vec_dot(spark, a, a)
}
