package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Static kernels referenced from generated code. All loops are sequential
  * left-folds in double, bit-identical to the higher-order-function form
  * (`aggregate(transform(...), 0.0, (s,v) -> s+v)`) and to DuckDB's
  * `list_reduce` — swapping these in changes nothing about results, only
  * removes per-element lambda interpretation and boxing.
  */
object VectorCodegen {

  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** Random-hyperplane LSH bucket: sign bits of `numPlanes` dots with the
    * deterministic plane coef ((j*31 + d*17) mod 7) - 3 (must stay in sync
    * with Similarity.planeCoefSql).
    */
  def lshBucketF(v: ArrayData, numPlanes: Int): Long = {
    val dim = v.numElements()
    var bucket = 0L
    var j = 0
    while (j < numPlanes) {
      var s = 0.0
      var d = 0
      while (d < dim) {
        s += v.getFloat(d).toDouble * (((j * 31 + d * 17) % 7) - 3)
        d += 1
      }
      if (s > 0) bucket += (1L << j)
      j += 1
    }
    bucket
  }
}

/** Dot product of two float/double array columns with whole-stage codegen —
  * the hot kernel of cosine similarity search.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) |
          (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot needs two array<float> or two array<double>, got " +
            s"${left.dataType} / ${right.dataType}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (isFloat) VectorCodegen.dotFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else VectorCodegen.dotDD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "dotFF" else "dotDD"
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorCodegen.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** LSH bucket id of a float-array column (codegen). */
case class LshBucketExpr(child: Expression, numPlanes: Int)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "vec_lsh_bucket"

  override protected def nullSafeEval(input: Any): Any =
    VectorCodegen.lshBucketF(input.asInstanceOf[ArrayData], numPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.VectorCodegen.lshBucketF($c, $numPlanes)")

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

object VectorExpressions {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def norm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(dot(a, a))
  }

  def lshBucket(a: Column, numPlanes: Int): Column =
    ColumnBridge.column(LshBucketExpr(ColumnBridge.expression(a), numPlanes))

  /** SQL builder: `vec_lsh_bucket(vec, numPlanes)`, literal plane count. */
  def lshSqlBuilder(exprs: Seq[Expression]): LshBucketExpr =
    LshBucketExpr(exprs.head, IntLiteral.of("vec_lsh_bucket", exprs(1)))

  /** SQL surface for the vector kernels (runtime registration, same
    * contract as [[UrlExpressions.register]]).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "vec_lsh_bucket", lshSqlBuilder _, "scala_udf")
  }
}
