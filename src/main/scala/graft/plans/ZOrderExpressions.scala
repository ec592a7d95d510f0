package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit interleaving — the clustering kernel behind
  * [[graft.operators.DataSkipping]]'s multi-column layout. Interleaving
  * the bits of per-column ranks makes rows that are close in EVERY keyed
  * dimension land close in the one-dimensional sort order, so parquet
  * file/row-group min-max ranges stay tight on ALL keyed columns at once
  * — the property that lets a 2-D rectangle predicate skip most of a
  * corpus where a single-column sort only skips on its own column.
  *
  * Static kernels called from generated code (same pattern as
  * [[TextCodegen]] / VectorCodegen): the per-row cost is a handful of
  * shift-and-mask ops, fully inside whole-stage codegen.
  */
object ZOrderCodegen {

  /** Spread the low 31 bits of `x` so bit i lands at position 2i
    * (classic parallel-prefix magic constants, public domain — see e.g.
    * "Bit Twiddling Hacks", interleave by binary magic numbers).
    */
  def spread2(x0: Long): Long = {
    var x = x0 & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Spread the low 21 bits of `x` so bit i lands at position 3i. */
  def spread3(x0: Long): Long = {
    var x = x0 & 0x1fffffL
    x = (x | (x << 32)) & 0x001f00000000ffffL
    x = (x | (x << 16)) & 0x001f0000ff0000ffL
    x = (x | (x << 8)) & 0x100f00f00f00f00fL
    x = (x | (x << 4)) & 0x10c30c30c30c30c3L
    x = (x | (x << 2)) & 0x1249249249249249L
    x
  }

  /** 2-D Morton code of two 31-bit ranks (62 significant bits — always
    * non-negative, safe to range-partition and compare as a plain long).
    * Out-of-range inputs are clamped, not wrapped: a clamped rank still
    * sorts to the correct end of the curve.
    */
  def interleave2(a: Long, b: Long): Long =
    spread2(clamp(a, 0x7fffffffL)) | (spread2(clamp(b, 0x7fffffffL)) << 1)

  /** 3-D Morton code of three 21-bit ranks (63 significant bits). */
  def interleave3(a: Long, b: Long, c: Long): Long =
    spread3(clamp(a, 0x1fffffL)) |
      (spread3(clamp(b, 0x1fffffL)) << 1) |
      (spread3(clamp(c, 0x1fffffL)) << 2)

  private def clamp(x: Long, mask: Long): Long =
    if (x < 0L) 0L else if (x > mask) mask else x
}

/** 2-D Morton code as a codegen'd Catalyst expression over two long
  * rank columns.
  */
case class ZValue2Expr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zvalue2"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderCodegen.interleave2(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.ZOrderCodegen.interleave2($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZValue2Expr =
    copy(left = newLeft, right = newRight)
}

/** 3-D Morton code as a codegen'd Catalyst expression over three long
  * rank columns.
  */
case class ZValue3Expr(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zvalue3"
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    ZOrderCodegen.interleave3(
      a.asInstanceOf[Long], b.asInstanceOf[Long], c.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c) => s"graft.plans.ZOrderCodegen.interleave3($a, $b, $c)")
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): ZValue3Expr =
    copy(first = a, second = b, third = c)
}

object ZOrderExpressions {

  /** SQL builders (runtime registration + [[GraftExtensions]]): the
    * expressions take long children, so arguments widen through an
    * UNCONDITIONAL Cast — a builder runs while its arguments may still
    * be unresolved, so it must not consult `e.dataType` (that throws
    * UnresolvedException mid-analysis); SimplifyCasts erases the
    * redundant long→long case after resolution.
    */
  def sqlBuilder2(exprs: Seq[Expression]): Expression =
    ZValue2Expr(widen(exprs.head), widen(exprs(1)))
  def sqlBuilder3(exprs: Seq[Expression]): Expression =
    ZValue3Expr(widen(exprs.head), widen(exprs(1)), widen(exprs(2)))
  private def widen(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e, LongType)

  /** Morton code of 2 or 3 rank columns (the only arities a 64-bit code
    * supports at useful resolution — 31 and 21 bits per dimension).
    * Non-long ranks widen through the same Cast as the SQL surface.
    */
  def zvalue(ranks: Column*): Column = ranks match {
    case Seq(a, b) =>
      ColumnBridge.column(ZValue2Expr(
        widen(ColumnBridge.expression(a)), widen(ColumnBridge.expression(b))))
    case Seq(a, b, c) =>
      ColumnBridge.column(ZValue3Expr(
        widen(ColumnBridge.expression(a)), widen(ColumnBridge.expression(b)),
        widen(ColumnBridge.expression(c))))
    case other => throw new IllegalArgumentException(
      s"zvalue supports 2 or 3 dimensions, got ${other.size}")
  }
}
