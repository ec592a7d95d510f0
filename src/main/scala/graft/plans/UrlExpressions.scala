package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.UrlFunctions

/** Static helpers referenced from generated Java code (must be a plain
  * object with JVM-static-reachable methods).
  */
object UrlCodegen {
  /** FNV-1a over the UTF8String's bytes without copying to a String. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xff).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def normalize(s: UTF8String): UTF8String =
    UTF8String.fromString(UrlFunctions.normalizeUrl(s.toString))

  def extractPld(s: UTF8String): UTF8String =
    UTF8String.fromString(UrlFunctions.extractPld(s.toString))
}

/** Native 64-bit URL hash with whole-stage codegen: the frontier key
  * function (SURVEY §2.14 urlHash64) as a first-class Catalyst expression —
  * no UDF boxing, works on UTF8String bytes directly.
  */
case class UrlHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "url_hash64_native"
  override protected def nullSafeEval(input: Any): Any =
    UrlCodegen.fnv1a64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.UrlCodegen.fnv1a64($c)")
  override protected def withNewChildInternal(newChild: Expression): UrlHash64 =
    copy(child = newChild)
}

/** URL normalization as a Catalyst expression (CodegenFallback: the
  * algorithm is branchy string work with no profitable codegen form, but
  * as an Expression it still avoids UDF null-handling wrappers and is
  * registrable for SQL).
  */
case class NormalizeUrl(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_url_native"
  override protected def nullSafeEval(input: Any): Any =
    UrlCodegen.normalize(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): NormalizeUrl =
    copy(child = newChild)
}

/** Paid-level-domain extraction as a Catalyst expression. */
case class ExtractPld(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "extract_pld_native"
  override protected def nullSafeEval(input: Any): Any =
    UrlCodegen.extractPld(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): ExtractPld =
    copy(child = newChild)
}

object UrlExpressions {

  def url_hash64(c: Column): Column =
    ColumnBridge.column(UrlHash64(ColumnBridge.expression(c)))
  def normalize_url(c: Column): Column =
    ColumnBridge.column(NormalizeUrl(ColumnBridge.expression(c)))
  def extract_pld(c: Column): Column =
    ColumnBridge.column(ExtractPld(ColumnBridge.expression(c)))

  /** Runtime registration for SQL use (no session restart needed). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "url_hash64_native", exprs => UrlHash64(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "normalize_url_native", exprs => NormalizeUrl(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "extract_pld_native", exprs => ExtractPld(exprs.head), "scala_udf")
  }
}

/** Session-extension wiring: `--conf spark.sql.extensions=
  * graft.plans.GraftExtensions` makes the library's whole native-function
  * surface — URL keys, the MinHash signature kernel, the vector kernels —
  * available in every session of the cluster without runtime registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    def inject(
        name: String, clazz: Class[_],
        builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        builder))
    inject("url_hash64_native", classOf[UrlHash64],
      exprs => UrlHash64(exprs.head))
    inject("normalize_url_native", classOf[NormalizeUrl],
      exprs => NormalizeUrl(exprs.head))
    inject("extract_pld_native", classOf[ExtractPld],
      exprs => ExtractPld(exprs.head))
    inject("minhash_sig_native", classOf[MinHashSigExpr],
      TextExpressions.sqlBuilder)
    inject("nfc_normalize_native", classOf[NfcNormalize],
      exprs => NfcNormalize(exprs.head))
    inject("vec_dot", classOf[DotProduct],
      exprs => DotProduct(exprs.head, exprs(1)))
    inject("vec_lsh_bucket", classOf[LshBucketExpr],
      VectorExpressions.lshSqlBuilder)
    inject("zvalue2", classOf[ZValue2Expr], ZOrderExpressions.sqlBuilder2)
    inject("zvalue3", classOf[ZValue3Expr], ZOrderExpressions.sqlBuilder3)
  }
}
