package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static MinHash kernel referenced from generated code (same pattern as
  * [[VectorCodegen]]): tokens -> k-shingles -> 32-bit md5 hashes ->
  * numHashes permutation minima, value-identical to the staged SQL form
  * `TextOps.minhashSigSql` (same md5-prefix hash, same permutation
  * arithmetic mod 1e9+7) so DuckDB oracle parity is preserved.
  */
object TextCodegen {

  /** First 8 hex chars of md5 as an unsigned 32-bit value (the scalar twin
    * of `TextOps.hash32Sql`: md5 of UTF-8 bytes, first 4 bytes big-endian).
    */
  private def md5Hash32(md: java.security.MessageDigest, s: String): Long = {
    val d = md.digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Whole signature for one document; `null` entries mean "no shingles"
    * (documents shorter than the shingle size), matching the HOF/SQL form
    * where array_min of an empty array is NULL.
    */
  def minhashSigArray(
      text: String, shingleK: Int, numHashes: Int): Array[java.lang.Long] = {
    val toks = text.trim.split("\\s+")
    val shingles =
      if (toks.length < shingleK) Array.empty[String]
      else toks.sliding(shingleK).map(_.mkString(" ")).toArray.distinct
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = shingles.map(md5Hash32(md, _))
    Array.tabulate[java.lang.Long](numHashes) { j =>
      if (hs.isEmpty) null
      else {
        val a = (j.toLong * 2654435761L + 1L) % 1000000007L
        var min = Long.MaxValue
        var i = 0
        while (i < hs.length) {
          val v = (a * hs(i) + j * 97L + 13L) % 1000000007L
          if (v < min) min = v
          i += 1
        }
        java.lang.Long.valueOf(min)
      }
    }
  }

  /** Codegen entry point: UTF8String in, catalyst ArrayData out — no
    * encoder round-trip, no UDF null-handling wrapper.
    */
  def minhashSig(s: UTF8String, shingleK: Int, numHashes: Int): ArrayData = {
    val arr = minhashSigArray(s.toString, shingleK, numHashes)
    val boxed = new Array[Any](arr.length)
    var i = 0
    while (i < arr.length) { boxed(i) = arr(i); i += 1 }
    new GenericArrayData(boxed)
  }

  /** Unicode NFC normalization (codegen entry point): composes combining
    * sequences to their canonical precomposed forms — the CCNet-style
    * text-canonicalization step that makes fingerprints and shingles
    * agree across sources that emit the same text in NFC vs NFD. The
    * already-normalized fast path (`isNormalized`) skips the rebuild,
    * which is the common case on crawled ASCII-heavy text.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** MinHash signature as a first-class Catalyst expression with whole-stage
  * codegen — the hot per-row kernel of the near-dup pipeline (q24/q25/q31)
  * runs as one generated call instead of a ScalaUDF with its input/output
  * encoder conversions. The per-document cost is O(shingles x numHashes)
  * either way; this removes the per-row wrapper overhead, which is what's
  * left at 100x scale.
  */
case class MinHashSigExpr(child: Expression, shingleK: Int, numHashes: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig_native"
  override protected def nullSafeEval(input: Any): Any =
    TextCodegen.minhashSig(input.asInstanceOf[UTF8String], shingleK, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextCodegen.minhashSig($c, $shingleK, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** Unicode NFC normalization as a codegen'd Catalyst expression (no
  * ScalaUDF wrapper in the canonicalization hot path); value-parity with
  * DuckDB's `nfc_normalize` is oracle-gated (q85).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.StringType
  override def prettyName: String = "nfc_normalize_native"
  override protected def nullSafeEval(input: Any): Any =
    TextCodegen.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextCodegen.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object TextExpressions {
  def minhash_sig(c: Column, shingleK: Int, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSigExpr(ColumnBridge.expression(c), shingleK, numHashes))

  def nfc_normalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  /** SQL builder: `minhash_sig_native(text, shingleK, numHashes)` with
    * literal int parameters (shared by runtime registration and
    * [[GraftExtensions]] session-extension injection).
    */
  def sqlBuilder(exprs: Seq[Expression]): MinHashSigExpr =
    MinHashSigExpr(exprs.head,
      IntLiteral.of("minhash_sig_native", exprs(1)),
      IntLiteral.of("minhash_sig_native", exprs(2)))

  /** SQL surface (runtime registration, same contract as
    * [[UrlExpressions.register]]).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig_native", sqlBuilder _, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize_native", exprs => NfcNormalize(exprs.head), "scala_udf")
  }
}

/** Literal-int extraction for SQL function builders whose expressions take
  * compile-time parameters (shingle size, hash count, plane count).
  */
private[plans] object IntLiteral {
  def of(fn: String, e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions
      .Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects literal int parameters, got $other")
  }
}
