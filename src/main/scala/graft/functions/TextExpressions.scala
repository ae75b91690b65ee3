package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Single-pass per-document text kernels, shared by the eval and codegen
  * paths of the expressions below. Each walks one token array and returns
  * a scalar/struct — the array-side replacement for an explode + shuffle
  * formulation: at 100 TB the exploded shingle stream is orders of
  * magnitude larger than the documents themselves, and all of it was
  * being shuffled only to be re-grouped by doc_id.
  */
object TextKernels {

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private def shingleAt(toks: ArrayData, i: Int): String = {
    val sb = new java.lang.StringBuilder()
    sb.append(toks.getUTF8String(i).toString).append(' ')
    sb.append(toks.getUTF8String(i + 1).toString).append(' ')
    sb.append(toks.getUTF8String(i + 2).toString)
    sb.toString
  }

  /** 56-bit SimHash over the DISTINCT word-3-gram shingles of a token
    * array. Bit-compatible with the exploded formulation (and the DuckDB
    * oracle): per shingle h = first 14 hex chars of md5 (= first 7 digest
    * bytes, big-endian); signature bit b is set iff set-votes outnumber
    * clear-votes, 2·c_b > cnt. Caller guarantees ≥ 3 tokens.
    */
  def simhash56(toks: ArrayData): Long = {
    val n = toks.numElements()
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](56)
    var cnt = 0
    val md = md5Local.get()
    var i = 0
    while (i <= n - 3) {
      val s = shingleAt(toks, i)
      if (seen.add(s)) {
        cnt += 1
        md.reset()
        val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        var k = 0
        while (k < 56) { votes(k) += ((h >>> k) & 1L).toInt; k += 1 }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 56) { if (2 * votes(b) > cnt) sig |= 1L << b; b += 1 }
    sig
  }

  /** Word-3-gram multiset statistics of a token array:
    * (total_3grams, distinct_3grams, top_count) — the Gopher repetition
    * filter's inputs, computed in one hash-map walk. Caller guarantees
    * ≥ 3 tokens.
    */
  def ngramStats(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    val counts = new java.util.HashMap[String, Integer]()
    var top = 0
    var i = 0
    while (i <= n - 3) {
      val s = shingleAt(toks, i)
      val c = counts.merge(s, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
      if (c > top) top = c.intValue()
      i += 1
    }
    InternalRow((n - 2).toLong, counts.size.toLong, top.toLong)
  }
}

/** `simhash56(tokens)` — the whole signature pipeline (shingle → distinct
  * → md5 → 56 bit votes → threshold) in one codegen'd projection. The
  * exploded alternative shuffles every shingle row and aggregates 56 sum
  * columns; this is a narrow map with zero shuffle.
  */
case class SimhashFromTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash56"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash56 expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(toks: Any): Any =
    TextKernels.simhash56(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.simhash56($a)")

  override protected def withNewChildInternal(newChild: Expression): SimhashFromTokens =
    copy(child = newChild)
}

/** `ngram_stats(tokens)` → struct(total_3grams, distinct_3grams,
  * top_count): the repetition filter's per-document statistics without
  * exploding the shingle stream.
  */
case class NgramStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("total_3grams", LongType, nullable = false),
    StructField("distinct_3grams", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false)))
  override def prettyName: String = "ngram_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_stats expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(toks: Any): Any =
    TextKernels.ngramStats(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.ngramStats($a)")

  override protected def withNewChildInternal(newChild: Expression): NgramStats =
    copy(child = newChild)
}

object TextFunctions {

  /** Register `simhash56` and `ngram_stats`; idempotent (see
    * VectorFunctions).
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier("simhash56"))) {
      registry.createOrReplaceTempFunction(
        "simhash56", exprs => SimhashFromTokens(exprs(0)), "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("ngram_stats"))) {
      registry.createOrReplaceTempFunction(
        "ngram_stats", exprs => NgramStats(exprs(0)), "built-in")
    }
  }
}
