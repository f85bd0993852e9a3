package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions for the dedup/text-analysis hot paths.
  *
  * These are per-row scalar kernels: at 100 TB they are the inner loop of
  * shingling/fingerprinting every document, so they must stay in compiled
  * code (Spark's split/transform/aggregate higher-order pipeline is
  * CodegenFallback — interpreted per element) and must not force a shuffle
  * (the relational shingle construction needed a posexplode + per-doc
  * window + distinct; [[WordShingles]] produces the deduped shingle array
  * in a single map).
  *
  * Codegen strategy: one static call per row into compiled Scala — keeps the
  * surrounding operators inside whole-stage codegen while the string loop
  * runs as ordinary JIT'd bytecode.
  */
object TextKernels {

  /** Tokenize exactly like Spark's split(trim(lower(text)), "\\s+"): lower
    * is locale-independent, trim strips U+0020 only (not \t\n), and split
    * uses limit -1 (Spark's default — a trailing \t after space-trim yields
    * a trailing empty token, matching the HOF reference forms bit-for-bit).
    * The ONE tokenizer behind both [[wordShingles]] and [[simHash]], so the
    * two kernels can never drift apart.
    */
  def tokenize(text: UTF8String): Array[String] = {
    val lowered = text.toLowerCase.toString
    var from = 0
    var to = lowered.length
    while (from < to && lowered.charAt(from) == ' ') from += 1
    while (to > from && lowered.charAt(to - 1) == ' ') to -= 1
    lowered.substring(from, to).split("\\s+", -1)
  }

  /** Lowercase, trim, split on whitespace runs, emit DISTINCT space-joined
    * word n-grams (first-occurrence order). Matches
    * array_distinct(ngrams(split(trim(lower(text)), "\\s+"))) exactly.
    */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val words = tokenize(text)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= words.length - n) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** h = (h*31 + codepoint) mod 1e9+7 over the string's code points —
    * bit-identical to TextAnalysis.fingerprint's HOF form and to the DuckDB
    * oracle's list_reduce over string_split + ascii.
    */
  def polyHash(text: UTF8String): Long = polyHashStr(text.toString)

  def polyHashStr(s: String): Long = {
    var h = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  /** One-pass SimHash signature: [[tokenize]], hash each word with
    * [[polyHashStr]], accumulate the per-bit +1/-1 votes in a single array,
    * and emit the sign bits. Bit-identical to the HOF reference form
    * [[graft.ops.Dedup.simhashHof]] (32 interpreted aggregate() passes),
    * but one compiled pass per row — this is the inner loop of signing
    * every document at 100 TB.
    */
  def simHash(text: UTF8String, bits: Int): Long = {
    val words = tokenize(text)
    val acc = new Array[Long](bits)
    var i = 0
    while (i < words.length) {
      val h = polyHashStr(words(i))
      var j = 0
      while (j < bits) {
        acc(j) += ((h >> j) & 1L) * 2L - 1L
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (acc(j) > 0L) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** array<string> of distinct word n-gram shingles of `child`. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"WordShingles needs string, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    TextKernels.wordShingles(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Portable polynomial hash of a string (mod 1e9+7). */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"PolyHash needs string, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    TextKernels.polyHash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.polyHash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass SimHash signature of `child` (see [[TextKernels.simHash]]). */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"SimHash needs string, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    TextKernels.simHash(v.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simHash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  private def expr(c: Column): Expression = GraftColumnBridge.toExpression(c)

  def wordShingles(text: Column, n: Int): Column =
    GraftColumnBridge.toColumn(WordShingles(expr(text), n))

  def polyHash(text: Column): Column =
    GraftColumnBridge.toColumn(PolyHash(expr(text)))

  def simHash(text: Column, bits: Int): Column =
    GraftColumnBridge.toColumn(SimHash(expr(text), bits))
}
