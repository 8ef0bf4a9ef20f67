package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits per symbol) of a row's symbol distribution — the
  * classic gibberish / binary-junk / padding signal a pretraining text
  * pipeline scores every document with (random symbols → high, repeated
  * padding → near 0, natural language sits in a stable band; cf. the
  * CCNet/Gopher-family quality-rule stacks). Two alphabets, one formula:
  *
  *  - [[CharEntropy]]:  string → entropy over Unicode CODE POINTS
  *  - [[TokenEntropy]]: array<string> → entropy over exact token values
  *
  * entropy = (ln n − (Σ_v c_v·ln c_v)/n) / ln 2 over the per-value counts
  * c_v. Every input to the float chain is an INTEGER count, and the Σ is
  * taken in ascending symbol order (codepoint order / UTF-8 binary order —
  * the same order SQL's binary collation sorts), so any engine summing the
  * same ordered term list reproduces the double bit-for-bit; the DuckDB
  * oracle replays it as list_sum(list(c*ln(c) ORDER BY symbol)). Empty
  * input (n = 0) → NULL, never NaN — internally NaN is only the
  * eval-to-codegen "input empty" sentinel (true entropy is always finite).
  *
  * Per-row projection only: no exchange, no state — at 100 TB this is a
  * pure map over the scan, and the expression stays inside whole-stage
  * codegen (the generated code is one static call into the tight count
  * loop below, the [[PqExpressions]] precedent).
  */
object EntropyExpressions {

  private def entropyOf(counts: java.util.Iterator[Array[Long]], n: Long): Double = {
    if (n == 0L) return Double.NaN
    var sum = 0.0
    while (counts.hasNext) {
      val c = counts.next()(0).toDouble
      sum += c * Math.log(c)
    }
    (Math.log(n.toDouble) - sum / n.toDouble) / Math.log(2.0)
  }

  /** Codepoint entropy; NaN = "empty string" sentinel (mapped to NULL). */
  def charEntropyOf(s: UTF8String): Double = {
    val str = s.toString
    // TreeMap = ascending codepoint order, the order the Σ is taken in
    val m = new java.util.TreeMap[Integer, Array[Long]]()
    var i = 0; var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val e = m.get(cp)
      if (e == null) m.put(cp, Array(1L)) else e(0) += 1L
      n += 1L
      i += Character.charCount(cp)
    }
    entropyOf(m.values().iterator(), n)
  }

  /** Token-value entropy; null elements are skipped (SQL aggregate
    * convention); NaN = "no non-null tokens" sentinel (mapped to NULL). */
  def tokenEntropyOf(arr: ArrayData): Double = {
    // UTF8String.compareTo is unsigned byte order = SQL binary collation
    val m = new java.util.TreeMap[UTF8String, Array[Long]]()
    val len = arr.numElements()
    var i = 0; var n = 0L
    while (i < len) {
      if (!arr.isNullAt(i)) {
        // copy out of the (possibly reused) unsafe buffer before keying
        val t = arr.getUTF8String(i).clone()
        val e = m.get(t)
        if (e == null) m.put(t, Array(1L)) else e(0) += 1L
        n += 1L
      }
      i += 1
    }
    entropyOf(m.values().iterator(), n)
  }

  private val registered = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  /** Register both functions in the session's registry (idempotent) and
    * return a Column — the registry-based construction the other native
    * expressions here use to stay on the public Column API. */
  private def call(spark: org.apache.spark.sql.SparkSession, name: String, c: Column): Column = {
    registered.computeIfAbsent(spark.sessionState.toString, { _ =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "char_entropy", exprs => CharEntropy(exprs.head), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "token_entropy", exprs => TokenEntropy(exprs.head), "built-in")
      true
    })
    org.apache.spark.sql.functions.call_function(name, c)
  }

  def charEntropy(spark: org.apache.spark.sql.SparkSession, text: Column): Column =
    call(spark, "char_entropy", text)

  def tokenEntropy(spark: org.apache.spark.sql.SparkSession, tokens: Column): Column =
    call(spark, "token_entropy", tokens)
}

/** `char_entropy(string) → double`: Shannon entropy in bits/codepoint of
  * the string's codepoint distribution; NULL for the empty string. */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_entropy requires string, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = EntropyExpressions.charEntropyOf(input.asInstanceOf[UTF8String])
    if (java.lang.Double.isNaN(v)) null else java.lang.Double.valueOf(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val v = ctx.freshName("v")
      s"""
         |double $v = graft.functions.EntropyExpressions.charEntropyOf($s);
         |if (Double.isNaN($v)) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `token_entropy(array<string>) → double`: Shannon entropy in bits/token
  * of the array's value distribution; null elements skipped; NULL when no
  * non-null element remains. */
case class TokenEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_entropy requires array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = EntropyExpressions.tokenEntropyOf(input.asInstanceOf[ArrayData])
    if (java.lang.Double.isNaN(v)) null else java.lang.Double.valueOf(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val v = ctx.freshName("v")
      s"""
         |double $v = graft.functions.EntropyExpressions.tokenEntropyOf($a);
         |if (Double.isNaN($v)) { ${ev.isNull} = true; } else { ${ev.value} = $v; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
