package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing position selection — the per-document core of substring-level
  * dedup (`q_substr_dupes`, Dedup.scala). A position i (1-based, code
  * points, mirroring SQL `substring`) is SELECTED when its N-gram is the
  * minimum of the trailing W-position window — the same rule as the
  * window-SQL formulation `gram = MIN(gram) OVER (PARTITION BY doc ORDER
  * BY i ROWS W-1 PRECEDING)`, which remains the DuckDB oracle, so the
  * cross-engine gate itself proves this native form equivalent.
  *
  * Why native: the declarative form explodes EVERY position into a row,
  * materializes every gram string, and sorts all position rows for the
  * window exec, then discards ~W/(W+1) of them. This expression does the
  * identical selection in ONE pass over the text with a monotonic deque
  * (each position enters/leaves the deque once), allocates NO gram
  * strings (grams are compared in place over a shared code-point array),
  * and returns only the selected positions — the explode that follows
  * fans out ~2/(W+1) of the positions instead of all of them, and the
  * per-doc winnow needs neither a repartition nor a sort. O(n·N) worst
  * case per document, O(n) deque operations.
  *
  * Comparison order: code points, equal to the UTF-8 byte order both
  * engines' binary string comparators use (and to the raw-string order of
  * the window formulation). Selection density and bias notes live on the
  * operator (Dedup.SubstrW).
  */
object Winnow {

  /** cmp of the N-grams starting at code-point indices a and b of cps
    * (0-based); grams are `n` code points, both fully in range. */
  private def cmpGram(cps: Array[Int], a: Int, b: Int, n: Int): Int = {
    var k = 0
    while (k < n) {
      val d = Integer.compare(cps(a + k), cps(b + k))
      if (d != 0) return d
      k += 1
    }
    0
  }

  /** Selected 1-based code-point positions for text `s` with gram length
    * `n` and window `w` — the static core both `eval` and the generated
    * code call. Empty array when the text holds fewer than `n` points. */
  def selected(s: UTF8String, n: Int, w: Int): GenericArrayData = {
    val str = s.toString
    // decode once to code points: gram comparisons then index this array
    var cpCount = 0
    var ci = 0
    while (ci < str.length) { cpCount += 1; ci += Character.charCount(str.codePointAt(ci)) }
    val cps = new Array[Int](cpCount)
    ci = 0; var p = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      cps(p) = cp; p += 1; ci += Character.charCount(cp)
    }
    val grams = cpCount - n + 1
    if (grams <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    // monotonic deque of gram start indices; grams strictly increasing
    // front→back, front = window minimum
    val deque = new Array[Int](grams)
    var head = 0
    var tail = 0 // exclusive
    var g = 0
    while (g < grams) {
      while (head < tail && deque(head) <= g - w) head += 1
      // pop every gram >= the current: equals pop too, so after the push
      // the current gram is the unique minimum iff it is the only element
      while (head < tail && cmpGram(cps, deque(tail - 1), g, n) >= 0) tail -= 1
      deque(tail) = g; tail += 1
      if (tail - head == 1) out += g + 1 // current == window min → selected
      g += 1
    }
    new GenericArrayData(out.toArray)
  }

  case class WinnowSelect(child: Expression, n: Int, w: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_winnow expects string, got ${child.dataType}")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_winnow"

    override protected def nullSafeEval(a: Any): Any =
      selected(a.asInstanceOf[UTF8String], n, w)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Winnow.selected($c, $n, $w)")

    override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
      copy(child = newChild)
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowSelect].getName, "graft_winnow"),
      (args: Seq[Expression]) => {
        // validated here, not in checkInputDataTypes: n and w are frozen
        // into the expression at build, so a bad literal must fail the
        // SQL call with a real message, not a late ClassCastException
        if (args.length != 3)
          throw new IllegalArgumentException(
            s"graft_winnow(text, n, w) expects 3 arguments, got ${args.length}")
        def intLit(e: Expression, name: String): Int = {
          if (!e.foldable || e.dataType != IntegerType)
            throw new IllegalArgumentException(
              s"graft_winnow: $name must be an INT literal, got ${e.sql}")
          val raw = e.eval()
          if (raw == null) throw new IllegalArgumentException(
            s"graft_winnow: $name must be a non-NULL INT literal")
          val v = raw.asInstanceOf[Int]
          if (v < 1) throw new IllegalArgumentException(
            s"graft_winnow: $name must be >= 1, got $v")
          v
        }
        WinnowSelect(args.head, intLit(args(1), "n"), intLit(args(2), "w"))
      }))

  /** Idempotent registration (same defensive pattern as Chunker). */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (ident, _, builder) =>
      if (!reg.functionExists(ident))
        reg.createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
  }

  /** Column front. */
  def winnowSelect(text: org.apache.spark.sql.Column, n: Int, w: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("graft_winnow", text,
      org.apache.spark.sql.functions.lit(n), org.apache.spark.sql.functions.lit(w))
}
