package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC) — the rolling-hash boundary detector a
  * dedup/storage pipeline runs to split documents at CONTENT-determined
  * positions, so an insertion early in a document shifts only one chunk's
  * boundary instead of re-chunking everything after it (the property
  * fixed-size chunking lacks, and the reason rsync/LBFS-style dedup uses
  * CDC).
  *
  * Definition (shared verbatim by the Catalyst expression, the Scala
  * reference in `ChunkerSpec`, and the DuckDB oracle): over a document's
  * Unicode CODE POINTS (not bytes, not UTF-16 units — the one unit both
  * engines count identically), the hash at position i (0-based, i ≥ W−1)
  * is the Horner fold of the W code points ending at i:
  * H = fold(acc = 0; acc = (acc·B + cp) mod P). Position i is a chunk
  * boundary iff H mod M == 0. The expression returns the boundary
  * positions as array<int>.
  *
  * The implementation is O(n) per document — a true ROLLING update
  * (H ← (H − cp_out·B^{W−1})·B + cp_in mod P), while the oracle recomputes
  * each window independently (O(n·W)); both produce identical values
  * because the rolling form is the same polynomial mod P.
  */
object Chunker {
  /** Window width in code points. */
  val Window = 16
  /** Polynomial base and modulus (P prime, B·P < 2^63 — no overflow). */
  val Base = 31L
  val Prime = 1000003L
  /** Boundary mask: ~1 boundary per M positions. */
  val BoundaryMod = 64L

  /** B^(W−1) mod P, for the rolling eviction term. */
  val PowOut: Long = {
    var p = 1L
    var i = 0
    while (i < Window - 1) { p = p * Base % Prime; i += 1 }
    p
  }

  /** Boundary positions (0-based code-point indices) — the static core
    * both `eval` and the generated code call. */
  def boundaries(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var h = 0L
    var cpIdx = 0 // code-point index of the point about to be read
    var charIdx = 0 // UTF-16 index into str
    // ring buffer of the last W code points, for the eviction term
    val ring = new Array[Long](Window)
    while (charIdx < str.length) {
      val cp = str.codePointAt(charIdx)
      if (cpIdx >= Window) {
        val out0 = ring(cpIdx % Window)
        h = Math.floorMod(h - out0 * PowOut % Prime, Prime)
      }
      h = (h * Base + cp) % Prime
      ring(cpIdx % Window) = cp
      if (cpIdx >= Window - 1 && h % BoundaryMod == 0L)
        out += cpIdx
      cpIdx += 1
      charIdx += Character.charCount(cp)
    }
    new GenericArrayData(out.toArray)
  }

  case class ChunkBoundaries(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_chunks expects string, got ${child.dataType}")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_chunks"

    override protected def nullSafeEval(a: Any): Any =
      boundaries(a.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.Chunker.boundaries($c)")

    override protected def withNewChildInternal(newChild: Expression): ChunkBoundaries =
      copy(child = newChild)
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_chunks"),
      new ExpressionInfo(classOf[ChunkBoundaries].getName, "graft_chunks"),
      (args: Seq[Expression]) => ChunkBoundaries(args.head)))

  /** Idempotent registration (same defensive pattern as VectorExprs). */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (ident, _, builder) =>
      if (!reg.functionExists(ident))
        reg.createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
  }

  /** Column front. */
  def chunkBoundaries(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("graft_chunks", text)
}
