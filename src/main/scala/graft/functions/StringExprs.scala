package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}

/** Native string-distance expression for the entity-resolution hot path
  * (X118 fuzzy join). Hamming distance is evaluated candidate-pair times —
  * after deletion-neighborhood blocking that is still millions of calls per
  * partition, so it gets the same treatment as the vector kernels in
  * [[VectorExprs]]: a primitive byte loop with `doGenCode`, inside
  * whole-stage codegen, not a Scala UDF (which would box both strings and
  * break the codegen span).
  */
object StringExprs {

  /** Byte-wise Hamming distance of two equal-length strings; NULL when the
    * byte lengths differ (the distance is undefined, and returning a
    * sentinel would silently pollute distance histograms — same contract
    * shape as DuckDB's `hamming`, which errors on unequal lengths, except
    * composable under filters). Byte-wise == char-wise for the ASCII keys
    * this engine blocks on; documented rather than hidden. */
  case class HammingDist(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == StringType && right.dataType == StringType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_hamming expects (string, string), " +
          s"got (${left.dataType}, ${right.dataType})")
    override def dataType: DataType = IntegerType
    // Null on length mismatch even when both inputs are non-null.
    override def nullable: Boolean = true
    override def prettyName: String = "graft_hamming"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      val y = b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      if (x.numBytes() != y.numBytes()) return null
      val xb = x.getBytes
      val yb = y.getBytes
      var d = 0
      var i = 0
      while (i < xb.length) {
        if (xb(i) != yb(i)) d += 1
        i += 1
      }
      d
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (xb, yb, d, i) = (ctx.freshName("xb"), ctx.freshName("yb"),
          ctx.freshName("d"), ctx.freshName("i"))
        s"""
           |if ($a.numBytes() != $b.numBytes()) {
           |  ${ev.isNull} = true;
           |} else {
           |  byte[] $xb = $a.getBytes();
           |  byte[] $yb = $b.getBytes();
           |  int $d = 0;
           |  for (int $i = 0; $i < $xb.length; $i++) {
           |    if ($xb[$i] != $yb[$i]) $d++;
           |  }
           |  ${ev.value} = $d;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): HammingDist =
      copy(left = newLeft, right = newRight)
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[HammingDist].getName, "graft_hamming"),
      (es: Seq[Expression]) => HammingDist(es(0), es(1))))

  /** Idempotent registration into the current session's function registry. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (ident, _, builder) =>
      if (!reg.functionExists(ident))
        reg.createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
  }

  def hamming(a: Column, b: Column): Column =
    call_function("graft_hamming", a, b)
}
