package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native random-hyperplane signature: bit p of the result is the sign of
  * ⟨x, planes(p)⟩. Replaces per-plane `aggregate(zip_with(...))` columns on
  * the LSH path — with L tables × b planes the composed form walks L·b
  * lambda-closure passes and allocates L·b product arrays per row; this is
  * one fused loop nest over a broadcast-referenced plane matrix.
  * Up to 64 planes (one long of sign bits). */
case class HyperplaneBits(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 64, "1..64 hyperplanes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bits expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bits"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    var bits = 0L
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      val n = math.min(x.numElements(), w.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getFloat(i).toDouble * w(i); i += 1 }
      if (acc >= 0.0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      val bits = ctx.freshName("bits"); val p = ctx.freshName("p")
      val w = ctx.freshName("w"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      s"""
         |long $bits = 0L;
         |for (int $p = 0; $p < $planesRef.length; $p++) {
         |  double[] $w = $planesRef[$p];
         |  int $n = java.lang.Math.min($x.numElements(), $w.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $x.getFloat($i)) * $w[$i];
         |  }
         |  if ($acc >= 0.0) $bits |= (1L << $p);
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
