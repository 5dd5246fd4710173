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
  * Up to 64 planes (one long of sign bits).
  *
  * A vector whose length differs from the plane dimension, or with a null
  * or NON-FINITE element, yields NULL — truncating to the shared prefix
  * would silently bucket malformed embeddings into wrong LSH tables
  * (recall loss with no error anywhere), and a NaN dot product's
  * `acc >= 0.0 == false` would deterministically co-bucket every
  * malformed vector; the same contract as [[CosineSimilarity]].
  *
  * `planes` is a Seq-of-Seq so the case class gets STRUCTURAL equality —
  * an Array field compares by reference, which would defeat
  * `semanticEquals`, subexpression elimination, and plan-fragment reuse
  * for identical plane matrices. The hot loop reads a private
  * pre-converted primitive matrix. */
case class HyperplaneBits(child: Expression, planes: Seq[Seq[Double]])
  extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 64, "1..64 hyperplanes")
  require(planes.forall(_.length == planes.head.length),
    "all hyperplanes must share one dimension")

  // primitive matrix for the eval/codegen hot loop (not a case field —
  // equality stays structural on `planes`)
  @transient private lazy val matrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray
  private def dim: Int = planes.head.length

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bits expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bits"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != dim) return null
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i) || !java.lang.Float.isFinite(x.getFloat(i))) return null
      i += 1
    }
    var bits = 0L
    var p = 0
    while (p < matrix.length) {
      val w = matrix(p)
      var acc = 0.0
      i = 0
      while (i < dim) { acc += x.getFloat(i).toDouble * w(i); i += 1 }
      if (acc >= 0.0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val planesRef = ctx.addReferenceObj("planes", matrix, "double[][]")
      val bits = ctx.freshName("bits"); val p = ctx.freshName("p")
      val w = ctx.freshName("w"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i"); val bad = ctx.freshName("bad")
      s"""
         |if ($x.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($x.isNullAt($i) || !java.lang.Float.isFinite($x.getFloat($i))) {
         |      $bad = true; break;
         |    }
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    long $bits = 0L;
         |    for (int $p = 0; $p < $planesRef.length; $p++) {
         |      double[] $w = $planesRef[$p];
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $dim; $i++) {
         |        $acc += ((double) $x.getFloat($i)) * $w[$i];
         |      }
         |      if ($acc >= 0.0) $bits |= (1L << $p);
         |    }
         |    ${ev.value} = $bits;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
