package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float vectors.
  *
  * Replaces the composed `aggregate(zip_with(...))` form on the similarity
  * hot path (SURVEY.md §2.7 D4): the higher-order-function version
  * allocates an intermediate product array and walks three lambda closures
  * per pair; this expression runs one fused primitive loop inside
  * whole-stage codegen — no allocation, no virtual calls.
  *
  * Numerics are kept IDENTICAL to the composed form (and to the DuckDB
  * oracle's `list_dot_product`): elements widened to double, sequential
  * left-to-right accumulation, `dot / (sqrt(na)·sqrt(nb))` — so swapping
  * the implementations never changes a result bit. Mismatched vector
  * lengths and NULL ELEMENTS both yield NULL, also matching the composed
  * `zip_with` form (whose null-padded/null-element products poison the
  * aggregate) — truncating to the shared prefix or reading a null slot as
  * 0.0 would silently score malformed embeddings. Non-finite elements
  * (NaN/±Inf — a partially-failed encoder) likewise yield NULL: the
  * similarity of a malformed vector is undefined, and the NaN the raw
  * arithmetic would produce ranks ABOVE every real similarity in a
  * descending top-k. */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  // nullable even over non-null children: length mismatch and zero-norm
  // inputs produce null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      // zero-norm side (zero vector, or an empty array — a failed or
      // skipped encoder upstream): the similarity is UNDEFINED — return
      // null like the length-mismatch case, not the 0/0 NaN, which Spark
      // ranks ABOVE every real similarity in a descending top-k.
      // Non-finite ELEMENTS (NaN/±Inf — a partially-failed encoder) are
      // the same undefined class: one O(1) post-loop check (any NaN
      // element makes its norm NaN, any ±Inf makes it +Inf — float² sums
      // cannot overflow a double) instead of a per-element branch; a NaN
      // similarity would otherwise rank #1 for EVERY query it meets
      if (na == 0.0 || nb == 0.0 ||
          !java.lang.Double.isFinite(na) || !java.lang.Double.isFinite(nb)) null
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    double $xi = (double) $a.getFloat($i);
         |    double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if ($bad || $na == 0.0 || $nb == 0.0 ||
         |      !java.lang.Double.isFinite($na) || !java.lang.Double.isFinite($nb)) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
