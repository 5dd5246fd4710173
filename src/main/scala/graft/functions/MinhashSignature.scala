package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature over pre-hashed shingles (array<long>): slot k
  * is min over shingles of xxhash64(shingle_hash, seed=k). One fused loop
  * nest per row — the composed form ran n `array_min(transform(...))`
  * columns, each allocating an intermediate array per row.
  *
  * Null elements are SKIPPED (treated as absent shingles): reading a null
  * slot as 0L would inject xxhash64(0, k) minima into every affected
  * signature, making all documents with a null shingle spuriously collide
  * in the LSH bands. The repo's shingle pipelines never produce null
  * elements; the skip is defensive. */
case class MinhashSignature(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0 && n <= 512, "1..512 signature slots")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val mins = Array.fill(n)(Long.MaxValue)
    var i = 0
    val len = hs.numElements()
    while (i < len) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var k = 0
        while (k < n) {
          val v = XXH64.hashLong(h, k.toLong)
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val mins = ctx.freshName("mins"); val i = ctx.freshName("i")
      val k = ctx.freshName("k"); val h = ctx.freshName("h")
      val v = ctx.freshName("v"); val len = ctx.freshName("len")
      val hasher = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |long[] $mins = new long[$n];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $len = $hs.numElements();
         |for (int $i = 0; $i < $len; $i++) {
         |  if ($hs.isNullAt($i)) continue;
         |  long $h = $hs.getLong($i);
         |  for (int $k = 0; $k < $n; $k++) {
         |    long $v = $hasher.hashLong($h, (long) $k);
         |    if ($v < $mins[$k]) $mins[$k] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
