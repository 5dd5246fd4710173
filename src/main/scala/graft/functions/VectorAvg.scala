package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom AGGREGATE extension point (complementing the five scalar codegen
  * expressions): element-wise mean of an `array<float>` embedding column in
  * ONE pass with map-side partial aggregation — the centroid primitive
  * (cluster centers, per-group embedding profiles). The composed
  * alternative (posexplode → groupBy(idx) → avg → re-collect) shuffles one
  * row per vector ELEMENT; this shuffles one buffer per group per task.
  *
  * Cross-engine determinism: each element is quantized to integer
  * micro-units (`floor(x·10⁶ + 0.5)`) at reduce time, so the buffer is an
  * integer vector sum — order-independent under any partitioning (float
  * accumulation would make the result partition-layout-dependent).
  * Overflow headroom: 10⁶-scaled unit-ish values × ~10¹² rows per group
  * before approaching 2⁶³.
  *
  * The buffer carries a PER-SLOT count alongside the per-slot sum, so a
  * ragged group (one truncated embedding) averages each index over the
  * rows that actually have it — exactly what the documented composed
  * equivalent computes; dividing every slot by the total row count would
  * silently shrink all trailing elements instead.
  *
  * Non-finite elements (NaN/±Inf — a partially-failed encoder) are
  * excluded from their slot like a missing trailing element: a centroid
  * is a fitted statistic (the engine-wide `finiteOrNull` rule), and the
  * raw quantization would otherwise LAUNDER the poison — NaN quantizes
  * to 0L (counted as a clean 0.0 sample) and ±Inf to Long.MaxValue/
  * MinValue, wrapping the integer sum into an arbitrary finite mean
  * with no error anywhere. A slot with NO finite samples yields NaN
  * (0/0), visibly undefined.
  *
  * The finish mean is `pround(sum / count / 10⁶, 6)` per element — one
  * exact integer division path, same contract as the repo's other float
  * outputs. */
object VectorAvg extends Aggregator[Seq[Float], (Array[Long], Array[Long]), Seq[Double]] {

  override def zero: (Array[Long], Array[Long]) =
    (Array.emptyLongArray, Array.emptyLongArray)

  private def quantize(x: Float): Long = math.floor(x.toDouble * 1e6 + 0.5).toLong

  override def reduce(b: (Array[Long], Array[Long]), a: Seq[Float]): (Array[Long], Array[Long]) = {
    if (a == null) return b
    val (sums, counts) = b
    val s = if (sums.length >= a.length) sums else java.util.Arrays.copyOf(sums, a.length)
    val c = if (counts.length >= a.length) counts else java.util.Arrays.copyOf(counts, a.length)
    var i = 0
    while (i < a.length) {
      val v = a(i)
      if (java.lang.Float.isFinite(v)) { s(i) += quantize(v); c(i) += 1L }
      i += 1
    }
    (s, c)
  }

  private def addPadded(short: Array[Long], long: Array[Long]): Array[Long] = {
    val out = java.util.Arrays.copyOf(long, long.length)
    var i = 0
    while (i < short.length) { out(i) += short(i); i += 1 }
    out
  }

  override def merge(b1: (Array[Long], Array[Long]), b2: (Array[Long], Array[Long])): (Array[Long], Array[Long]) = {
    val (a, b) = if (b1._1.length <= b2._1.length) (b1, b2) else (b2, b1)
    (addPadded(a._1, b._1), addPadded(a._2, b._2))
  }

  override def finish(r: (Array[Long], Array[Long])): Seq[Double] = {
    val (sums, counts) = r
    sums.indices.map { i =>
      val mean = sums(i).toDouble / counts(i).toDouble / 1e6
      math.floor(mean * 1e6 + 0.5) / 1e6
    }
  }

  override def bufferEncoder: Encoder[(Array[Long], Array[Long])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Array[Long])]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
