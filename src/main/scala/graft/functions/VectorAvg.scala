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
  * The finish mean is `pround(sum / n / 10⁶, 6)` per element — one exact
  * integer division path, same contract as the repo's other float outputs.
  */
object VectorAvg extends Aggregator[Seq[Float], (Array[Long], Long), Seq[Double]] {

  override def zero: (Array[Long], Long) = (Array.emptyLongArray, 0L)

  private def quantize(x: Float): Long = math.floor(x.toDouble * 1e6 + 0.5).toLong

  override def reduce(b: (Array[Long], Long), a: Seq[Float]): (Array[Long], Long) = {
    if (a == null) return b
    val (sums, n) = b
    val s = if (sums.length >= a.length) sums else java.util.Arrays.copyOf(sums, a.length)
    var i = 0
    while (i < a.length) { s(i) += quantize(a(i)); i += 1 }
    (s, n + 1)
  }

  override def merge(b1: (Array[Long], Long), b2: (Array[Long], Long)): (Array[Long], Long) = {
    val (short, long) =
      if (b1._1.length <= b2._1.length) (b1._1, b2._1) else (b2._1, b1._1)
    val s = java.util.Arrays.copyOf(long, long.length)
    var i = 0
    while (i < short.length) { s(i) += short(i); i += 1 }
    (s, b1._2 + b2._2)
  }

  override def finish(r: (Array[Long], Long)): Seq[Double] = {
    val (sums, n) = r
    if (n == 0L) Seq.empty
    else sums.toSeq.map { s =>
      val mean = s.toDouble / n.toDouble / 1e6
      math.floor(mean * 1e6 + 0.5) / 1e6
    }
  }

  override def bufferEncoder: Encoder[(Array[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Long)]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
