package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared winnowing kernel (Schleimer, Wilkerson, Aiken — "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD 2003), called by
  * both the interpreted and the generated code path of
  * [[WinnowFingerprints]] (a standalone object gets a static forwarder, so
  * generated Java can invoke it directly).
  *
  * Pipeline per document: Rabin-Karp rolling hash over byte k-grams (O(n),
  * one multiply-add per byte) → XXH64 finalizer (the raw polynomial hash is
  * poorly distributed in its low bits, and winnowing selects minima, which
  * amplifies distribution bias) → per window of `w` consecutive k-gram
  * hashes keep the RIGHTMOST minimum (the paper's BASIC winnowing
  * tie-break; robust winnowing would instead re-select the previous pick
  * on ties — a different, equally valid scheme, so any compatible
  * fingerprinter must use rightmost-min to match this kernel) → distinct
  * selected hashes, sorted for deterministic output.
  *
  * Guarantee (paper §2): any substring match of length ≥ w + k − 1 shares
  * at least one fingerprint; no match shorter than k is detected.
  */
object WinnowKernel {
  private final val Base = 257L
  private final val Seed = 0x9747b28c9747b28cL

  def winnow(bytes: Array[Byte], k: Int, w: Int): Array[Long] = {
    val n = bytes.length - k + 1 // number of k-grams
    if (n <= 0) return Array.emptyLongArray
    // rolling polynomial hash in wrapping 64-bit arithmetic, then mix
    val grams = new Array[Long](n)
    var pow = 1L // Base^(k-1)
    var j = 1
    while (j < k) { pow *= Base; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    grams(0) = XXH64.hashLong(h, Seed)
    i = 1
    while (i < n) {
      h = (h - (bytes(i - 1) & 0xffL) * pow) * Base + (bytes(i + k - 1) & 0xffL)
      grams(i) = XXH64.hashLong(h, Seed)
      i += 1
    }
    // winnow: rightmost minimum per window via a monotonic deque — O(n)
    // total, not O(n·w) per-window rescans. Popping from the back on `>=`
    // keeps the LATER of equal values, reproducing the rightmost tie-break
    // of the naive scan exactly (property-tested against it).
    val nWin = math.max(n - w + 1, 1)
    val winLen = math.min(w, n)
    // primitive pick buffer (≤ one pick per window), sorted + deduped in
    // place at the end — a TreeSet here boxed every pick and allocated a
    // tree node per insert inside a per-ROW kernel on the corpus-scan hot
    // path, pure GC churn for the identical sorted-distinct output
    val picks = new Array[Long](nWin)
    var nPicks = 0
    val dq = new Array[Int](n) // index deque; values strictly increase head→tail
    var head = 0; var tail = 0
    var prevPos = -1
    var p = 0
    while (p < winLen) { // prime the first window
      while (tail > head && grams(dq(tail - 1)) >= grams(p)) tail -= 1
      dq(tail) = p; tail += 1
      p += 1
    }
    var s = 0
    while (s < nWin) {
      while (dq(head) < s) head += 1 // evict indices left of the window
      val minPos = dq(head)
      if (minPos != prevPos) { picks(nPicks) = grams(minPos); nPicks += 1; prevPos = minPos }
      val np = s + winLen // extend for the next window
      if (np < n) {
        while (tail > head && grams(dq(tail - 1)) >= grams(np)) tail -= 1
        dq(tail) = np; tail += 1
      }
      s += 1
    }
    java.util.Arrays.sort(picks, 0, nPicks)
    var outLen = 0
    i = 0
    while (i < nPicks) {
      if (outLen == 0 || picks(outLen - 1) != picks(i)) {
        picks(outLen) = picks(i); outLen += 1
      }
      i += 1
    }
    java.util.Arrays.copyOf(picks, outLen)
  }
}

/** Native winnowing-fingerprint expression: string → array<bigint> of the
  * document's winnowed k-gram fingerprints. See [[WinnowKernel]]. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && k <= 64, "k-gram length in 2..64")
  require(w >= 1 && w <= 64, "window size in 1..64")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowKernel.winnow(input.asInstanceOf[UTF8String].getBytes, k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WinnowKernel.winnow($s.getBytes(), $k, $w));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
