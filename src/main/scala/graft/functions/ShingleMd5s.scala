package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared shingle-hashing kernel, called by both the interpreted and the
  * generated code path of [[ShingleMd5s]].
  *
  * Semantics are bit-identical to the GUARDED composed form
  * `CASE WHEN size(t) >= k THEN transform(sequence(0, size(t)-k),
  * i -> md5(cast(concat_ws(' ', slice(t, i+1, k)) as binary)))
  * ELSE array() END` over `t = split(text, ' ', -1)` — the shape the
  * corpus operators declare and the DuckDB oracle mirrors. (The guard is
  * part of the contract: fewer than k tokens yields an EMPTY array, where
  * the unguarded `sequence(0, negative)` would produce a descending range
  * and hash nonsense windows.) The win over that form is zero per-window
  * allocation: because the tokenizer
  * splits on SINGLE spaces and the joiner re-joins with single spaces,
  * every k-token window is a CONTIGUOUS byte span of the original UTF-8
  * string (a space is one byte and never occurs inside a multi-byte
  * sequence). So the kernel just records token boundaries in one pass and
  * feeds `bytes[start(w) .. end(w+k-1))` straight into a thread-local MD5
  * — no token arrays, no slices, no joined strings. Allocation per window
  * is exactly the 32-byte hex output the operator needs anyway.
  */
object ShingleKernel {
  private final val Hex = "0123456789abcdef".getBytes
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def toHexUtf8(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def shingleMd5s(s: UTF8String, k: Int): Array[UTF8String] = {
    val bytes = s.getBytes
    // count tokens: split on 0x20 KEEPING empties (split(text,' ',-1) parity)
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) nTok += 1; i += 1 }
    val n = nTok - k + 1
    if (n <= 0) return new Array[UTF8String](0)
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = bytes.length
    val md = mdLocal.get()
    val out = new Array[UTF8String](n)
    var w = 0
    while (w < n) {
      md.reset()
      md.update(bytes, starts(w), ends(w + k - 1) - starts(w))
      out(w) = toHexUtf8(md.digest())
      w += 1
    }
    out
  }
}

/** Native shingle-hash expression: string → array<string> of the md5 hex
  * of every k-token window (windows with duplicates preserved — callers
  * `.distinct()` downstream exactly as with the composed form). Empty
  * array when the text has fewer than k tokens. See [[ShingleKernel]]. */
case class ShingleMd5s(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1 && k <= 1024, "shingle width in 1..1024")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_md5s expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_md5s"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleKernel
      .shingleMd5s(input.asInstanceOf[UTF8String], k).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleKernel.shingleMd5s($s, $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
