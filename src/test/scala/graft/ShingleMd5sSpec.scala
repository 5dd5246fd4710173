package graft

import org.scalatest.funsuite.AnyFunSuite

/** Native shingle_md5s: bit-equality with the composed builtin chain it
  * replaces (the DuckDB-oracle-mirrored form), interpreted ≡ codegen, and
  * analysis-time argument validation. */
class ShingleMd5sSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  private val tricky = Seq(
    "the quick brown fox jumps over the lazy dog again and again today",
    "a b c",            // exactly k for small k
    "short",            // fewer tokens than k
    "",                 // one empty token
    "a  b   c",         // consecutive spaces → empty tokens kept
    " leading and trailing ",
    "unicode snowman ☃ répété ☃ again here and more filler words now",
    "tab\tand\nnewline inside one token plus more words to pass k")

  test("bit-equal to the composed split/transform/slice/concat_ws/md5 chain") {
    for (k <- Seq(1, 3, 12)) {
      val df = tricky.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val native = df.selectExpr("id", s"shingle_md5s(text, $k) AS sh")
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val composed = df
        .selectExpr("id", "split(text, ' ', -1) AS t")
        .selectExpr("id",
          s"CASE WHEN size(t) >= $k THEN transform(sequence(0, size(t) - $k), " +
            s"i -> md5(cast(concat_ws(' ', slice(t, i + 1, $k)) as binary))) " +
            "ELSE array() END AS sh")
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(native == composed, s"k=$k")
    }
  }

  test("interpreted eval and codegen produce identical hashes") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val viaCodegen = tricky.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .selectExpr("id", "shingle_md5s(text, 3) AS sh")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    tricky.zipWithIndex.foreach { case (t, i) =>
      val e = graft.functions.ShingleMd5s(
        Literal(UTF8String.fromString(t),
          org.apache.spark.sql.types.StringType), 3)
      val interpreted = e.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .array.map(_.toString).toSeq
      assert(interpreted == viaCodegen(i.toLong), s"mismatch for '$t'")
    }
  }

  test("hashes match JDK MD5 of the window text; null text yields null") {
    val df = Seq((1L, "x y z w")).toDF("id", "text")
    val sh = df.selectExpr("shingle_md5s(text, 2) AS sh")
      .collect()(0).getSeq[String](0)
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(sh == Seq(hex("x y"), hex("y z"), hex("z w")))
    val n = Seq((1L, Option.empty[String])).toDF("id", "text")
      .selectExpr("shingle_md5s(text, 2) AS sh").collect()(0)
    assert(n.isNullAt(0))
  }

  test("wrong arity and non-foldable / fractional args raise analysis errors") {
    import org.apache.spark.sql.AnalysisException
    val df = Seq((1L, "a b c")).toDF("id", "text")
    intercept[AnalysisException] { df.selectExpr("shingle_md5s(text)").collect() }
    intercept[AnalysisException] { df.selectExpr("shingle_md5s(text, id)").collect() }
    intercept[AnalysisException] { df.selectExpr("shingle_md5s(text, 2.5)").collect() }
  }

  test("out-of-range k is an analysis error, not the case-class require's IllegalArgumentException") {
    import org.apache.spark.sql.AnalysisException
    val df = Seq((1L, "a b c")).toDF("id", "text")
    val e = intercept[AnalysisException] {
      df.selectExpr("shingle_md5s(text, 2000)").collect()
    }
    assert(e.getMessage.contains("[1, 1024]") && e.getMessage.contains("2000"))
    intercept[AnalysisException] { df.selectExpr("shingle_md5s(text, 0)").collect() }
    // same contract for winnow_fingerprints' k and w
    intercept[AnalysisException] { df.selectExpr("winnow_fingerprints(text, 65, 4)").collect() }
    intercept[AnalysisException] { df.selectExpr("winnow_fingerprints(text, 8, 0)").collect() }
  }
}
