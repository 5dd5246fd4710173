package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JsonlDocs

/** S1/S2 format breadth beyond parquet/CSV: JSONL ingest boundary with
  * corrupt-record quarantine, and ORC as an engine-native storage format
  * (round-trip + predicate pushdown). */
class SourcesSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private def docs = Tables.documents(spark, sfDir)

  test("JSONL: documents round-trip exactly through write + schema-on-read") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_docs").toString + "/docs"
    JsonlDocs.write(docs, dir)
    // cache before touching _corrupt_record: Spark disallows queries over
    // raw JSON that reference ONLY the corrupt column (the documented
    // workaround is to materialize first)
    val back = JsonlDocs.read(spark, dir).cache()
    try {
      assert(back.filter(col("_corrupt_record").isNotNull).count() == 0)
      val a = docs.orderBy("doc_id").collect().map(_.toSeq)
      val b = back.drop("_corrupt_record").select(docs.columns.map(col): _*)
        .orderBy("doc_id").collect().map(_.toSeq)
      assert(a.toSeq == b.toSeq)
    } finally back.unpersist()
  }

  test("JSONL: malformed lines quarantine in PERMISSIVE, raise in FAILFAST") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_bad")
    val f = dir.resolve("part-0.json")
    java.nio.file.Files.writeString(f,
      """{"doc_id": 1, "lang": "en", "source": "s", "n_chars": 5, "text": "hello"}
        |this line is not json at all
        |{"doc_id": 2, "lang": "de", "source": "s", "n_chars": 4, "text": "hallo"}
        |""".stripMargin)
    val read = JsonlDocs.read(spark, dir.toString)
      .select(col("doc_id"), col("_corrupt_record")).cache()
    try {
      assert(read.filter(col("_corrupt_record").isNotNull).count() == 1)
      assert(read.filter(col("_corrupt_record").isNull).count() == 2)
      val bad = read.filter(col("_corrupt_record").isNotNull).collect()(0)
      assert(bad.isNullAt(0)) // data columns null on the quarantined row
      intercept[org.apache.spark.SparkException] {
        JsonlDocs.read(spark, dir.toString, failFast = true).count()
      }
    } finally read.unpersist()
  }

  test("ORC: orders round-trip exactly and filters push into the ORC scan") {
    val ord = Tables.orders(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("orc_orders").toString + "/orders"
    ord.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == ord.schema)
    val a = ord.orderBy("o_orderkey").collect().map(_.toSeq)
    val b = back.select(ord.columns.map(col): _*).orderBy("o_orderkey").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    val plan = back.filter(col("o_totalprice") > 100000.0)
      .select("o_orderkey").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,100000.0)]"),
      plan.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
  }
}
