package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.DataGen
import graft.sources.ChurnCsv

class ChurnCsvSpec extends AnyFunSuite {
  import SparkFixture.spark

  test("CSV round-trip preserves schema and values") {
    val tmp = Files.createTempDirectory("graft_csv").toString + "/churn"
    val df = DataGen.generate(spark, 500, 42L)
    ChurnCsv.write(df, tmp)
    val back = ChurnCsv.read(spark, tmp)
    assert(back.schema == ChurnCsv.schema)
    assert(back.count() == 500)
    val a = df.agg(sum("tenure"), round(sum("monthly_charges"), 2), sum("churn")).collect()(0)
    val b = back.agg(sum("tenure"), round(sum("monthly_charges"), 2), sum("churn")).collect()(0)
    assert(a.toSeq == b.toSeq)
  }

  test("CSV read fails loudly on column-order drift, not silently by position") {
    // Spark's default enforceSchema=true DISCARDS the header and maps
    // columns positionally — two swapped double columns type-check and
    // silently train on swapped features; the header must be validated
    // against the declared field names (pandas read_csv maps by name)
    val tmp = Files.createTempDirectory("graft_csv_drift").toString + "/churn"
    val df = DataGen.generate(spark, 50, 42L)
    // write with monthly_charges and total_charges swapped in file order
    val swapped = ChurnCsv.schema.fieldNames.map {
      case "monthly_charges" => "total_charges"
      case "total_charges" => "monthly_charges"
      case other => other
    }
    df.select(swapped.map(col): _*)
      .write.mode("overwrite").option("header", "true").csv(tmp)
    val e = intercept[Exception] { ChurnCsv.read(spark, tmp).collect() }
    // the header-mismatch error arrives wrapped in FAILED_READ_FILE —
    // search the cause chain for the actual schema/header complaint
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(10).flatMap(t => Option(t.getMessage)).mkString(" | ").toLowerCase
    assert(msgs.contains("header") || msgs.contains("schema"), msgs)
  }

  test("evaluation report is written by the pipeline") {
    // the shared MlPipelineSpec run writes into its own tmp dir; do a tiny
    // independent run here to keep the assertion local
    val dir = Files.createTempDirectory("graft_rep").toString
    val cfg = ml.PipelineConfig.forTests(dir).copy(
      models = Map("logistic_regression" ->
        ml.ModelConfig(enabled = true, grid = Map("C" -> Seq(1.0)))),
      nSamples = 800)
    ml.RunPipeline.run(spark, cfg)
    val report = java.nio.file.Paths.get(dir, "evaluation_report.json")
    assert(Files.exists(report))
    val text = Files.readString(report)
    assert(text.contains("logistic_regression") && text.contains("roc_auc"))
  }
}
