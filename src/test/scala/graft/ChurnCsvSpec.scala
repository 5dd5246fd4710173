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
