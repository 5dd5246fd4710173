package graft.ml

import org.apache.spark.ml.classification.LogisticRegressionModel
import org.apache.spark.sql.SparkSession

/** End-to-end pipeline driver reproducing the reference's 8-stage
  * standalone runner (`run_pipeline.py:24-121`, SURVEY.md §3.1):
  * config → generate+validate → features → split → grid-train → evaluate →
  * select champion → explain → promote. One Spark application; the
  * reference's per-task Airflow processes and XCom/file hand-offs collapse
  * into lazy lineage within this driver (SURVEY.md §3.2).
  */
object RunPipeline {

  final case class PipelineResult(champion: Option[Evaluation.ModelScore],
                                  scores: Seq[Evaluation.ModelScore],
                                  nTrain: Long, nTest: Long)

  def run(spark: SparkSession, config: PipelineConfig): PipelineResult = {
    // 1-2. ingest + validate (raises on gate failure, data_ingestion.py:161-163)
    val raw = DataGen.generate(spark, config.nSamples, config.randomState)
    DataGen.validate(raw)
    // 3. features (fit)
    val (feat, preprocessor) = FeaturePipeline.fit(raw, config.outlierClipSigma)
    // 4. stratified split
    val (train, test) = Split.stratified(feat.select("features", "label"),
      "label", config.testSize, config.randomState)
    val trainC = train.cache(); val testC = test.cache()
    val (nTrain, nTest) = (trainC.count(), testC.count())
    // 5. grid-search training per enabled model
    val trained = Training.trainAll(config, trainC)
    // 6. evaluate + select champion
    val scores = trained.map(t => Evaluation.evaluate(t.model, testC, t.name))
    val champion = Evaluation.selectChampion(scores,
      config.championF1Threshold, config.championAucThreshold)
    // 7. explain — E1 dispatch (`explainability.py:15-39`): exact linear
    // SHAP for linear champions, exact TreeSHAP for tree ensembles
    champion.foreach { c =>
      val model = trained.find(_.name == c.name).get.model
      val sample = testC.orderBy(org.apache.spark.sql.functions.rand(config.randomState))
        .limit(config.shapSampleSize)
      val shapLong = model match {
        case lr: LogisticRegressionModel =>
          Shap.linearShap(lr, testC, config.shapSampleSize, config.randomState)
        case m =>
          val nFeat = m match {
            case rf: org.apache.spark.ml.classification.RandomForestClassificationModel => rf.numFeatures
            case gbt: org.apache.spark.ml.classification.GBTClassificationModel => gbt.numFeatures
            case dt: org.apache.spark.ml.classification.DecisionTreeClassificationModel => dt.numFeatures
            case _ => 0
          }
          TreeShap.shapValues(m, sample, nFeat)
      }
      Shap.globalImportance(shapLong, config.maxDisplayFeatures).collect()
    }
    // 7b. S5 report sinks (`evaluation.py:178-204`, `explainability.py:134-156`)
    writeEvaluationReport(config, scores, champion)
    // 8. promote
    champion.foreach { c =>
      Deployment.promote(config.modelDir, trained.find(_.name == c.name).get.model,
        preprocessor, Deployment.ChampionMeta(c.name, c.f1, c.rocAuc,
          java.time.ZonedDateTime.now(java.time.ZoneOffset.UTC).toString))
    }
    trainC.unpersist(); testC.unpersist()
    PipelineResult(champion, scores, nTrain, nTest)
  }

  /** S5 — evaluation report JSON (`evaluation.py:178-204` shape: per-model
    * metrics + champion + thresholds). */
  private def writeEvaluationReport(config: PipelineConfig,
                                    scores: Seq[Evaluation.ModelScore],
                                    champion: Option[Evaluation.ModelScore]): Unit = {
    val dir = java.nio.file.Paths.get(config.modelDir)
    java.nio.file.Files.createDirectories(dir)
    val perModel = scores.map(s =>
      s"""    "${s.name}": {"accuracy": ${s.accuracy}, "precision": ${s.precision}, """ +
        s""""recall": ${s.recall}, "f1": ${s.f1}, "roc_auc": ${s.rocAuc}}""")
      .mkString(",\n")
    val json =
      s"""{
         |  "models": {
         |$perModel
         |  },
         |  "champion": ${champion.map(c => s""""${c.name}"""").getOrElse("null")},
         |  "thresholds": {"f1": ${config.championF1Threshold}, "roc_auc": ${config.championAucThreshold}}
         |}""".stripMargin
    java.nio.file.Files.writeString(dir.resolve("evaluation_report.json"), json)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val config = if (args.nonEmpty) PipelineConfig.load(args(0)) else PipelineConfig()
    val result = run(spark, config)
    val scoresJson = result.scores.map(s =>
      s"""{"name": "${s.name}", "f1": ${s.f1}, "roc_auc": ${s.rocAuc}, "accuracy": ${s.accuracy}}""")
      .mkString("[", ", ", "]")
    println(s"""{"champion": ${result.champion.map(c => s""""${c.name}"""").getOrElse("null")}, """ +
      s""""n_train": ${result.nTrain}, "n_test": ${result.nTest}, "scores": $scoresJson}""")
    spark.stop()
  }
}
