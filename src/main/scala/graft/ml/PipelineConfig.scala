package graft.ml

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** Pipeline configuration mirroring the reference's YAML surface
  * (`config/pipeline_config.yaml:1-79`) with env-var overrides
  * (`config.py:29-54`). Defaults here ARE the reference defaults. */
final case class PipelineConfig(
  nSamples: Int = 10000,
  testSize: Double = 0.2,
  randomState: Int = 42,
  cvFolds: Int = 5,
  scoringMetric: String = "f1",
  scalerMethod: String = "standard",          // standard | minmax | robust
  outlierClipSigma: Double = 3.0,
  models: Map[String, ModelConfig] = Map(
    "logistic_regression" -> ModelConfig(enabled = true,
      grid = Map("C" -> Seq(0.01, 0.1, 1.0, 10.0))),
    "random_forest" -> ModelConfig(enabled = true,
      grid = Map("n_estimators" -> Seq(100.0, 200.0), "max_depth" -> Seq(5.0, 10.0, 20.0),
        "min_samples_split" -> Seq(2.0, 5.0), "min_samples_leaf" -> Seq(1.0, 2.0))),
    "xgboost" -> ModelConfig(enabled = true,
      grid = Map("n_estimators" -> Seq(100.0, 200.0), "max_depth" -> Seq(3.0, 5.0, 7.0),
        "learning_rate" -> Seq(0.01, 0.1), "subsample" -> Seq(0.8, 1.0)))),
  championF1Threshold: Double = 0.65,         // evaluation.py:139-150
  championAucThreshold: Double = 0.70,
  shapSampleSize: Int = 500,                  // pipeline_config.yaml:78
  maxDisplayFeatures: Int = 10,               // pipeline_config.yaml:79
  modelDir: String = "/tmp/graft_models",
  gridParallelism: Int = 4)                   // n_jobs analog: concurrent CV fits

final case class ModelConfig(enabled: Boolean, grid: Map[String, Seq[Double]])

object PipelineConfig {
  /** Shrunk config for tests, mirroring the reference's `conftest.py:8-67`
    * fixture (500 rows, folds collapsed, relaxed thresholds). */
  def forTests(tmpDir: String): PipelineConfig = PipelineConfig(
    nSamples = 2000, cvFolds = 2,
    models = Map(
      "logistic_regression" -> ModelConfig(enabled = true, grid = Map("C" -> Seq(1.0))),
      "random_forest" -> ModelConfig(enabled = true,
        grid = Map("n_estimators" -> Seq(20.0), "max_depth" -> Seq(5.0)))),
    championF1Threshold = 0.3, championAucThreshold = 0.3,
    shapSampleSize = 200, modelDir = tmpDir)

  /** Load the reference-format YAML (subset we use) with env overrides
    * (same keys as `config.py:33-53`). Missing file → defaults. */
  def load(path: String): PipelineConfig = {
    val base =
      if (!Files.exists(Paths.get(path))) PipelineConfig()
      else {
        val mapper = new ObjectMapper(new YAMLFactory())
        val root = mapper.readTree(Files.readString(Paths.get(path)))
        def i(p: String, d: Int) = Option(root.at(p)).filterNot(_.isMissingNode).map(_.asInt(d)).getOrElse(d)
        def dd(p: String, d: Double) = Option(root.at(p)).filterNot(_.isMissingNode).map(_.asDouble(d)).getOrElse(d)
        def ss(p: String, d: String) = Option(root.at(p)).filterNot(_.isMissingNode).map(_.asText(d)).getOrElse(d)
        PipelineConfig(
          nSamples = i("/data/n_samples", 10000),
          testSize = dd("/data/test_size", 0.2),
          randomState = i("/data/random_state", 42),
          cvFolds = i("/training/cv_folds", 5),
          // feature_engineering.py:35 — features.scaling_method, silent
          // standard fallback for unknown values (SCALER_MAP.get contract)
          scalerMethod = ss("/features/scaling_method", "standard"))
      }
    base.copy(
      nSamples = sys.env.get("PIPELINE_N_SAMPLES").map(_.toInt).getOrElse(base.nSamples),
      randomState = sys.env.get("PIPELINE_RANDOM_STATE").map(_.toInt).getOrElse(base.randomState),
      modelDir = sys.env.getOrElse("PIPELINE_MODEL_DIR", base.modelDir),
      gridParallelism = sys.env.get("PIPELINE_GRID_PARALLELISM").map(_.toInt)
        .getOrElse(base.gridParallelism))
  }
}
