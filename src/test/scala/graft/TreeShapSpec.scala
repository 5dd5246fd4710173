package graft

import org.apache.spark.ml.classification.{DecisionTreeClassifier, GBTClassifier, RandomForestClassifier}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{DataGen, FeaturePipeline, TreeShap}

/** TreeSHAP correctness: the local-accuracy axiom Σφᵢ(x) + E[f] = f(x)
  * must hold row-by-row — the strongest possible check, no tolerance for
  * approximation (path-dependent TreeSHAP is exact). */
class TreeShapSpec extends AnyFunSuite {
  import SparkFixture.spark

  private lazy val data = {
    val (feat, _) = FeaturePipeline.fit(DataGen.generate(spark, 800, 42L))
    feat.select("features", "label").cache()
  }
  private lazy val nFeat =
    data.select("features").head.getAs[org.apache.spark.ml.linalg.Vector](0).size

  private def checkLocalAccuracy(model: Any, modelOutput: org.apache.spark.sql.DataFrame,
                                 tol: Double): Unit = {
    val sample = modelOutput.limit(50).withColumn("row_id", monotonically_increasing_id()).cache()
    val shap = TreeShap.shapValues(model, sample, nFeat)
      .groupBy("row_id").agg(sum("shap").as("phi_sum"))
    val base = TreeShap.expectedValue(model)
    val joined = sample.join(shap, "row_id")
      .select(col("f_x"), (col("phi_sum") + base).as("reconstructed"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < tol,
        s"local accuracy violated: f(x)=${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("local accuracy holds for a single decision tree (P1 output)") {
    val dt = new DecisionTreeClassifier().setMaxDepth(5).setSeed(1L).fit(data)
    val out = dt.transform(data)
      .select(col("features"), vector_to_array(col("probability")).getItem(1).as("f_x"))
    checkLocalAccuracy(dt, out, 1e-9)
  }

  test("local accuracy holds for a random forest (mean P1 output)") {
    val rf = new RandomForestClassifier().setNumTrees(15).setMaxDepth(5).setSeed(2L).fit(data)
    val out = rf.transform(data)
      .select(col("features"), vector_to_array(col("probability")).getItem(1).as("f_x"))
    checkLocalAccuracy(rf, out, 1e-9)
  }

  test("local accuracy holds for GBT (margin output)") {
    val gbt = new GBTClassifier().setMaxIter(10).setMaxDepth(3).setSeed(3L).fit(data)
    // margin = log-odds = logit of P1 /2? — recover from rawPrediction: raw = [-m, m]
    val out = gbt.transform(data)
      .select(col("features"), vector_to_array(col("rawPrediction")).getItem(1).as("f_x"))
    checkLocalAccuracy(gbt, out, 1e-9)
  }

  test("feature never used by the tree gets zero attribution") {
    val dt = new DecisionTreeClassifier().setMaxDepth(4).setSeed(4L).fit(data)
    val used = {
      def collect(n: org.apache.spark.ml.tree.Node): Set[Int] = n match {
        case in: org.apache.spark.ml.tree.InternalNode =>
          collect(in.leftChild) ++ collect(in.rightChild) + in.split.featureIndex
        case _ => Set.empty
      }
      collect(dt.rootNode)
    }
    val unused = (0 until nFeat).toSet -- used
    assert(unused.nonEmpty, "need at least one unused feature for this test")
    val shap = TreeShap.shapValues(dt, data.limit(30), nFeat)
    val nonzeroUnused = shap.filter(col("feature_idx").isin(unused.toSeq: _*))
      .filter(abs(col("shap")) > 1e-12).count()
    assert(nonzeroUnused == 0)
  }
}
