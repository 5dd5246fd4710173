package graft.ml

import org.apache.spark.ml.classification.{DecisionTreeClassificationModel, GBTClassificationModel, RandomForestClassificationModel}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.tree.{CategoricalSplit, ContinuousSplit, InternalNode, LeafNode, Node, NodeAccess}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Path-dependent TreeSHAP (shap's `feature_perturbation=
  * "tree_path_dependent"` — NOT the interventional variant, which needs a
  * background dataset and yields different values on correlated features)
  * for MLlib tree ensembles — the
  * §7.4.1 hard item. Implements the polynomial-time path-weight algorithm
  * from Lundberg et al., "Consistent Individualized Feature Attribution for
  * Tree Ensembles" (public paper), over trees flattened from
  * `DecisionTreeClassificationModel.rootNode`.
  *
  * Semantics per model family:
  *  - RandomForest: per-tree leaf value = P(class 1) from the leaf's
  *    impurity stats; ensemble SHAP = mean over trees (MLlib averages
  *    normalized leaf distributions), so Σφ + E[P1] = P1(x) exactly.
  *  - GBT: leaf value = margin contribution · tree weight; Σφ + E[margin]
  *    = margin(x) (probability via sigmoid is monotone in the margin).
  *
  * Distribution: flattened trees are a broadcast value; attribution is a
  * `mapPartitions` pass over feature vectors — no shuffle, O(rows ·
  * depth²·leaves) work, embarrassingly parallel. The exactness axiom
  * (local accuracy) is asserted in ScalaTest row-by-row.
  */
object TreeShap {

  /** Flattened tree: node arrays indexed by DFS id. `leftCats(i)` is null
    * for continuous splits (route left iff x ≤ threshold) and the
    * left-routed category set for categorical splits (one-hot/indexed
    * features carry nominal metadata, so MLlib emits CategoricalSplit). */
  final case class FlatTree(childLeft: Array[Int], childRight: Array[Int],
                            feature: Array[Int], threshold: Array[Double],
                            leftCats: Array[Array[Double]],
                            value: Array[Double], cover: Array[Double]) extends Serializable {
    def goesLeft(node: Int, x: Array[Double]): Boolean = {
      val cats = leftCats(node)
      if (cats == null) x(feature(node)) <= threshold(node)
      else {
        val v = x(feature(node))
        var i = 0
        while (i < cats.length) { if (cats(i) == v) return true; i += 1 }
        false
      }
    }
    def expectedValue: Double = {
      // cover-weighted mean of leaf values
      var s = 0.0
      var i = 0
      while (i < value.length) {
        if (childLeft(i) < 0) s += value(i) / cover(0) * cover(i)
        i += 1
      }
      s
    }
  }

  /** Flatten an MLlib tree; `leafValue` maps a leaf node to its scalar
    * output (probability or weighted margin). */
  def flatten(root: Node, leafValue: LeafNode => Double): FlatTree = {
    val nodes = scala.collection.mutable.ArrayBuffer[Node]()
    def index(n: Node): Int = { nodes += n; nodes.size - 1 }
    val cl = scala.collection.mutable.ArrayBuffer[Int]()
    val cr = scala.collection.mutable.ArrayBuffer[Int]()
    val ft = scala.collection.mutable.ArrayBuffer[Int]()
    val th = scala.collection.mutable.ArrayBuffer[Double]()
    val lc = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val vl = scala.collection.mutable.ArrayBuffer[Double]()
    val cv = scala.collection.mutable.ArrayBuffer[Double]()
    def visit(n: Node): Int = {
      val id = index(n)
      cl += -1; cr += -1; ft += -1; th += 0.0; lc += null; vl += 0.0
      cv += NodeAccess.cover(n)
      n match {
        case in: InternalNode =>
          in.split match {
            case c: ContinuousSplit =>
              ft(id) = c.featureIndex; th(id) = c.threshold
            case c: CategoricalSplit =>
              ft(id) = c.featureIndex; lc(id) = c.leftCategories
          }
          cl(id) = visit(in.leftChild); cr(id) = visit(in.rightChild)
        case lf: LeafNode =>
          vl(id) = leafValue(lf)
      }
      id
    }
    visit(root)
    FlatTree(cl.toArray, cr.toArray, ft.toArray, th.toArray, lc.toArray,
      vl.toArray, cv.toArray)
  }

  /** Leaf P(class 1) from impurity stats (class counts). */
  private def leafP1(lf: LeafNode): Double = {
    val stats = NodeAccess.stats(lf)
    val total = stats.sum
    if (total == 0.0 || stats.length < 2) 0.0 else stats(1) / total
  }

  /** Flatten a fitted ensemble into per-tree FlatTrees. */
  def flattenModel(model: Any): Seq[FlatTree] = model match {
    case dt: DecisionTreeClassificationModel =>
      Seq(flatten(dt.rootNode, leafP1))
    case rf: RandomForestClassificationModel =>
      val n = rf.trees.length.toDouble
      rf.trees.toSeq.map(t => flatten(t.rootNode, lf => leafP1(lf) / n))
    case gbt: GBTClassificationModel =>
      gbt.trees.toSeq.zip(gbt.treeWeights.toSeq).map { case (t, w) =>
        flatten(t.rootNode, lf => lf.prediction * w)
      }
    case other => throw new IllegalArgumentException(s"not a tree model: ${other.getClass}")
  }

  // ---- the path-weight algorithm (Lundberg et al., Algorithm 2) ----

  private final class PathState(capacity: Int) {
    val featureIndexes = new Array[Int](capacity)
    val zeroFractions = new Array[Double](capacity)
    val oneFractions = new Array[Double](capacity)
    val pweights = new Array[Double](capacity)
    var length = 0
    def copyFrom(o: PathState): Unit = {
      System.arraycopy(o.featureIndexes, 0, featureIndexes, 0, o.length)
      System.arraycopy(o.zeroFractions, 0, zeroFractions, 0, o.length)
      System.arraycopy(o.oneFractions, 0, oneFractions, 0, o.length)
      System.arraycopy(o.pweights, 0, pweights, 0, o.length)
      length = o.length
    }
  }

  private def extend(p: PathState, pz: Double, po: Double, pi: Int): Unit = {
    val l = p.length
    p.featureIndexes(l) = pi; p.zeroFractions(l) = pz; p.oneFractions(l) = po
    p.pweights(l) = if (l == 0) 1.0 else 0.0
    var i = l - 1
    while (i >= 0) {
      p.pweights(i + 1) += po * p.pweights(i) * (i + 1).toDouble / (l + 1).toDouble
      p.pweights(i) = pz * p.pweights(i) * (l - i).toDouble / (l + 1).toDouble
      i -= 1
    }
    p.length = l + 1
  }

  private def unwind(p: PathState, i: Int): Unit = {
    val l = p.length - 1
    val po = p.oneFractions(i); val pz = p.zeroFractions(i)
    var n = p.pweights(l)
    var j = l - 1
    while (j >= 0) {
      if (po != 0.0) {
        val t = p.pweights(j)
        p.pweights(j) = n * (l + 1).toDouble / ((j + 1).toDouble * po)
        n = t - p.pweights(j) * pz * (l - j).toDouble / (l + 1).toDouble
      } else {
        p.pweights(j) = p.pweights(j) * (l + 1).toDouble / (pz * (l - j).toDouble)
      }
      j -= 1
    }
    var k = i
    while (k < l) {
      p.featureIndexes(k) = p.featureIndexes(k + 1)
      p.zeroFractions(k) = p.zeroFractions(k + 1)
      p.oneFractions(k) = p.oneFractions(k + 1)
      k += 1
    }
    p.length = l
  }

  private def unwoundSum(p: PathState, i: Int): Double = {
    val l = p.length - 1
    val po = p.oneFractions(i); val pz = p.zeroFractions(i)
    var total = 0.0
    var n = p.pweights(l)
    var j = l - 1
    while (j >= 0) {
      if (po != 0.0) {
        val t = n * (l + 1).toDouble / ((j + 1).toDouble * po)
        total += t
        n = p.pweights(j) - t * pz * (l - j).toDouble / (l + 1).toDouble
      } else {
        total += p.pweights(j) / (pz * (l - j).toDouble / (l + 1).toDouble)
      }
      j -= 1
    }
    total
  }

  /** Reusable per-traversal arena: one PathState per recursion level,
    * allocated once per PARTITION and reused across every (row, tree) —
    * a per-node `new PathState` allocated ~2 KB × nodes × trees of pure
    * GC churn per row in the mapPartitions hot loop. Level-indexed reuse
    * is safe: recursion level l only ever writes states(l), and a
    * parent's state must survive exactly until its second (cold) child
    * call returns, which the level indexing guarantees. Slot 0 is the
    * empty root parent; levels ≤ 65 for depth-64 trees, capacity 66. */
  private final class PathArena(levels: Int = 66) {
    val states: Array[PathState] = Array.fill(levels)(new PathState(levels))
  }

  /** SHAP values of one instance under one tree; adds into phi. */
  def treeShap(tree: FlatTree, x: Array[Double], phi: Array[Double]): Unit =
    treeShap(tree, x, phi, new PathArena())

  private def treeShap(tree: FlatTree, x: Array[Double], phi: Array[Double],
                       arena: PathArena): Unit = {
    def recurse(j: Int, parent: PathState, level: Int,
                pz: Double, po: Double, pi: Int): Unit = {
      val p = arena.states(level)
      p.copyFrom(parent)
      extend(p, pz, po, pi)
      if (tree.childLeft(j) < 0) {
        var i = 1
        while (i < p.length) {
          val w = unwoundSum(p, i)
          phi(p.featureIndexes(i)) += w * (p.oneFractions(i) - p.zeroFractions(i)) * tree.value(j)
          i += 1
        }
      } else {
        val f = tree.feature(j)
        val (hot, cold) =
          if (tree.goesLeft(j, x)) (tree.childLeft(j), tree.childRight(j))
          else (tree.childRight(j), tree.childLeft(j))
        var iz = 1.0; var io = 1.0
        var k = 1
        var found = -1
        while (k < p.length && found < 0) {
          if (p.featureIndexes(k) == f) found = k
          k += 1
        }
        if (found >= 0) {
          iz = p.zeroFractions(found); io = p.oneFractions(found)
          unwind(p, found)
        }
        recurse(hot, p, level + 1, iz * tree.cover(hot) / tree.cover(j), io, f)
        recurse(cold, p, level + 1, iz * tree.cover(cold) / tree.cover(j), 0.0, f)
      }
    }
    val root = arena.states(0)
    root.length = 0
    recurse(0, root, 1, 1.0, 1.0, -1)
  }

  /** Ensemble SHAP for every row of a `features` DataFrame: long-form
    * (row_id, feature_idx, shap). Trees are broadcast; rows processed
    * partition-wise with zero shuffle. */
  def shapValues(model: Any, df: DataFrame, nFeat: Int): DataFrame = {
    val spark = df.sparkSession
    val trees = flattenModel(model)
    val bc = spark.sparkContext.broadcast(trees)
    val outSchema = StructType(Seq(
      StructField("row_id", LongType), StructField("feature_idx", IntegerType),
      StructField("shap", DoubleType)))
    val withId = if (df.columns.contains("row_id")) df
      else df.withColumn("row_id", monotonically_increasing_id())
    val rows = withId.select(vector_to_array(col("features")).as("x"), col("row_id"))
      .rdd.mapPartitions { it =>
        val ts = bc.value
        val arena = new PathArena() // reused by every (row, tree) in the partition
        it.flatMap { r =>
          val x = r.getSeq[Double](0).toArray
          val phi = new Array[Double](nFeat)
          ts.foreach(t => treeShap(t, x, phi, arena))
          val id = r.getLong(1)
          (0 until nFeat).iterator.map(i => Row(id, i, phi(i)))
        }
      }
    spark.createDataFrame(rows, outSchema)
  }

  /** E[f(x)] of the ensemble (sum of per-tree cover-weighted leaf means). */
  def expectedValue(model: Any): Double = flattenModel(model).map(_.expectedValue).sum
}
