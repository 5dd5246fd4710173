package org.apache.spark.ml.tree

/** Accessor shim for `Node.impurityStats`, which is `private[ml]`.
  * TreeSHAP (graft.ml.TreeShap) needs each node's training cover (sample
  * count) and leaf class counts; MLlib stores them in the node's
  * ImpurityCalculator but does not expose them publicly. This is the only
  * place the library reaches into Spark internals. */
object NodeAccess {
  /** Training sample count ("cover") at a node. */
  def cover(n: Node): Double = n.impurityStats.count.toDouble

  /** Raw impurity stats (class counts for classification). */
  def stats(n: Node): Array[Double] = n.impurityStats.stats
}
