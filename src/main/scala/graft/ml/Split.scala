package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seeded stratified splitting (M6) and stratified K-fold assignment (M7),
  * the Spark forms of `train_test_split(stratify=y, random_state=42)`
  * (`run_pipeline.py:51-56`) and `StratifiedKFold(n_splits, shuffle=True)`
  * (`training.py:63`).
  *
  * Mechanism: rank rows within each label stratum by `rand(seed)` and cut
  * by fraction / modulus. The window partitions by label (2 strata) and the
  * per-stratum ordering is a shuffle-sort — at 100 TB prefer
  * `sampleBy` + anti-join for the split; fold assignment with exact
  * per-stratum balance fundamentally needs the rank (documented trade-off). */
object Split {

  /** Stratified train/test split: exact per-stratum test fraction.
    *
    * The ranked relation is materialized (localCheckpoint) BEFORE the two
    * complementary filters: `rand(seed)` is seeded per-partition by row
    * order, which is not stable across jobs after a shuffle, and train and
    * test each trigger their own job — unmaterialized, the two filters
    * would evaluate two INDEPENDENT rankings, letting a row land in both
    * splits (label leakage) or in neither. Pinning one ranking makes the
    * partition provably exact. */
  def stratified(df: DataFrame, labelCol: String, testSize: Double, seed: Long)
      : (DataFrame, DataFrame) = {
    val w = Window.partitionBy(col(labelCol)).orderBy(rand(seed))
    val cnt = Window.partitionBy(col(labelCol))
    val ranked = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cnt))
      .localCheckpoint(true)
    // CEIL cut, like sklearn: a floor cut (`rn <= n·testSize`) gives ZERO
    // test rows to any stratum with n < 1/testSize — the minority class
    // silently vanishes from the test set, single-class AUC collapses to
    // its guard value, and every model fails the champion gate with no
    // error naming the real cause
    val test = ranked.filter(col("__rn") <= ceil(col("__n") * testSize)).drop("__rn", "__n")
    val train = ranked.filter(col("__rn") > ceil(col("__n") * testSize)).drop("__rn", "__n")
    (train, test)
  }

  /** Stratified fold ids 0..k-1, balanced within each stratum.
    *
    * Materialized (localCheckpoint) for the same reason [[stratified]]
    * documents: `rand(seed)` is seeded by per-partition row order, which
    * is NOT stable across jobs. A caller's `.cache()` is no substitute —
    * evicted or executor-lost cached partitions silently RECOMPUTE with a
    * different row order, reassigning folds mid-grid-search (a row that
    * trained in fold 2 is then scored as fold 0 — CV leakage). Checkpoint
    * blocks fail loudly when lost instead of silently recomputing. */
  def foldAssign(df: DataFrame, labelCol: String, k: Int, seed: Long): DataFrame = {
    val w = Window.partitionBy(col(labelCol)).orderBy(rand(seed))
    df.withColumn("fold", (row_number().over(w) % k).cast("int"))
      .localCheckpoint(true)
  }
}
