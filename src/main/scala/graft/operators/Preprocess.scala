package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational forms of the reference's sklearn preprocessing operators
  * (SURVEY.md §2.4 M1–M7). These are the DuckDB-checkable counterparts; the
  * MLlib `Pipeline` path for model training lives in [[graft.ml]].
  *
  * Scale notes: every scaler is a 1-row statistics aggregate broadcast back
  * over the table (map-side only, no fact-table shuffle). One-hot collects
  * the category vocabulary — bounded-domain by definition (it becomes the
  * encoding width), same as sklearn's fit step.
  */
object Preprocess {

  /** M1 — StandardScaler, sklearn semantics: ddof=0 population std
    * (`feature_engineering.py:15-19,36-40`; sklearn uses biased std, so
    * `stddev_pop`, NOT Spark/pandas default `stddev_samp`). */
  def standardScale(df: DataFrame, c: String, out: String): DataFrame = {
    // fit over observed finite values (Features.finiteOrNull); the
    // transform below still propagates a non-finite row's own value
    val stats = df.agg(avg(Features.finiteOrNull(col(c))).as("m"),
      stddev_pop(Features.finiteOrNull(col(c))).as("sd"))
    df.crossJoin(broadcast(stats))
      .withColumn(out, when(col("sd") === 0.0, lit(0.0))
        .otherwise((col(c) - col("m")) / col("sd")))
      .drop("m", "sd")
  }

  /** M2 — MinMaxScaler: (x − min)/(max − min). */
  def minMaxScale(df: DataFrame, c: String, out: String): DataFrame = {
    // finite fit domain: Spark's min/max sort NaN above every real value,
    // so one NaN row would otherwise pin mx = NaN and scale everything NaN
    val stats = df.agg(min(Features.finiteOrNull(col(c))).as("mn"),
      max(Features.finiteOrNull(col(c))).as("mx"))
    df.crossJoin(broadcast(stats))
      .withColumn(out, when(col("mx") === col("mn"), lit(0.0))
        .otherwise((col(c) - col("mn")) / (col("mx") - col("mn"))))
      .drop("mn", "mx")
  }

  /** M3 — RobustScaler: (x − median)/IQR, exact interpolated quantiles
    * (matches sklearn/NumPy linear interpolation and DuckDB
    * `quantile_cont`). The three quantiles come from ONE
    * [[Metrics.exactPercentiles]] pass (range-repartition order
    * statistics, bounded memory — the in-plan `percentile` aggregate this
    * replaces buffered every value in ONE aggregation buffer, a guaranteed
    * OOM at 100× scale) and enter the plan as literals; the finite fit
    * domain is identical (finiteOrNull, NULL-skipped) and the
    * interpolation is the same Percentile.getPercentile formula, so the
    * result is bit-identical. An all-NULL/non-finite column fits NULL
    * statistics — every scaled value NULL, the aggregate form's behavior.
    *
    * Zero IQR follows sklearn's `_handle_zeros_in_scale`: a zero scale is
    * replaced by 1.0, so the output is `x − median`, NOT constant 0 — with
    * a zero IQR the values need not all equal the median (e.g.
    * [0,5,5,5,5,10] has IQR 0 but spread), and sklearn centers them.
    * standardScale/minMaxScale keep their 0.0 branch because a zero std or
    * range DOES imply every finite value equals the center there.
    *
    * CONTRACT — eager fit at call time: the quantile jobs run when this
    * method is CALLED and the thresholds enter the returned plan as frozen
    * literals. Re-executing the returned DataFrame after the input data
    * changes reuses the call-time statistics (sklearn fit/transform
    * semantics); call again to refit. Building the plan costs cluster
    * jobs — keep it out of plan-construction-only paths. */
  def robustScale(df: DataFrame, c: String, out: String): DataFrame =
    Metrics.exactPercentiles(df, c, Seq(0.25, 0.5, 0.75)) match {
      case Some(qv) =>
        val (q1, med, q3) = (qv(0.25), qv(0.5), qv(0.75))
        val scale = if (q3 == q1) 1.0 else q3 - q1
        df.withColumn(out, (col(c) - med) / scale)
      case None =>
        df.withColumn(out, lit(null).cast("double"))
    }

  /** The fit-time category domain: distinct non-null values, sorted
    * (Java string order — the same order `.sorted` gives the encoder).
    * Extracted so the m4 verify-time oracle can regenerate its indicator
    * set from the SAME capped rule the encoder fits with — the domain is
    * fit-time metadata, like withCanon's type prelude. Cap enforced by
    * `limit(max + 1)` BEFORE the collect (see [[oneHotDropFirst]]). */
  def observedCategories(df: DataFrame, c: String,
                         maxCategories: Int = 1000): Seq[String] = {
    val cats = df.select(col(c)).filter(col(c).isNotNull).distinct()
      .limit(maxCategories + 1).collect()
      .map(_.getString(0)).sorted.toSeq
    require(cats.size <= maxCategories,
      s"oneHotDropFirst('$c'): over $maxCategories distinct categories — " +
        "not a bounded categorical domain (an id-like column would OOM the " +
        "driver and emit an absurd encoding width); pass a larger " +
        "maxCategories only if that width is intended")
    cats
  }

  /** M4 — OneHotEncoder, sklearn semantics (`feature_engineering.py:42-44`):
    * categories sorted lexicographically, `drop="first"`, unknown → all
    * zeros. Null is NOT a category (pandas `get_dummies` NaN semantics):
    * null rows get all-zero indicators. The vocabulary is collected at fit
    * time (bounded domain — it is the encoding width), mirroring sklearn's
    * `fit`.
    *
    * The collect is CAPPED: a mistakenly-encoded high-cardinality column
    * (user ids, free text) on a 100× corpus must become a named error,
    * not a driver OOM — and the cap is enforced by `limit(max + 1)` BEFORE
    * the collect ([[observedCategories]], the extracted fit rule), so even
    * producing the error never ships more than `max + 1` rows to the
    * driver. `maxCategories` is the intended encoding width bound; raise
    * it only deliberately. */
  def oneHotDropFirst(df: DataFrame, c: String, maxCategories: Int = 1000): DataFrame = {
    val cats = observedCategories(df, c, maxCategories)
    val kept = cats.drop(1)
    val indicators = kept.map(cat =>
      when(col(c) === lit(cat), 1).otherwise(0).as(s"${c}_$cat"))
    df.select(df.columns.map(col).toSeq ++ indicators: _*)
  }

  /** M5 — ColumnTransformer compose (`feature_engineering.py:46-53`):
    * scaled numerics ++ one-hot categoricals, remainder dropped. The
    * indicator columns of each encode step are tracked by column-set diff,
    * not name prefix — a prefix match would capture unrelated columns that
    * merely share the prefix (e.g. catCols "plan" and "plan_type").
    *
    * `scalerMethod` mirrors the reference's config dispatch
    * (`feature_engineering.py:15-36` SCALER_MAP): standard | minmax |
    * robust, anything else falls back to standard — `SCALER_MAP.get`'s
    * silent-default contract, kept as-is. */
  def columnTransform(df: DataFrame, key: String, numCols: Seq[String],
                      catCols: Seq[String],
                      scalerMethod: String = "standard"): DataFrame = {
    val scaleOne: (DataFrame, String) => DataFrame = scalerMethod match {
      case "minmax" => (d, c) => minMaxScale(d, c, s"${c}_z")
      case "robust" => (d, c) => robustScale(d, c, s"${c}_z")
      case _        => (d, c) => standardScale(d, c, s"${c}_z")
    }
    val scaled = numCols.foldLeft(df)(scaleOne)
    val (encoded, hotCols) =
      catCols.foldLeft((scaled, Seq.empty[String])) { case ((d, acc), c) =>
        val before = d.columns.toSet
        val e = oneHotDropFirst(d, c)
        (e, acc ++ e.columns.filterNot(before).sorted)
      }
    val outCols = Seq(col(key)) ++ numCols.map(c => col(s"${c}_z")) ++
      hotCols.map(col)
    encoded.select(outCols: _*)
  }

  /** M6 — deterministic split by key-modulus: `key % 5 == 0` is exactly 20%
    * of a dense key range, and because the modulus is label-independent the
    * per-stratum rates land at ~20% too (the declared query groups by
    * segment to show it). The reference uses seeded shuffling
    * (`train_test_split(random_state=42)`); cross-engine RNG equality is
    * impossible, so this is the oracle-able form. A seeded random variant
    * with TRUE per-label stratification is [[graft.ml.Split.stratified]]. */
  def stratifiedSplitByKey(df: DataFrame, key: String): DataFrame =
    df.withColumn("split",
      when(col(key) % 5 === 0, lit("test")).otherwise(lit("train")))

  /** M7 — fold assignment by key-modulus (declared-query analog of
    * `StratifiedKFold(n_splits=5)`; seeded variant in [[graft.ml.Split]]). */
  def foldAssignByKey(df: DataFrame, key: String, k: Int): DataFrame =
    df.withColumn("fold", (col(key) % k).cast("int"))
}
