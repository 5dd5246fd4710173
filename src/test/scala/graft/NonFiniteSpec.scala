package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Pins the non-finite / NULL semantics the hostile-parity sweep fixed —
  * each of these was a SILENT corruption before (a NaN that came out as a
  * clean-looking 0, an excluded row landing in a real bin, a NULL clipped
  * to a bound), the worst failure class at 100 TB because nothing pages.
  * The catalog-level behavior is gated by CatalogRobustnessSpec and the
  * `tools/hostile_fixture.py` oracle replay; these unit pins keep the
  * individual helpers from regressing. */
class NonFiniteSpec extends AnyFunSuite {
  import SparkFixture.spark
  import spark.implicits._

  private val mixed = Seq(
    (1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0)).toDF("id", "v")
    .unionByName(Seq((5L, Double.NaN)).toDF("id", "v"))
    .unionByName(Seq((6L, Option.empty[Double])).toDF("id", "v"))

  test("pround propagates non-finite instead of flooring it to 0.0") {
    val r = mixed.select(col("id"), Features.pround(col("v"), 2).as("p"))
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) null else x.getDouble(1))).toMap
    assert(r(1L) == 10.0 && r(4L) == 40.0)
    assert(r(5L).asInstanceOf[Double].isNaN)
    assert(r(6L) == null)
    val inf = Seq(Tuple1(Double.PositiveInfinity)).toDF("v")
      .select(Features.pround(col("v"), 3)).collect()(0).getDouble(0)
    assert(inf.isInfinite)
  }

  test("qlong: finite values quantize, non-finite contribute NULL (sums skip them)") {
    val s = mixed.agg(sum(Features.qlong(col("v"), 100.0))).collect()(0).getLong(0)
    assert(s == 10000L) // (10+20+30+40)·100, NaN and NULL contributing nothing
  }

  test("PSI bins exclude NULL and NaN rows entirely (not bin 0, not the clamp bin)") {
    // least(NULL, 9) would silently return 9 without finiteBin's guard
    val df = mixed.select(col("v").as("o_totalprice"),
      lit("1997-01-01").cast("timestamp_ntz").as("o_orderdate"))
    val bins = Validation.psiDrift(df, binWidth = 15.0, nBins = 10)
      .select(col("bin"), (col("n_a") + col("n_b")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bins.values.sum == 4L) // only the four finite rows carry mass
    assert(!bins.contains(9L))
  }

  test("quantileFlagApprox: the approx threshold fits over finite values only") {
    import spark.implicits._
    // NaN sorts greatest — an unguarded approx_percentile returns NaN and
    // `v > NaN` is false everywhere: every flag 0, a silently blind monitor
    val df = ((1 to 99).map(_.toDouble) :+ Double.NaN).toDF("v")
    val out = Features.quantileFlagApprox(df, "v", 0.5)
    val flagged = out.filter(col("flag") === 1).count()
    assert(flagged > 0 && flagged < 99, s"flagged=$flagged")
    val thr = out.select(col("q_thresh")).collect()(0).getDouble(0)
    assert(java.lang.Double.isFinite(thr), s"threshold must be finite: $thr")
  }

  test("zScoreClip tolerates caller columns named m / sd (no capture, no clobber)") {
    import spark.implicits._
    // internal stat names must be collision-free: bare m/sd raised
    // AMBIGUOUS_REFERENCE (or silently dropped the caller's columns)
    val df = Seq((1.0, "jan", "x"), (2.0, "feb", "y"), (100.0, "mar", "z"))
      .toDF("v", "m", "sd")
    val out = Features.zScoreClip(df, "v")
    assert(out.columns.contains("m") && out.columns.contains("sd"))
    assert(out.count() == 3)
  }

  test("zScoreClip: NULL and NaN rows yield NULL clipped values, never a bound") {
    val out = Features.zScoreClip(mixed, "v").select(col("id"), col("v_clipped"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(5L) == null && out(6L) == null)
    assert(out(1L) == 10.0) // finite rows keep their (unclipped) value
  }

  test("scaler fits ignore non-finite; transforms propagate it per-row") {
    val z = Preprocess.standardScale(mixed, "v", "z").select(col("id"), col("z"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    // mean/std over {10,20,30,40}: mean 25, stddev_pop sqrt(125)
    assert(math.abs(z(1L).asInstanceOf[Double] - (10.0 - 25.0) / math.sqrt(125.0)) < 1e-12)
    assert(z(5L).asInstanceOf[Double].isNaN) // NaN row stays visibly poisoned
    assert(z(6L) == null)
  }

  test("cosine kernel: zero-norm and empty embeddings are NULL in codegen and interpreted paths") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 0.0f)), (3L, Seq.empty[Float]))
      .toDF("id", "e")
    val q = Seq(Tuple1(Seq(1.0f, 0.0f))).toDF("q")
    val joined = df.crossJoin(q)
    val native = joined.select(col("id"), expr("cosine_sim(e, q)").as("c")).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!native(1L) && native(2L) && native(3L))
    // the public entry point agrees (native when extensions are
    // registered; the composed zip_with fallback reaches NULL through
    // zip_with padding and Spark's x/0 → NULL division)
    val viaEntry = joined.select(col("id"), Similarity.cosineExpr("e", "q").as("c"))
    assert(viaEntry.filter(col("c").isNull).count() == 2)
  }

  test("vector kernels: a non-finite element is undefined — NULL similarity, " +
      "NULL LSH bits, excluded from centroid slots") {
    // cosine_sim: NaN arithmetic would rank the malformed vector #1 in
    // every descending top-k; ±Inf likewise. Undefined → NULL, both paths.
    val df = Seq(1L).toDF("id").selectExpr("id",
      "array(CAST('NaN' AS FLOAT), CAST(1.0 AS FLOAT)) AS bad_nan",
      "array(CAST('Infinity' AS FLOAT), CAST(1.0 AS FLOAT)) AS bad_inf",
      "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS good")
    val r = df.select(
      expr("cosine_sim(bad_nan, good)").as("cn"),
      expr("cosine_sim(bad_inf, good)").as("ci"),
      expr("cosine_sim(good, good)").as("cg")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && math.abs(r.getDouble(2) - 1.0) < 1e-12)
    // hyperplane_bits: a NaN dot product's `acc >= 0` is false, which
    // would deterministically co-bucket every malformed vector (recall
    // poison with no error); undefined → NULL instead
    import org.apache.spark.sql.GraftColumnBridge
    def bits(c: String) = GraftColumnBridge.column(
      graft.functions.HyperplaneBits(
        GraftColumnBridge.expression(col(c)), Seq(Seq(1.0, -1.0), Seq(0.5, 0.5))))
    val hb = df.select(bits("bad_nan").as("bn"), bits("bad_inf").as("bi"),
      bits("good").as("bg")).collect()(0)
    assert(hb.isNullAt(0) && hb.isNullAt(1) && !hb.isNullAt(2))
    // VectorAvg: raw quantization LAUNDERS poison — NaN → 0L counted as a
    // clean 0.0 sample, ±Inf → Long.MaxValue wrapping the integer sum —
    // so non-finite elements are excluded per-slot (the fitted-statistic
    // rule); finite slots of the same vector still count
    val vecs = Seq(0L, 8L, 16L).toDF("vec_id").selectExpr("vec_id",
        "CASE WHEN vec_id = 0 THEN array(CAST('NaN' AS FLOAT), CAST(4.0 AS FLOAT)) " +
          "WHEN vec_id = 8 THEN array(CAST('Infinity' AS FLOAT), CAST(8.0 AS FLOAT)) " +
          "ELSE array(CAST(3.0 AS FLOAT), CAST(6.0 AS FLOAT)) END AS embedding")
    val cents = Similarity.embeddingCentroids(vecs, nClusters = 8)
      .collect().map(rr => rr.getLong(2) -> rr.getDouble(3)).toMap
    assert(cents(0L) == 3.0, s"slot 0 must average the one finite sample: $cents")
    assert(cents(1L) == 6.0, s"slot 1 averages all three finite samples: $cents")
  }

  test("labeledOrders: a NULL price carries no prediction (NULL yhat); NaN predicts 1") {
    val orders = Seq(
      (1L, "F", 10.0), (2L, "O", 20.0), (3L, "F", 30.0), (4L, "O", 40.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
      .unionByName(Seq((5L, "F", Double.NaN)).toDF("o_orderkey", "o_orderstatus", "o_totalprice"))
      .unionByName(Seq((6L, "O", Option.empty[Double])).toDF("o_orderkey", "o_orderstatus", "o_totalprice"))
    val y = Metrics.labeledOrders(orders).select(col("o_orderkey"), col("yhat"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(y(6L) == null)
    assert(y(5L) == 1) // NaN sorts above any threshold
    assert(y(1L) == 0 && y(4L) == 1)
  }
}
