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
