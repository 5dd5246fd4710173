package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

/** As-of join: union+window implementation must match the naive
  * inequality-join + argmax formulation exactly, including tie semantics
  * (inclusive at equal time; max tie-break among equal times). */
class TemporalSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  test("asofJoin matches the inequality-join argmax reference") {
    val res = Temporal.asofLastOrder(spark, sfDir)
      .collect().map(_.toSeq)
    // naive reference: inequality join + row_number argmax — the formulation
    // that explodes at scale, used here only as the semantic oracle
    val e = Tables.eventsTs(spark, sfDir).select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.orders(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_id"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val ref = e.join(o, e("user_id") === o("o_custkey") && o("o_orderdate") <= e("ts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"),
        col("o_orderkey").as("last_orderkey"), col("o_totalprice").as("last_price"))
      .orderBy(col("event_id"))
      .collect().map(_.toSeq)
    assert(res.length == ref.length)
    assert(res.toSeq == ref.toSeq)
  }

  test("asofJoin tie semantics: update at probe time is visible; max tie-break wins") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (1L, 5L, 101L))
      .toDF("k", "t", "probe_id")
    val right = Seq(
      (1L, 10L, 7L, "at-probe-low"), (1L, 10L, 9L, "at-probe-high"),
      (1L, 4L, 3L, "early"), (1L, 11L, 99L, "late"))
      .toDF("k", "t2", "rk", "tag")
    val out = Temporal.asofJoin(left, right, "k", "t", "t2",
        Seq("rk", "tag"), "rk")
      .select(col("probe_id"), col("__asof.rk"), col("__asof.tag"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // probe at t=10 sees both t2=10 updates (inclusive) and picks rk=9;
    // probe at t=5 sees only the early update
    assert(out == Set((100L, 9L, "at-probe-high"), (101L, 3L, "early")))
  }

  test("asofJoin left rows with no prior update carry a null payload") {
    import spark.implicits._
    val left = Seq((1L, 1L, 500L)).toDF("k", "t", "probe_id")
    val right = Seq((1L, 2L, 1L, "future-only")).toDF("k", "t2", "rk", "tag")
    val out = Temporal.asofJoin(left, right, "k", "t", "t2", Seq("rk", "tag"), "rk")
    assert(out.filter(col("__asof").isNotNull).count() == 0)
    assert(out.count() == 1)
  }

  test("asofJoinBucketed is bit-identical to asofJoin on real data (month buckets)") {
    val e = Tables.eventsTs(spark, sfDir).select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("user_id"), col("o_orderdate"),
        col("o_orderkey"), col("o_totalprice"))
    def normalize(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("user_id"),
        col("__asof.o_orderkey").as("k"), col("__asof.o_totalprice").as("p"))
      .collect().map(_.toSeq).sortBy(_.toString)
    val plain = normalize(Temporal.asofJoin(e, o, "user_id", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"), "o_orderkey"))
    val bucketed = normalize(Temporal.asofJoinBucketed(e, o, "user_id", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"), "o_orderkey",
      t => date_trunc("month", t)))
    assert(plain.length == bucketed.length)
    assert(plain.toSeq == bucketed.toSeq)
  }

  test("asofJoinBucketed tie + boundary semantics match across bucket widths") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (1L, 5L, 101L), (1L, 4L, 102L), (2L, 8L, 103L))
      .toDF("k", "t", "probe_id")
    val right = Seq(
      (1L, 10L, 7L, "at-probe-low"), (1L, 10L, 9L, "at-probe-high"),
      (1L, 4L, 3L, "early"), (1L, 11L, 99L, "late"), (2L, 1L, 5L, "other-key"))
      .toDF("k", "t2", "rk", "tag")
    val expected = Temporal.asofJoin(left, right, "k", "t", "t2", Seq("rk", "tag"), "rk")
      .select(col("probe_id"), col("__asof.rk"), col("__asof.tag"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    Seq(1L, 3L, 4L, 100L).foreach { width =>
      val got = Temporal.asofJoinBucketed(left, right, "k", "t", "t2",
        Seq("rk", "tag"), "rk", t => floor(t / width.toDouble))
        .select(col("probe_id"), col("__asof.rk"), col("__asof.tag"))
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(got == expected, s"width=$width")
    }
  }

  test("asofJoin null keys never match (join semantics), left null-key rows pass through") {
    import spark.implicits._
    val left = Seq(
      (Option(1L), 10L, 100L),   // normal key — matches
      (Option.empty[Long], 10L, 200L)) // null key — must NOT pick up null-key updates
      .toDF("k", "t", "probe_id")
    val right = Seq(
      (Option(1L), 5L, 7L, "real"),
      (Option.empty[Long], 5L, 9L, "null-key-update"))
      .toDF("k", "t2", "rk", "tag")
    val out = Temporal.asofJoin(left, right, "k", "t", "t2", Seq("rk", "tag"), "rk")
      .select(col("probe_id"), col("__asof.tag").as("tag"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(out == Set((100L, Some("real")), (200L, None)))
  }

  test("asofJoin null right times never match: NULL <= t is not a match, " +
      "and must not ride the window as a phantom earliest update") {
    import spark.implicits._
    // key 1: ONLY a null-time update — probe must get NULL (the unfiltered
    // NULL __t sorted NULLS FIRST and attached as the 'earliest' update);
    // key 2: a null-time and a real update — the real one wins untouched
    val left = Seq((1L, 10L, 100L), (2L, 10L, 200L)).toDF("k", "t", "probe_id")
    val right = Seq(
      (1L, Option.empty[Long], 7L, "null-time"),
      (2L, Option.empty[Long], 8L, "null-time"),
      (2L, Option(5L), 9L, "real"))
      .toDF("k", "t2", "rk", "tag")
    def run(df: org.apache.spark.sql.DataFrame) = df
      .select(col("probe_id"), col("__asof.tag").as("tag"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    val expected = Set((100L, None), (200L, Option("real")))
    assert(run(Temporal.asofJoin(left, right, "k", "t", "t2",
      Seq("rk", "tag"), "rk")) == expected)
    assert(run(Temporal.asofJoinBucketed(left, right, "k", "t", "t2",
      Seq("rk", "tag"), "rk", c => floor(c / 4))) == expected)
  }
}
