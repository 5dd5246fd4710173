package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the harness-testdata schema contract the library is built against.
  *
  * The driver regenerates `/root/testdata` between rounds and physical
  * types have drifted before: `events.ts` silently went from parquet
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS) between rounds 10 and 11, and
  * every events-timestamp query died at plan time with a
  * DATATYPE_MISMATCH three calls deep in an operator — the worst place
  * to learn about a fixture change. This spec makes the next drift fail
  * HERE, with a message naming the table and column, so it reads as
  * "fixture changed" instead of "operator broke".
  *
  * `ts` deliberately admits every shape `Tables.normalizeTs` canonicalizes,
  * `o_orderdate`/`l_shipdate` every shape `Tables.normalizeDate` does,
  * and every numeric column the width/measure shapes
  * `Tables.normalizeNumeric` does (both integer widths everywhere; any
  * DecimalType or FloatType where double is canonical).
  * Every table is loaded through `Tables.loadTolerant` (which sets the
  * legacy `nanosAsLong` flag) rather than a plain scan: a plain scan of a
  * TIMESTAMP(NANOS) file doesn't load as some other type — it THROWS
  * (ILLEGAL_PARQUET_TYPE) during schema inference, which would turn this
  * spec's friendly drift message back into a raw Spark exception for
  * exactly the drift that motivated it. Under the flag, NANOS → LongType
  * (accepted) and MICROS → TimestampNTZType (accepted), deterministically
  * regardless of suite order.
  */
class FixtureContractSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  /** Measure columns: double canonical; a regeneration may ship FloatType
    * or any DECIMAL(p,s) — `Tables.normalizeNumeric` casts all back to
    * double. `accepts` below treats any DecimalType as in-contract
    * wherever DoubleType is listed (the precision/scale is the writer's
    * choice, so no fixed instance can be enumerated here). */
  private val measure: Seq[DataType] = Seq(DoubleType, FloatType)

  private def accepts(ok: Seq[DataType], have: DataType): Boolean =
    ok.contains(have) ||
      (ok.contains(DoubleType) && have.isInstanceOf[DecimalType])

  // column -> acceptable dtypes (all tables via the nanos-tolerant raw scan)
  private val expected: Map[String, Seq[(String, Seq[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Seq(LongType, IntegerType),
      "r_name" -> Seq(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Seq(LongType, IntegerType),
      "n_name" -> Seq(StringType),
      "n_regionkey" -> Seq(LongType, IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> Seq(LongType, IntegerType),
      "c_name" -> Seq(StringType),
      "c_nationkey" -> Seq(LongType, IntegerType),
      "c_acctbal" -> measure,
      "c_mktsegment" -> Seq(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Seq(LongType, IntegerType),
      "s_nationkey" -> Seq(LongType, IntegerType)),
    "part" -> Seq(
      "p_partkey" -> Seq(LongType, IntegerType),
      "p_brand" -> Seq(StringType)),
    "orders" -> Seq(
      "o_orderkey" -> Seq(LongType, IntegerType),
      "o_custkey" -> Seq(LongType, IntegerType),
      "o_orderstatus" -> Seq(StringType),
      "o_totalprice" -> measure,
      "o_orderdate" -> Seq(TimestampNTZType, TimestampType, DateType, LongType),
      "o_orderpriority" -> Seq(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Seq(LongType, IntegerType),
      "l_partkey" -> Seq(LongType, IntegerType),
      "l_suppkey" -> Seq(LongType, IntegerType),
      "l_linenumber" -> Seq(LongType, IntegerType),
      "l_quantity" -> measure,
      "l_extendedprice" -> measure,
      "l_discount" -> measure,
      "l_tax" -> measure,
      "l_returnflag" -> Seq(StringType),
      "l_linestatus" -> Seq(StringType),
      "l_shipdate" -> Seq(TimestampNTZType, TimestampType, DateType, LongType)),
    "events" -> Seq(
      "event_id" -> Seq(LongType, IntegerType),
      "ts" -> Seq(TimestampNTZType, TimestampType, LongType),
      "user_id" -> Seq(LongType, IntegerType),
      "event_type" -> Seq(StringType),
      "value" -> measure,
      "props" -> Seq(StringType)),
    "documents" -> Seq(
      "doc_id" -> Seq(LongType, IntegerType),
      "text" -> Seq(StringType),
      "lang" -> Seq(StringType),
      "source" -> Seq(StringType),
      "n_chars" -> Seq(LongType, IntegerType)),
    "embeddings" -> Seq(
      "vec_id" -> Seq(LongType, IntegerType),
      "embedding" -> Seq(ArrayType(FloatType), ArrayType(FloatType, false),
        ArrayType(DoubleType), ArrayType(DoubleType, false)),
      "label" -> Seq(IntegerType, LongType)))

  test("events fixture has zero exactly-30-minute user gaps at any SF " +
      "(the d52/d11 gap-rule agreement contract)") {
    // d52's oracle sessionizes with session_window's `>=` rule (two events
    // exactly 30 minutes apart do NOT merge — touching windows don't
    // overlap), while d11's lag rule uses `>` (they DO stay in one
    // session). The two declarations agree only because the fixture
    // contains no exact 30-minute consecutive gap for any user — a
    // property previously measured in prose only (SparkEntry's d52
    // comment). If THIS test fails after a testdata regen, the downstream
    // symptom would otherwise be a cryptic d52 row/hash mismatch in the
    // correctness gate: fix by re-deriving which rule the regenerated
    // fixture needs, or by excluding the exact-gap boundary in BOTH the
    // d52 oracle and this pin.
    import org.apache.spark.sql.functions._
    val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(n => s"/root/testdata/$n")
      .filter(d => new java.io.File(d).isDirectory)
    assert(sfDirs.nonEmpty, "no testdata SF directories found")
    sfDirs.foreach { d =>
      val ev = Tables.eventsTs(spark, d)
        .where(col("ts").isNotNull && col("user_id").isNotNull)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val exactGaps = ev
        .select((unix_micros(col("ts")) -
          lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"))
        .where(col("gap_us") === 1800000000L)
        .count()
      assert(exactGaps == 0L,
        s"$d/events.parquet now contains $exactGaps exact-30-min user " +
          "gaps — d52 (session_window, >= rule) and d11 (lag, > rule) " +
          "DIVERGE on such events; see the d52 declaration's gap-rule note")
    }
  }

  test("every fixture table matches the schema contract") {
    val drift = Tables.names.flatMap { t =>
      val schema =
        Tables.loadTolerant(spark, SparkFixture.sfDir, t).schema
      expected(t).flatMap { case (colName, ok) =>
        schema.fields.find(_.name == colName) match {
          case None =>
            Some(s"$t.$colName: MISSING from fixture (has ${schema.fieldNames.mkString(", ")})")
          case Some(f) if !accepts(ok, f.dataType) =>
            Some(s"$t.$colName: fixture now ${f.dataType}, contract allows ${ok.mkString("/")} " +
              "— the testdata was regenerated with a new physical type; extend the consuming " +
              "operator (see Tables.normalizeTs for the ts precedent), then widen this contract")
          case _ => None
        }
      }
    }
    assert(drift.isEmpty, "\n" + drift.mkString("\n"))
  }
}
