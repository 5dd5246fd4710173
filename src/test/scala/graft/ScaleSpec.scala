package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scale

/** Scale utilities: salted joins preserve equi-join semantics; bucketed
  * joins execute without a shuffle; partitioned layouts prune. */
class ScaleSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  test("salted join returns exactly the plain join result") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("key"), col("o_totalprice"))
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("key"), col("c_mktsegment"))
    val plain = orders.join(cust, "key").count()
    val salted = Scale.saltedJoin(orders, cust, "key", salts = 8).count()
    assert(salted == plain)
  }

  test("bucketed join plan has no shuffle exchange") {
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_totalprice"))
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("o_custkey"), col("c_acctbal"))
    // dropManaged both before (a previous interrupted run's leftover
    // location would fail saveAsTable with LOCATION_ALREADY_EXISTS) and
    // in a finally (so THIS run failing cannot strand one either)
    Scale.dropManaged(spark, "b_orders"); Scale.dropManaged(spark, "b_cust")
    try {
      Scale.writeBucketed(orders, "b_orders", "o_custkey", 4)
      Scale.writeBucketed(cust, "b_cust", "o_custkey", 4)
      val joined = Scale.bucketedJoin(spark, "b_orders", "b_cust", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should be shuffle-free:\n$plan")
      assert(joined.count() > 0)
    } finally {
      Scale.dropManaged(spark, "b_orders"); Scale.dropManaged(spark, "b_cust")
    }
  }

  test("x29 declared bucketed query: custkey join shuffle-free, values match plain join") {
    // plan shape: assert the lazy aggregate over a live bucketed layout
    // (bucketedSegmentSpend itself returns a materialized bounded result
    // so its backing tables can be dropped before it returns)
    Scale.dropManaged(spark, "x29_plan_orders"); Scale.dropManaged(spark, "x29_plan_cust")
    try {
      Scale.writeBucketed(Tables.orders(spark, sfDir)
        .select(col("o_custkey").as("custkey"), col("o_totalprice")),
        "x29_plan_orders", "custkey", 8)
      Scale.writeBucketed(Tables.customer(spark, sfDir)
        .select(col("c_custkey").as("custkey"), col("c_mktsegment")),
        "x29_plan_cust", "custkey", 8)
      val lazyAgg = Scale.bucketedSegmentSpendPlan(spark, "x29_plan_orders", "x29_plan_cust")
      val plan = lazyAgg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(custkey"),
        s"bucketed join side must not shuffle on custkey:\n$plan")
    } finally {
      Scale.dropManaged(spark, "x29_plan_orders"); Scale.dropManaged(spark, "x29_plan_cust")
    }
    val res = Scale.bucketedSegmentSpend(spark, sfDir)
    val plain = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg((sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
          .cast("double") / 100.0).as("spend"), count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment")).collect().map(_.toSeq)
    assert(res.collect().map(_.toSeq).toSeq == plain.toSeq)
    // per-invocation tables are dropped by bucketedSegmentSpend itself —
    // no bucketed-layout leftovers in the catalog
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_bucketed_")))
  }

  test("x29 concurrent invocations on a shared session do not race") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val futures = (1 to 3).map(_ => Future(
      Scale.bucketedSegmentSpend(spark, sfDir).collect().map(_.toSeq).toSeq))
    val results = futures.map(Await.result(_, Duration.Inf))
    assert(results.toSet.size == 1, "concurrent x29 results must be identical")
    assert(results.head.nonEmpty)
  }

  test("skew rehearsal: AQE splits the planted hot partition, salting bounds per-partition fan-in, both match the plain join") {
    // a genuinely skewed key distribution (90% of the large side on ONE
    // key), not just an equality test: prove (a) AQE's skew-join split
    // actually engages at probe thresholds — the automatic path for
    // moderate skew — and (b) the explicit salted path bounds the hot
    // partition's fan-in for the pathological case AQE's thresholds miss.
    // Conf-isolated session: thresholds lowered to test-data scan sizes,
    // broadcast disabled so the join is sort-merge (skew split requires it)
    val ns = spark.newSession()
    ns.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ns.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    ns.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    ns.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8k")
    ns.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
    ns.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // enough shuffle partitions that (hot, salt) pairs don't re-collide
    // into the same few buckets (the cluster shape, not the 4-bucket one)
    ns.conf.set("spark.sql.shuffle.partitions", "32")
    import org.apache.spark.sql.functions.{concat_ws, spark_partition_id}
    val hotKey = 7L
    // 100k rows, 90% on hotKey, with a payload wide enough that the hot
    // partition crosses the lowered byte threshold
    val large = ns.range(0, 100000)
      .select(when(col("id") % 10 < 9, lit(hotKey)).otherwise(col("id")).as("key"),
        concat_ws("-", lit("payload"), col("id"), lit("x" * 32)).as("payload"))
    val small = ns.range(0, 1000).select(col("id").as("key"),
      concat_ws("_", lit("dim"), col("id")).as("dim"))
    def partMax(df: org.apache.spark.sql.DataFrame): Long =
      df.select(spark_partition_id().as("p")).groupBy("p").count()
        .agg(max("count")).collect()(0).getLong(0)
    // AQE on (default): the skew split must engage — the executed plan's
    // final adaptive form marks the sort-merge join skew=true
    val aqe = large.join(small, "key")
    // execute THIS queryExecution (count() would plan a clone and leave
    // this one isFinalPlan=false) so the adaptive final plan materializes
    val nAqe = aqe.collect().length.toLong
    val aqePlan = aqe.queryExecution.executedPlan.toString
    assert(aqePlan.contains("skew=true"),
      s"AQE skew-join split did not engage:\n$aqePlan")
    // AQE off: the hot key lands in ONE shuffle partition (the 1000-task
    // straggler shape at cluster scale)
    ns.conf.set("spark.sql.adaptive.enabled", "false")
    val plain = large.join(small, "key")
    val nPlain = plain.count()
    val plainMax = partMax(plain)
    assert(plainMax >= 90000L, s"fixture not skewed as planted: $plainMax")
    // salted path under the same AQE-off regime: the hot key spreads over
    // `salts` partitions — max fan-in drops by ~the salt factor
    val salted = Scale.saltedJoin(large, small, "key", salts = 16)
    val nSalted = salted.count()
    val saltedMax = partMax(salted)
    assert(nSalted == nPlain && nAqe == nPlain, s"$nSalted/$nAqe vs $nPlain")
    assert(saltedMax * 3 < plainMax,
      s"salting must bound the hot partition: salted=$saltedMax plain=$plainMax")
    ns.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("partitioned write prunes at scan time") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    Scale.writePartitioned(
      Tables.orders(spark, sfDir).withColumn("status", col("o_orderstatus")),
      tmp, Seq("status"))
    val pruned = spark.read.parquet(tmp).filter(col("status") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(status"),
      s"expected partition filter in:\n$plan")
    assert(pruned.count() > 0)
  }

  test("compaction: fragmented directory rewritten to sized files, content identical") {
    val ord = Tables.orders(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    val fragDir = s"$base/frag"; val outDir = s"$base/out"
    ord.repartition(40).write.parquet(fragDir)
    val fragFiles = new java.io.File(fragDir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(fragFiles == 40)
    val fragBytes = new java.io.File(fragDir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")).map(_.length).sum
    val target = math.max(fragBytes / 4, 1L) // expect ~4 output files
    val outFiles = graft.operators.Scale.compact(spark, fragDir, outDir, target)
    assert(outFiles < 40 && outFiles >= 4, s"outFiles=$outFiles")
    val a = ord.orderBy("o_orderkey").collect().map(_.toSeq)
    val b = spark.read.parquet(outDir).orderBy("o_orderkey").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
