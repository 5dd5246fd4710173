package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole forked test JVM. */
object SparkFixture {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      // local[4, 2]: 4 threads, maxFailures = 2 — a failed task is retried
      // once before the job aborts, like a real cluster (default local
      // mode makes the first failure fatal). TaskReplaySpec plants a
      // first-attempt failure to prove operators survive task re-execution;
      // tests that assert job failure still see it (the task just fails
      // twice first). Consequence for every suite sharing this fixture: a
      // genuinely-failing task EXECUTES ITS WORK TWICE, so failure-path
      // tests must not assert exactly-once side effects — reset any
      // attempt-sensitive state per test, as TaskReplaySpec does with its
      // before-counter snapshot.
      .master("local[4, 2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft_test_ckpt").toString)
    GraftExtensions.register(s)
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}
