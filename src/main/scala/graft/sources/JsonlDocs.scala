package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** S1/S2 breadth — JSON-lines source/sink for the documents table: the
  * interchange format a text-corpus pipeline ingests from upstream
  * crawlers. Same schema-on-read contract as [[ChurnCsv]] (declared
  * `StructType`, never inference — inference at 100 TB means one extra
  * full scan and a schema that drifts with the sample), plus the
  * corrupt-record channel a crawler feed needs: in PERMISSIVE mode
  * malformed lines land in `_corrupt_record` with all data columns null
  * (quarantine-and-continue); in FAILFAST mode they raise.
  *
  * Scale: JSON lines split by newline, so reads parallelize per HDFS
  * block exactly like CSV; the parsed relation is columnar from the first
  * projection on. ORC/parquet remain the engine-native storage — JSONL is
  * the ingest boundary only. */
object JsonlDocs {

  /** The documents schema + the corrupt-record capture column. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("_corrupt_record", StringType, nullable = true)))

  /** PERMISSIVE read with corrupt-record quarantine (default) or FAILFAST.
    * Callers split the result on `_corrupt_record IS NULL` into the clean
    * relation and the quarantine relation.
    *
    * Caveat (Spark restriction): a query that references ONLY the
    * corrupt-record column of a raw JSON scan raises AnalysisException —
    * `.cache()` the returned relation (or select a data column alongside)
    * before filtering on `_corrupt_record` alone, as SourcesSpec does. */
  def read(spark: SparkSession, path: String, failFast: Boolean = false): DataFrame =
    spark.read.schema(schema)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** JSON-lines write of the documents columns. */
  def write(df: DataFrame, path: String): Unit =
    df.select(Seq("doc_id", "lang", "source", "n_chars", "text")
        .map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite").json(path)
}
