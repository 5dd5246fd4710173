package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** S1/S2 — CSV source/sink for the churn table with a fail-fast explicit
  * schema (the reference infers dtypes from `pd.read_csv`,
  * `data_ingestion.py:183`; we declare them — SURVEY.md §1.3's
  * "explicit StructType on read" decision). Parquet is the engine-native
  * format; CSV is the reference-compat boundary. */
object ChurnCsv {

  /** The 9-column raw churn schema (`data_ingestion.py:90-102`). Fields are
    * declared nullable because Spark's CSV reader always yields nullable
    * columns; the V1 null gate enforces non-nullness at the data level. */
  val schema: StructType = StructType(Seq(
    StructField("tenure", IntegerType, nullable = true),
    StructField("contract_type", StringType, nullable = true),
    StructField("payment_method", StringType, nullable = true),
    StructField("internet_service", StringType, nullable = true),
    StructField("monthly_charges", DoubleType, nullable = true),
    StructField("total_charges", DoubleType, nullable = true),
    StructField("num_support_tickets", IntegerType, nullable = true),
    StructField("avg_monthly_usage_gb", DoubleType, nullable = true),
    StructField("churn", IntegerType, nullable = true)))

  /** Fail-fast CSV read: schema declared, malformed rows raise
    * (mode=FAILFAST) rather than silently null out. enforceSchema=false
    * so the HEADER is validated against the declared field names —
    * Spark's default (true) discards the header row unread and maps
    * columns by POSITION, so a column-order drift upstream (two doubles
    * swapped) would type-check and silently train on swapped features;
    * pandas `read_csv` (the reference) maps by header name. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("enforceSchema", "false")
      .option("mode", "FAILFAST")
      .csv(path)

  /** Header CSV write, no index column (ref `data_ingestion.py:190`,
    * `to_csv(index=False)`). */
  def write(df: DataFrame, path: String): Unit =
    df.select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite").option("header", "true").csv(path)
}
