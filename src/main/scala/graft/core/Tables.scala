package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All engine queries read these via `spark.read.parquet` so that
  * Catalyst's parquet source handles column pruning + predicate pushdown
  * (visible as `PushedFilters`/`ReadSchema` in `.explain("formatted")`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with a proper TimestampType `ts`: the fixture stores
    * TIMESTAMP(NANOS) which Spark's parquet reader has no native type for;
    * sessions set `spark.sql.legacy.parquet.nanosAsLong=true` and this
    * loader converts nanos -> microsecond TimestampType. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division: ns values exceed double's 2^53 mantissa, a
        // floating divide here would corrupt microseconds
        raw.withColumn("ts", org.apache.spark.sql.functions
          .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }
}
