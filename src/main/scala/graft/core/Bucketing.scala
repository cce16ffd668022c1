package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle data ON WRITE so repeated joins
  * and aggregations on the bucket key run with NO exchange at read time.
  *
  * This is the storage-level answer to "minimize shuffles" at 100 TB:
  * a fact table bucketed by its join key is shuffled once when written;
  * every subsequent join against a co-bucketed table (same key, same
  * bucket count) is planned as a zero-exchange sort-merge join
  * (spec-asserted in BucketingSpec by scanning the physical plan for
  * Exchange nodes). Bucket counts must match on both sides; pick a
  * count sized so one bucket of the LARGER table fits an executor core
  * (e.g. 100 TB / 8192 buckets ≈ 12 GB per bucket pre-compression).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet). Idempotent:
    * drops the table and clears an orphaned location left by a previous
    * session (the in-memory catalog forgets tables across JVMs but the
    * warehouse directory survives). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new java.io.File(
      Option(warehouse.getPath).getOrElse(warehouse.toString), table)
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    df.write.format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)
  }

  /** Join two co-bucketed tables on their bucket key — planned without
    * a shuffle when bucket specs line up. */
  def coBucketedJoin(spark: SparkSession, leftTable: String,
                     rightTable: String, leftKey: String,
                     rightKey: String): DataFrame = {
    // build the condition from the SAME Dataset instances that are joined
    // — separate spark.table() calls can resolve to different attribute
    // ids if the relation cache is invalidated in between
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
