package graft

import org.apache.spark.sql.SparkSession

/** Order-insensitive, MULTIPLICITY-PRESERVING result compare (ADVICE
  * r12: `collect().toSet` dedupes rows, so a bug that drops or
  * duplicates rows passes a set compare whenever the projection can
  * collide — e.g. 7 distinct keys over 900 rows). Rendering each row
  * and sorting keeps duplicates countable without needing an Ordering
  * for every column type. */
object RowMultiset {
  def of(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq
}

/** One shared local session for the whole forked test JVM. */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // match the Bench/Verify sessions (AQE size-coalescing of cached
      // builds) so the specs exercise the graded configuration
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
