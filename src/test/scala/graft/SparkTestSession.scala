package graft

import org.apache.spark.sql.SparkSession

/** Order-insensitive, MULTIPLICITY-PRESERVING result compare (ADVICE
  * r12: `collect().toSet` dedupes rows, so a bug that drops or
  * duplicates rows passes a set compare whenever the projection can
  * collide — e.g. 7 distinct keys over 900 rows). Rendering each row
  * and sorting keeps duplicates countable without needing an Ordering
  * for every column type.
  *
  * Row.toString is TYPE-BLIND (null vs "null", 1 vs 1L render alike —
  * ADVICE r13), so `of` prefixes the rendered rows with a name:type
  * header line: two results that agree value-wise but drifted in
  * column type now compare unequal at EVERY call site, not only the
  * ones that also asserted `df.schema` separately. Nullability is
  * deliberately excluded — the distributed rewrites may widen a
  * nullable flag (join-backs) without changing any value. */
object RowMultiset {
  def of(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.schema.map(f => s"${f.name}:${f.dataType.sql}").mkString(",") +:
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
