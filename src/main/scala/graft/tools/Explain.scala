package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-evidence dump: `runMain graft.tools.Explain <sfDir> <query>...`
  * prints `.explain("formatted")` for each named SparkEntry query (all
  * of them if none named). The review loop for scale hygiene — check
  * PushedFilters / ReadSchema pruning, broadcast vs shuffle joins, and
  * WholeStageCodegen spans before trusting a query at 100 TB.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case t: Throwable => println(s"EXPLAIN FAIL: $t") }
    }
    spark.stop()
  }
}
