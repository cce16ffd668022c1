package graft.tools

/** Registry counts: total queries and oracle-backed queries. */
object Counts {
  def main(args: Array[String]): Unit = {
    println(s"queries=${graft.SparkEntry.queries.size} " +
      s"oracles=${graft.SparkEntry.oracleSql.size}")
  }
}
