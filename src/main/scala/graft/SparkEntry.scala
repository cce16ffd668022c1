package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ExtQueries, MoreQueries, Queries, R10Queries, R11Queries, R12Queries, R13Queries, R14Queries, R15Queries, R16Queries, R17Queries, R18Queries, R19Queries, R20Queries, R21Queries, R22Queries, R23Queries, R24Queries, R25Queries, R26Queries, R27Queries, R28Queries, R29Queries, R30Queries, R31Queries, R32Queries, R33Queries, R34Queries, R35Queries, R36Queries, R37Queries, R38Queries, R39Queries, R40Queries, R41Queries, R42Queries, R43Queries, R44Queries, R45Queries, R46Queries, R47Queries, R48Queries, R49Queries, R50Queries, R51Queries, R52Queries, R53Queries, R54Queries, R55Queries, R56Queries, R57Queries, R58Queries, R59Queries, R60Queries, R61Queries, R62Queries, R63Queries, R64Queries, R65Queries, R66Queries, R67Queries, R68Queries, R69Queries, R70Queries, R71Queries, R72Queries, R73Queries, R74Queries, R75Queries, R76Queries, R77Queries, R78Queries, R79Queries, R80Queries, R81Queries, R82Queries, R83Queries, R84Queries, R85Queries, R86Queries, R87Queries, R88Queries, R89Queries, R90Queries, R91Queries, R92Queries, R93Queries, R94Queries, R95Queries, R96Queries, R97Queries, R98Queries, R99Queries, R100Queries, R101Queries, R102Queries, R103Queries, R104Queries, R105Queries, R106Queries, R107Queries, R108Queries, R109Queries, R110Queries, R111Queries, R112Queries, R113Queries, R3Queries, R4Queries, R5Queries, R6Queries, R7Queries, R8Queries, R9Queries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 (plus the north-star LLM-pipeline
  * extensions) is exposed as a named query; SQL-expressible ones carry
  * DuckDB oracle SQL in [[oracleSql]] for the driver's hash compare.
  */
object SparkEntry {

  private val defs =
    Queries.all ++ ExtQueries.all ++ MoreQueries.all ++ R3Queries.all ++
      R4Queries.all ++ R5Queries.all ++ R6Queries.all ++ R7Queries.all ++
      R8Queries.all ++ R9Queries.all ++ R10Queries.all ++ R11Queries.all ++
      R12Queries.all ++ R13Queries.all ++ R14Queries.all ++ R15Queries.all ++
      R16Queries.all ++ R17Queries.all ++ R18Queries.all ++ R19Queries.all ++
      R20Queries.all ++ R21Queries.all ++ R22Queries.all ++ R23Queries.all ++ R24Queries.all ++ R25Queries.all ++ R26Queries.all ++ R27Queries.all ++ R28Queries.all ++ R29Queries.all ++ R30Queries.all ++ R31Queries.all ++ R32Queries.all ++ R33Queries.all ++ R34Queries.all ++ R35Queries.all ++ R36Queries.all ++ R37Queries.all ++ R38Queries.all ++ R39Queries.all ++ R40Queries.all ++ R41Queries.all ++ R42Queries.all ++ R43Queries.all ++ R44Queries.all ++ R45Queries.all ++ R46Queries.all ++ R47Queries.all ++ R48Queries.all ++ R49Queries.all ++ R50Queries.all ++ R51Queries.all ++ R52Queries.all ++ R53Queries.all ++ R54Queries.all ++ R55Queries.all ++ R56Queries.all ++ R57Queries.all ++ R58Queries.all ++ R59Queries.all ++ R60Queries.all ++ R61Queries.all ++ R62Queries.all ++ R63Queries.all ++ R64Queries.all ++ R65Queries.all ++ R66Queries.all ++ R67Queries.all ++ R68Queries.all ++ R69Queries.all ++ R70Queries.all ++ R71Queries.all ++ R72Queries.all ++ R73Queries.all ++ R74Queries.all ++ R75Queries.all ++ R76Queries.all ++ R77Queries.all ++ R78Queries.all ++ R79Queries.all ++ R80Queries.all ++ R81Queries.all ++ R82Queries.all ++ R83Queries.all ++ R84Queries.all ++ R85Queries.all ++ R86Queries.all ++ R87Queries.all ++ R88Queries.all ++ R89Queries.all ++ R90Queries.all ++ R91Queries.all ++ R92Queries.all ++ R93Queries.all ++ R94Queries.all ++ R95Queries.all ++ R96Queries.all ++ R97Queries.all ++ R98Queries.all ++ R99Queries.all ++ R100Queries.all ++ R101Queries.all ++ R102Queries.all ++ R103Queries.all ++ R104Queries.all ++ R105Queries.all ++ R106Queries.all ++ R107Queries.all ++ R108Queries.all ++ R109Queries.all ++ R110Queries.all ++ R111Queries.all ++ R112Queries.all ++ R113Queries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the broadcast star-join revenue rollup. */
  def entry(spark: SparkSession): DataFrame =
    Queries.qJoinStarRevenue.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (mapPartitions plumbing, LSH bucket summaries, iterative crawl). */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
