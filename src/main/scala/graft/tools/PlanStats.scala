package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** Plan-budget dump: `runMain graft.tools.PlanStats <sfDir> <query>...`
  * prints, per named SparkEntry query, the counts PlanShapeSpec pins —
  * hash-partitioned shuffles, broadcast-hash / sort-merge / shuffled-hash
  * joins, cartesian products, nested-loop joins — on the pre-AQE
  * executedPlan. The empirical source for new plan pins. */
object PlanStats {
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
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      try {
        val p = graft.SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.executedPlan
        val hashShuffles = p.collect {
          case e: ShuffleExchangeExec
            if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
        }.size
        val bhj = p.collect { case j: BroadcastHashJoinExec => j }.size
        val smj = p.collect { case j: SortMergeJoinExec => j }.size
        val shj = p.collect { case j: ShuffledHashJoinExec => j }.size
        val cart = p.collect { case j: CartesianProductExec => j }.size
        val bnl = p.collect { case j: BroadcastNestedLoopJoinExec => j }.size
        // window-operator exec counts (r15): the empirical source for
        // PlanShapeSpec's retired-whitelist pins
        val winExec = p.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w }.size
        // unpartitioned (or constant-key) window execs — each one is a
        // single-partition funnel that logs "No Partition Defined" at
        // runtime; the empirical source for the r16 warning-site sweep
        val winGlobal = p.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.forall(_.foldable) => w }.size
        val rank = p.collect { case g: graft.plans.GlobalRankExec => g }.size
        val frame = p.collect { case g: graft.plans.GlobalFrameAggExec => g }.size
        val run = p.collect { case g: graft.plans.GlobalRunningAggExec => g }.size
        val shift = p.collect { case g: graft.plans.GlobalShiftExec => g }.size
        val mov = p.collect { case g: graft.plans.GlobalMovingAggExec => g }.size
        println(s"PLANSTATS $n hashShuffles=$hashShuffles bhj=$bhj " +
          s"smj=$smj shj=$shj cartesian=$cart bnl=$bnl " +
          s"winExec=$winExec winGlobal=$winGlobal rank=$rank frame=$frame run=$run " +
          s"shift=$shift mov=$mov")
      } catch { case t: Throwable => println(s"PLANSTATS $n FAIL: $t") }
    }
    spark.stop()
  }
}
