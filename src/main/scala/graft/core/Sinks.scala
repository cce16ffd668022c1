package graft.core

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Output connectors of the pipeline (SURVEY.md §2.2).
  *
  * K1 JDBC append, K2 text-with-header, K3 binary, K5 filename keying —
  * all executor-side (`foreachPartition`), nothing funnels through the
  * driver, so each scales with the number of partitions.
  */
object Sinks {

  /** K1: batched JDBC append (`DataFrame.to_sql(..., if_exists="append",
    * method="multi")`, reference `web_spider_oo.py:343-350`). `batchsize`
    * is the Spark analog of pandas' multi-row INSERT batching; one
    * connection per partition mirrors connection pooling (`:140-156`).
    */
  def jdbcAppend(df: DataFrame, url: String, table: String,
                 props: Map[String, String] = Map.empty,
                 batchSize: Int = 1000): Unit = {
    val w = df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .mode(SaveMode.Append)
    props.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }.save()
  }

  /** K2: one text file per row with the reference's 2-line header
    * (`root_site:`/`web_url:`, `web_spider_oo.py:352-359`), named by the
    * sanitized-url scheme (K5, `:367-390`). Executor-side writes into
    * `outDir` (shared filesystem on a real cluster).
    *
    * Expects columns (url STRING, text STRING).
    */
  def writeTextFiles(df: DataFrame, rootSite: String, outDir: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    val withName = df.select(
      concat(LinkOps.sanitizeFileName(concat(lit(rootSite.dropRight(1) + "_"),
        col("url"))), lit(".txt")).as("file_name"),
      concat_ws("\n",
        concat(lit("root_site: "), lit(rootSite)),
        concat(lit("web_url: "), col("url")),
        col("text")).as("payload"))
    withName.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      rows.foreach { r =>
        Files.write(Paths.get(outDir, r.getString(0)),
          r.getString(1).getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      }
    }
  }

  /** Partitioned parquet lake write: directory-partition the data by a
    * low-cardinality column so readers filtering on it scan only the
    * matching directories (partition pruning — `PartitionFilters` in the
    * plan, the 100 TB table-layout primitive alongside bucketing). */
  def writePartitioned(df: DataFrame, partitionCol: String,
                       path: String): Unit =
    df.write.partitionBy(partitionCol).mode(SaveMode.Overwrite).parquet(path)

  /** The reference's incremental per-parent append (K1 shape,
    * `web_spider_oo.py:123-128`): each crawl depth appends its edges to
    * the sink as they are produced instead of materializing the whole
    * crawl — append-mode parquet partitioned by depth (the JDBC analog
    * is the same write with format("jdbc") + SaveMode.Append). */
  def appendEdges(edges: DataFrame, path: String): Unit =
    edges.write.partitionBy("pen_depth").mode(SaveMode.Append).parquet(path)

  /** K3: binary sink — verbatim bytes per row (`response.content` ->
    * `.pdf`, reference `web_spider_oo.py:361-365`). Spark has no built-in
    * binary-file writer, so this is the documented `foreachPartition`
    * escape hatch (SURVEY.md §2.2 K3).
    *
    * Expects columns (url STRING, content BINARY).
    */
  def writeBinaryFiles(df: DataFrame, rootSite: String, outDir: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    val withName = df.select(
      concat(LinkOps.sanitizeFileName(concat(lit(rootSite.dropRight(1) + "_"),
        col("url"))), lit(".pdf")).as("file_name"),
      col("content"))
    withName.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      rows.foreach { r =>
        Files.write(Paths.get(outDir, r.getString(0)), r.getAs[Array[Byte]](1),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      }
    }
  }

  /** Small-file compaction: rewrite each leaf parquet directory into
    * ~ceil(leafBytes / targetFileBytes) files. The standard lake
    * maintenance op at scale — incremental appends (e.g. [[appendEdges]]
    * per crawl depth, or a streaming foreachBatch sink) accumulate many
    * small files whose per-file open/footer cost eventually dominates
    * scans. Partitioned layouts (`col=value/` subdirs) are compacted
    * leaf-by-leaf, preserving the layout and its partition pruning.
    *
    * Each leaf is rewritten to a unique sibling temp dir, then swapped
    * via rename-to-backup / rename-into-place / delete-backup: a crash
    * at any point leaves the full data in either the live or the backup
    * directory (never lost), though a reader racing the swap itself can
    * momentarily see the path absent — true atomic directory swap needs
    * a table format. Returns the total new file count.
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, dir: String,
                     targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // self-heal leftovers of a crashed earlier run BEFORE scanning for
    // leaves: a '.X_backup_*' whose live dir X is absent means the crash
    // hit between the two swap renames — restore it (data is complete
    // there); orphaned '.X_compact_*' tmp rewrites are safe to delete.
    // Assumes one compactor per table at a time (like every
    // non-table-format maintenance op).
    def heal(p: org.apache.hadoop.fs.Path): Unit = {
      val entries = fs.listStatus(p).toSeq
      entries.filter(e => e.isDirectory &&
          e.getPath.getName.startsWith(".")).foreach { e =>
        val name = e.getPath.getName
        val backupRe = "^\\.(.+)_backup_[0-9a-f]{8}$".r
        val compactRe = "^\\.(.+)_compact_[0-9a-f]{8}$".r
        name match {
          case backupRe(orig) =>
            val live = new org.apache.hadoop.fs.Path(p, orig)
            if (!fs.exists(live)) {
              require(fs.rename(e.getPath, live),
                s"restore of crashed backup ${e.getPath} failed")
            } else fs.delete(e.getPath, true) // swap completed; stale copy
          case compactRe(_) => fs.delete(e.getPath, true)
          case _ =>
        }
      }
      entries.filter(e => e.isDirectory &&
          !e.getPath.getName.startsWith("."))
        .foreach(e => heal(e.getPath))
    }
    heal(root)

    // leaf dirs = dirs directly containing parquet files (a flat table
    // is its own single leaf; partitioned tables have one per partition
    // — including '_col=value' names, so only our '.'-hidden dirs and
    // Hadoop's _temporary are skipped)
    def leaves(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val entries = fs.listStatus(p).toSeq
      val here = entries.exists(e =>
        e.isFile && e.getPath.getName.endsWith(".parquet"))
      val below = entries.filter(_.isDirectory)
        .filterNot { d =>
          val n = d.getPath.getName
          n.startsWith(".") || n == "_temporary"
        }
        .flatMap(d => leaves(d.getPath))
      if (here) p +: below else below
    }

    leaves(root).map { leaf =>
      val bytes = fs.listStatus(leaf)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getLen).sum
      val n =
        math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
      // unique hidden sibling (never inside the leaf; trailing slashes
      // are normalized by Path)
      val stamp = java.util.UUID.randomUUID().toString.take(8)
      val tmp = new org.apache.hadoop.fs.Path(leaf.getParent,
        s".${leaf.getName}_compact_$stamp")
      val bak = new org.apache.hadoop.fs.Path(leaf.getParent,
        s".${leaf.getName}_backup_$stamp")
      // read the leaf only (partition columns live in dir names above it
      // and are untouched)
      spark.read.parquet(leaf.toString).repartition(n)
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      require(fs.rename(leaf, bak), s"rename $leaf -> $bak failed")
      if (!fs.rename(tmp, leaf)) {
        fs.rename(bak, leaf) // roll back; data never lost
        fs.delete(tmp, true) // don't leak the abandoned rewrite
        throw new IllegalStateException(s"rename $tmp -> $leaf failed")
      }
      fs.delete(bak, true)
      n
    }.sum
  }
}
