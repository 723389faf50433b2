package graft.operators

import org.apache.hadoop.fs.{FileContext, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout maintenance for parquet table directories — the two
  * levers that keep a 100 TB table scannable after months of ingest:
  *
  *  - [[compact]]: every micro-batch append (the m-family sinks, the
  *    d10/d14 index ingest, any `mode(Append)` writer) drops one file
  *    per task into each touched partition directory; after N batches a
  *    scan opens O(N x partitions) small files and the NameNode/driver
  *    pays per-file listing + footer costs. Compaction rewrites the
  *    data files partition-clustered — one task's contiguous output per
  *    partition (AQE splits oversized ones) — behind a tmp-dir +
  *    atomic-rename swap.
  *
  *  - [[sortedWrite]]: parquet row-group statistics (min/max per
  *    column chunk) are only selective when values are CLUSTERED; a
  *    shuffled table answers `key = x` by reading every row group, a
  *    range-partitioned + sorted one reads the few whose [min,max]
  *    straddle x. Same bytes, same schema — orders-of-magnitude less IO
  *    for point/range predicates on the sort key (LayoutSpec measures
  *    the scan-metric difference). This is the poor-man's Z-order: one
  *    sort column family, no library dependency, plain parquet.
  *
  * Both operate on PLAIN parquet directories (optionally
  * `partitionBy`-laid-out) — no table format required; the swap
  * pattern matches [[AnnIndex]]'s generational discipline (readers of
  * the old listing keep their snapshot until the rename lands; on
  * object stores with non-atomic rename, run under a maintenance
  * window or front with a manifest/table format).
  */
object Layout {

  /** Rewrite the parquet directory at `path` with its data clustered by
    * `partitionCols` (the existing `partitionBy` layout, preserved) so
    * each partition directory holds one task's contiguous files instead
    * of one file per historical append. Row-identical by construction —
    * the rewrite is a read + hash-cluster + write of the same rows
    * (LayoutSpec asserts it). With no `partitionCols` the whole
    * directory coalesces toward `spark.sql.shuffle.partitions` files.
    *
    * Returns (files before, files after).
    */
  def compact(spark: SparkSession, path: String,
              partitionCols: Seq[String] = Nil): (Long, Long) = {
    val before = spark.read.parquet(path)
    val filesBefore = before.inputFiles.length.toLong
    val tmp = s"$path.__compact_tmp"
    val writer = (if (partitionCols.nonEmpty)
        before.repartition(partitionCols.map(col): _*)
      else before.coalesce(math.max(1,
        spark.sessionState.conf.numShufflePartitions)))
      .write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(tmp)
    // verify BEFORE the swap: a lost-rows compaction must never land
    val n0 = before.count()
    val n1 = spark.read.parquet(tmp).count()
    require(n1 == n0, s"compaction would lose rows: $n0 -> $n1; aborting")
    // dir-over-dir rename cannot OVERWRITE a non-empty target, so swap
    // via rename-aside: old moves out, compacted moves in, aside
    // deletes last. The two renames are each atomic; the window between
    // them is the documented maintenance-window semantics (a table
    // format/manifest is the cure where concurrent readers must never
    // miss the listing).
    val fc = FileContext.getFileContext(new Path(path).toUri,
      spark.sessionState.newHadoopConf())
    val aside = new Path(s"$path.__compact_old")
    if (fc.util.exists(aside)) fc.delete(aside, true) // crashed prior run
    fc.rename(new Path(path), aside)
    fc.rename(new Path(tmp), new Path(path))
    fc.delete(aside, true)
    val filesAfter = spark.read.parquet(path).inputFiles.length.toLong
    (filesBefore, filesAfter)
  }

  /** Write `df` to `path` range-clustered and sorted by `sortCols`:
    * `repartitionByRange` gives disjoint per-file key ranges,
    * `sortWithinPartitions` makes every parquet row group's min/max
    * tight — the layout under which predicate pushdown on the sort key
    * actually skips row groups instead of merely re-checking rows.
    */
  def sortedWrite(df: DataFrame, path: String, sortCols: Seq[String],
                  numFiles: Int = 0): Unit = {
    require(sortCols.nonEmpty, "sortedWrite needs at least one sort column")
    val parts =
      if (numFiles > 0) numFiles
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartitionByRange(parts, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
