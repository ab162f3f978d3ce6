package graft.streaming

import org.apache.spark.sql.SparkSession

/** Sink maintenance: streaming appends (op 6's target table) accumulate
  * one small file per partition per micro-batch; at 100 TB that kills
  * scan performance (footer-per-file overhead, no row-group locality).
  * Compaction rewrites a partitioned parquet table into a bounded number
  * of files per partition, preserving the partition layout.
  */
object Maintenance {

  /** Rewrite `dir` (partitioned by `partitionCol`) with ≤
    * `filesPerPartition` files per partition value. Reads and rewrites
    * atomically-enough for the offline harness via a temp dir + move;
    * production would do this under a table format's transaction.
    *
    * Swap discipline (two renames via a `.compact-old` hop): between the
    * renames there is a reader-visible window where `dir` is absent —
    * concurrent readers error rather than see partial data. A crash in
    * that window leaves the live table at `dir + ".compact-old"`; the
    * next `compact` call detects and restores it automatically (or call
    * [[recoverFromCrash]] directly).
    */
  def compact(spark: SparkSession, dir: String, partitionCol: String,
      filesPerPartition: Int = 1): Unit = {
    import org.apache.spark.sql.functions._
    recoverFromCrash(spark, dir)
    val tmp = dir + ".compact-tmp"
    val df = spark.read.parquet(dir)
    // shuffle on (partition value, bounded salt): every partition value
    // spreads over at most filesPerPartition tasks → ≤ that many files
    df.withColumn("__salt",
        pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(filesPerPartition)))
      .repartition(col(partitionCol), col("__salt"))
      .drop("__salt")
      .write.mode("overwrite").partitionBy(partitionCol).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val (src, dst) = (new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(dir))
    // swap via a .old hop so every crash point leaves a recoverable copy:
    // before step 2 the live table is still at .old; after it, at dst.
    // (delete-then-rename would lose the table if the rename never ran.)
    val old = new org.apache.hadoop.fs.Path(dir + ".compact-old")
    fs.delete(old, true)
    if (!fs.rename(dst, old)) {
      // dst must actually move: renaming src onto a still-existing dst
      // would NEST the new data inside the live table (Hadoop rename
      // semantics) and silently corrupt it
      fs.delete(src, true)
      throw new java.io.IOException(s"compact: rename $dst -> $old failed; aborted")
    }
    if (!fs.rename(src, dst)) {
      fs.rename(old, dst) // roll back to the pre-compaction table
      throw new java.io.IOException(s"compact: rename $src -> $dst failed; rolled back")
    }
    fs.delete(old, true)
  }

  /** Restore a table stranded at `dir + ".compact-old"` by a crash
    * between the two swap renames of a prior [[compact]] (live table
    * absent from `dir`). No-op when `dir` exists — then a leftover
    * `.compact-old` is just the pre-swap copy that the crashed run never
    * got to delete, and the completed swap at `dir` wins.
    */
  def recoverFromCrash(spark: SparkSession, dir: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(dir)
    val old = new org.apache.hadoop.fs.Path(dir + ".compact-old")
    if (!fs.exists(dst) && fs.exists(old)) {
      if (!fs.rename(old, dst))
        throw new java.io.IOException(
          s"compact recovery: rename $old -> $dst failed; table remains at $old")
    }
  }

  /** Number of data files under a table directory (recursive). */
  def dataFileCount(dir: String): Int = {
    def walk(f: java.io.File): Int =
      Option(f.listFiles()).toSeq.flatten.map {
        c => if (c.isDirectory) walk(c) else if (c.getName.endsWith(".parquet")) 1 else 0
      }.sum
    walk(new java.io.File(dir))
  }
}
