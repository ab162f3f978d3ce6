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
    */
  def compact(spark: SparkSession, dir: String, partitionCol: String,
      filesPerPartition: Int = 1): Unit = {
    import org.apache.spark.sql.functions._
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

  /** Number of data files under a table directory (recursive). */
  def dataFileCount(dir: String): Int = {
    def walk(f: java.io.File): Int =
      Option(f.listFiles()).toSeq.flatten.map {
        c => if (c.isDirectory) walk(c) else if (c.getName.endsWith(".parquet")) 1 else 0
      }.sum
    walk(new java.io.File(dir))
  }
}
