package graft.api

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path}

/** Generation-pointer directories — crash-safe, reader-transparent
  * compaction for append-able parquet tables.
  *
  * The aside-rename swap the first-generation index compactors used
  * (write rewrite aside → rename live dir away → rename rewrite in) has
  * a reader-visible window between the two renames where the directory
  * does not exist, and a crash inside the window strands the table at
  * `__old`. This utility replaces it with a pointer scheme that has
  * neither problem:
  *
  *   - data lives in `dir/gen-<n>/…` — a generation is IMMUTABLE once
  *     superseded, append-able while current;
  *   - `dir/_commit_<n>` (an empty marker file; the underscore prefix
  *     keeps Spark's readers from treating it as data) publishes
  *     generation n — creating it is one atomic filesystem operation,
  *     so readers always resolve EITHER the previous generation or the
  *     new one, never a missing or half-written directory;
  *   - the PREVIOUS generation's files are kept through one more
  *     publish (in-flight readers that resolved it keep working);
  *     older generations and uncommitted debris are deleted lazily at
  *     the next publish.
  *
  * Single-writer contract: publishes must not race each other (last
  * marker wins and the loser's generation leaks until the next publish
  * cleans it). Appends into the CURRENT generation may race a publish —
  * the publisher must pass a `validate` that re-checks the source
  * listing and aborts the commit when an append slipped in
  * ([[publish]]'s validate hook; [[DupGraph.maintain]] uses exactly
  * that), otherwise the racing append would be silently dropped from
  * the rewrite.
  */
object GenDir {

  private val CommitRe = "_commit_([0-9]+)".r
  private val GenRe = "gen-([0-9]+)".r

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed generation numbers under `dir`, ascending. */
  private def committed(fs: FileSystem, dir: Path): Seq[Long] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .flatMap(s => s.getPath.getName match {
        case CommitRe(n) if fs.exists(new Path(dir, s"gen-$n")) => Some(n.toLong)
        case _ => None
      }).sorted

  /** Every generation number PRESENT under `dir` (committed or debris). */
  private def present(fs: FileSystem, dir: Path): Seq[Long] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .flatMap(s => s.getPath.getName match {
        case CommitRe(n) => Some(n.toLong)
        case GenRe(n) => Some(n.toLong)
        case _ => None
      }).distinct.sorted

  /** The current (highest committed) generation's data path, if any. */
  def current(spark: SparkSession, dir: String): Option[String] = {
    val fs = fsOf(spark, dir)
    committed(fs, new Path(dir)).lastOption.map(n => s"$dir/gen-$n")
  }

  /** [[current]] with a loud failure naming the table — for readers
    * that must not silently serve nothing.
    */
  def currentOrFail(spark: SparkSession, dir: String): String =
    current(spark, dir).getOrElse(throw new IllegalStateException(
      s"no committed generation under $dir — the table was never " +
        "written, or only a crashed (uncommitted) build exists"))

  /** Write and commit a new generation. `body` receives the new
    * generation's data path and must write it COMPLETELY; `validate`
    * runs after the write and immediately before the commit marker —
    * return false to abort (the written generation is deleted, the
    * marker never appears, readers keep resolving the old generation).
    * After a successful commit the one-generation-back retention rule
    * applies: everything older than the previous generation (and any
    * uncommitted debris) is deleted.
    *
    * @return true when the generation committed, false when `validate`
    *         aborted it
    */
  def publish(spark: SparkSession, dir: String)(body: String => Unit)(
      validate: () => Boolean = () => true): Boolean = {
    val fs = fsOf(spark, dir)
    val d = new Path(dir)
    fs.mkdirs(d)
    val n = present(fs, d).lastOption.getOrElse(-1L) + 1L
    val genPath = new Path(d, s"gen-$n")
    fs.delete(genPath, true) // debris of a crashed build at this number
    body(genPath.toString)
    if (!validate()) {
      fs.delete(genPath, true)
      return false
    }
    fs.create(new Path(d, s"_commit_$n")).close()
    // retention: keep n and the previous committed generation; delete
    // everything older plus uncommitted debris below n
    val keep = committed(fs, d).filter(_ < n).lastOption.toSet + n
    present(fs, d).filter(g => g < n && !keep.contains(g)).foreach { g =>
      fs.delete(new Path(d, s"gen-$g"), true)
      fs.delete(new Path(d, s"_commit_$g"), true)
    }
    true
  }

  /** Parquet data files of the current generation — for append-debris
    * policies and the publish-time listing compare.
    */
  def currentFiles(spark: SparkSession, dir: String): Seq[String] = {
    val fs = fsOf(spark, dir)
    current(spark, dir) match {
      case None => Seq.empty
      case Some(g) =>
        val it = fs.listFiles(new Path(g), true)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val f = it.next().getPath
          if (f.getName.endsWith(".parquet")) out += f.toString
        }
        out.toSeq.sorted
    }
  }
}
