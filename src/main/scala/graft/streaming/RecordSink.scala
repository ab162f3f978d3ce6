package graft.streaming

import java.io.{BufferedWriter, File, FileWriter}

import org.apache.spark.sql.{ForeachWriter, Row}

/** Op 6 in its per-record form (SURVEY §2.A): the reference does one
  * synchronous `putRecord` per record against a client built once in the
  * ctor (Handler.java:48-51,79-84). The Spark shape is a
  * [[ForeachWriter]]: `open` plays the client construction (once per
  * partition per epoch — the executor-lifetime connection-reuse pattern),
  * `process` the per-record put, `close` the teardown. The offline
  * "region" is a directory of JSON-lines part files.
  *
  * The batched `foreachBatch` path in [[Replicator.run]] is the
  * preferred high-throughput sink (SURVEY §4: the per-record RTT-bound
  * loop is the reference's anti-pattern); this writer exists because a
  * per-record sink with ordered delivery per shard is part of the
  * reference's operator surface.
  */
class JsonLinesRecordWriter(targetDir: String) extends ForeachWriter[Row] {
  @transient private var writer: BufferedWriter = _
  @transient private var tmpFile: File = _
  @transient private var dstFile: File = _

  override def open(partitionId: Long, epochId: Long): Boolean = {
    // "client" construction — once per (partition, epoch), reused for
    // every record processed by this task. Each ATTEMPT writes its own
    // temp file and atomically renames into the deterministic
    // per-(partition, epoch) name on successful close: concurrent
    // speculative/zombie attempts for the same task then race only on
    // the rename (last complete file wins) instead of interleaving
    // writes into one shared file.
    val dir = new File(targetDir)
    dir.mkdirs()
    val attempt = Option(org.apache.spark.TaskContext.get())
      .map(_.taskAttemptId()).getOrElse(System.nanoTime())
    val stem = f"part-$partitionId%05d-$epochId%05d"
    dstFile = new File(dir, s"$stem.jsonl")
    tmpFile = new File(dir, s".$stem-$attempt.jsonl.tmp")
    // garbage-collect temp files left by prior attempts of this same
    // (partition, epoch) that died before reaching close(); a live zombie
    // attempt losing its tmp file just fails its (already superseded)
    // rename, which is the desired outcome
    Option(dir.listFiles()).toSeq.flatten
      .filter(f => f.getName.startsWith(s".$stem-") && f.getName.endsWith(".jsonl.tmp") &&
        f.getName != tmpFile.getName)
      .foreach(_.delete())
    writer = new BufferedWriter(new FileWriter(tmpFile, false))
    true
  }

  override def process(row: Row): Unit = {
    val q = (s: String) => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    writer.write(
      s"""{"streamName": ${q(row.getAs[String]("streamName"))}, """ +
        s""""partitionKey": ${q(row.getAs[String]("partitionKey"))}, """ +
        s""""sequenceNumber": ${q(row.getAs[String]("sequenceNumber"))}}""")
    writer.newLine()
  }

  override def close(errorOrNull: Throwable): Unit = {
    if (writer != null) writer.close()
    if (tmpFile != null) {
      if (errorOrNull == null) {
        // complete output: move into place (replacing any prior attempt's
        // complete file — idempotent for retries). ATOMIC_MOVE so a
        // concurrent reader can never observe a partially-copied
        // destination; on filesystems that cannot move atomically, fall
        // back to the plain replace (same-directory moves on local
        // filesystems are renames, so the fallback is effectively
        // unreachable there)
        try
          java.nio.file.Files.move(tmpFile.toPath, dstFile.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.AtomicMoveNotSupportedException =>
            java.nio.file.Files.move(tmpFile.toPath, dstFile.toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      } else {
        tmpFile.delete() // failed attempt leaves no partial output
      }
    }
  }
}
