package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional trailing args (local iteration only; the driver passes
    // 2): query names, comma- and/or space-separated — dump and list
    // only those oracles. Unknown names fail loudly instead of
    // silently verifying nothing.
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args.drop(2).flatMap(_.split(",")).map(_.trim)
        .filter(_.nonEmpty).toSet)
      else None
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    }
    def keep(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Queries run in small PARALLEL batches: each dump is dominated by
    // fixed job-submission/coalesce latency (~1-2 s), so a serial loop
    // over 300+ queries costs ~10 min of pure latency. Concurrent
    // actions on one SparkSession are supported; results are per-query
    // directories so parallelism cannot mix outputs, and the shared
    // cache is cleared BETWEEN batches (clearing mid-flight would only
    // force recomputes, but between-batch keeps memory bounded AND
    // deterministic). Serial fallback via SPARK_GRAFT_VERIFY_THREADS=1.
    val threads = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "4").toInt
      .max(1)
    val todo = SparkEntry.queries.toSeq.filter(kv => keep(kv._1))
    todo.grouped(threads).foreach { group =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(group.size)
      try {
        group.map { case (name, fn) =>
          pool.submit(new Runnable {
            def run(): Unit =
              try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
                .parquet(s"$outDir/$name")
              catch { case e: Throwable =>
                System.err.println(s"[verify] $name failed: ${e.getMessage}")
              }
          })
        }.foreach(_.get())
      } finally pool.shutdown()
      spark.sharedState.cacheManager.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
