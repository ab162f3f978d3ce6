package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic for the r12 optimization round (not a query
  * surface; deleted before round end if not useful).
  */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[diag] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // warm up codegen/JIT once
    t("q365 warmup (full)") {
      SparkEntry.queries("q365_ingest_vs_rebuild")(spark, sfDir).collect()
    }
    val all = Util.table(spark, sfDir, "documents")
    val base = all.filter($"doc_id" % 8 =!= 0)
    val batch = all.filter($"doc_id" % 8 === 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_diag365_").toString + "/g"
    t("write base storeDocs") {
      graft.api.DupGraph.write(base, "doc_id", "text", tmp, 0.0, "lsh",
        storeDocs = true)
    }
    val ne = t("ingestBatch") {
      graft.api.DupGraph.ingestBatch(batch, 0L, tmp, "doc_id", "text")
        .localCheckpoint()
    }
    t("counts x2") { (ne.count(), ne.select($"id_a").distinct().count()) }
    t("refreshStats") { graft.api.DupGraph.refreshStats(spark, tmp) }
    t("shingle counts") {
      (graft.api.Dedup.shingleSets(batch, "doc_id", "text").count(),
        graft.api.Dedup.shingleSets(all, "doc_id", "text").count())
    }
    t("q365 full again") {
      SparkEntry.queries("q365_ingest_vs_rebuild")(spark, sfDir).collect()
    }
    // lsh tau=0 derivation alone (the write's dominant input)
    t("lshCandidatePairs(t=0) noop") {
      graft.api.Dedup.cacheScope {
        graft.api.Dedup.lshCandidatePairs(base, "doc_id", "text")
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
