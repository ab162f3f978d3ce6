package graft

import org.apache.spark.sql.functions._

/** Pins the replay-guard contract of [[Util.batchAlreadyApplied]]
  * (round-11 ADVICE fix): only the empty-debris/schema-inference
  * failure may read as "not applied" — any other read failure must
  * rethrow, because answering "not applied" on a transient error would
  * re-append a possibly-committed batch and double-count every
  * sum-merged idempotent table downstream.
  */
class UtilSpec extends SparkSpec {

  test("batchAlreadyApplied: missing path and empty debris read as not applied") {
    import spark.implicits._
    val dir = tmpDir("replay_guard")
    assert(!Util.batchAlreadyApplied(spark, s"$dir/nope", 1L))
    // empty directory = the debris of a write that died before its
    // first commit — must read as "not applied", not throw
    new java.io.File(s"$dir/empty").mkdirs()
    assert(!Util.batchAlreadyApplied(spark, s"$dir/empty", 1L))
    // committed rows: exact batch matching
    Seq((5L, "x")).toDF("batch_id", "v").write.parquet(s"$dir/state")
    assert(Util.batchAlreadyApplied(spark, s"$dir/state", 5L))
    assert(!Util.batchAlreadyApplied(spark, s"$dir/state", 6L))
  }

  test("batchAlreadyApplied: a corrupt file alongside committed data rethrows instead of reading as not applied") {
    import spark.implicits._
    val dir = tmpDir("replay_guard_corrupt")
    Seq((5L, "x")).toDF("batch_id", "v").write.parquet(s"$dir/state")
    // a stray unreadable "parquet" file: the read must FAIL the batch
    // (rethrow), never answer false and trigger a duplicate append
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/state/part-corrupt.parquet"),
      "this is not parquet".getBytes)
    scala.util.Try(Util.batchAlreadyApplied(spark, s"$dir/state", 5L)) match {
      case scala.util.Success(v) =>
        // if the engine tolerates the junk footer and answers from the
        // committed rows, true is the only acceptable answer
        assert(v, "corrupt sibling must not flip a committed batch to 'not applied'")
      case scala.util.Failure(_) =>
        // rethrow is the strict (and expected) behavior: the batch
        // fails and retries instead of double-appending
        ()
    }
  }

  test("fan-out pools are bounded by design and layered as a DAG") {
    // guide §2.6: 2-3 jobs in flight fills the scheduler tail; the pools
    // cap driver-side concurrency structurally (not by call-site
    // discipline). queryPool tasks may await jobPool leaves; saturating
    // BOTH pools with that nesting must still complete (no starvation
    // deadlock) because the leaf pool never waits on anything.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    def cap(ec: java.util.concurrent.ExecutorService): Int = ec match {
      case t: java.util.concurrent.ThreadPoolExecutor => t.getMaximumPoolSize
      case other => fail(s"expected a bounded ThreadPoolExecutor: $other")
    }
    assert(cap(Util.jobPool) === 4)
    assert(cap(Util.queryPool) === 2)
    // more parents than queryPool threads, each fanning more leaves than
    // jobPool threads — completes only if the pool graph is deadlock-free
    val parents = (1 to 4).map { p =>
      Future {
        val leaves = (1 to 8).map(l => Future(p * 100 + l)(Util.jobPool))
        leaves.map(Await.result(_, 30.seconds)).sum
      }(Util.queryPool)
    }
    val sums = parents.map(Await.result(_, 60.seconds))
    assert(sums === (1 to 4).map(p => (1 to 8).map(p * 100 + _).sum))
  }
}
