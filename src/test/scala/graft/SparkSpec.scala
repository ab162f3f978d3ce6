package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (getOrCreate → one JVM-wide
  * context, reused across suites in the forked test JVM).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkEntry.configure(SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .withExtensions(new graft.plans.GraftExtensions)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  val sf: String = "/root/testdata/sf0.001"

  override protected def afterAll(): Unit = {
    // session is shared across suites; do not stop it here
    super.afterAll()
  }

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
