package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite, UTC, tiny shuffle). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient protected lazy val spark: SparkSession = GraftConf.tuned(SparkSession.builder())
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override protected def afterAll(): Unit = {
    // keep the session for the JVM (other suites reuse it via getOrCreate)
    super.afterAll()
  }

  protected val sf0001 = "/root/testdata/sf0.001"
  protected val sf001 = "/root/testdata/sf0.01"
}
