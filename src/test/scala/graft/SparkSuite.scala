package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (same config surface as the
  * driver's Verify session: UTC, nanos-as-long, small shuffle width). */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    // AQE off for the TEST session only (r16): on 4-row fixtures every
    // AQE stage is its own job submission and re-plan — pure fixed
    // latency (measured: the cosineIngestStream tests spend ~80 s per
    // 3-doc micro-batch, mostly stage tax). Plans also become
    // deterministic for the plan-pin suites. Verify/Bench keep the
    // production default (AQE on) — logic, not AQE, is what these
    // fixtures certify.
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  override def afterAll(): Unit = {
    // session is shared across suites in one JVM — do not stop it here
    super.afterAll()
  }
}
