package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.GraftSession

/** Shared local SparkSession for specs that need one (small core count —
  * correctness tests, not benchmarks).
  */
abstract class SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  protected lazy val spark: SparkSession = GraftSession.local(cores = 4, appName = "graft-test")
  protected val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // keep the session for sibling suites in the same JVM (Test/fork=true
    // runs all suites in one forked JVM) — do not stop it here.
    super.afterAll()
  }
}
