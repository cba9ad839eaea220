package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM, reused). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  def sfDir: String = "/root/testdata/sf0.001"

  /** Testdata loader via the engine's canonical table reader, so specs
    * see the same normalized schema (ts as Long nanos) as the queries.
    */
  def table(name: String): org.apache.spark.sql.DataFrame =
    graft.queries.RelationalQueries.t(spark, sfDir, name)
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.local("4", "graft-test")
    // suites run concurrently in one JVM; per-test conf toggling races,
    // so the RocksDB provider (required by transformWithState, fine
    // for every other stateful op) is set once for the whole session
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }
}
