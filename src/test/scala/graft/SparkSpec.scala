package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session, lazy). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sqlc = spark.sqlContext
}

object SparkSpec {
  // the same construction path as the shipped mains (EngineSession), so
  // every plan assertion in the suites runs under the driver's real config
  // — extensions (SQL fns + LambdaCse) included
  lazy val session: SparkSession = EngineSession.builder("local[4]", "4")
    .appName("graft-test")
    .getOrCreate()
}
