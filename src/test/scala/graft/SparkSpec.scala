package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test fixture: one session per suite, sf0.001 data. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4", "4")
  val sf: String = "/root/testdata/sf0.001"
}
