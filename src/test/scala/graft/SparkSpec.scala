package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one forked test JVM). */
object SharedSpark {
  lazy val spark: SparkSession = GraftSession("local[8]", shufflePartitions = 8)
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  val sf: String = "/root/testdata/sf0.001"
}
