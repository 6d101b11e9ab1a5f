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

  /** live cache-manager entry count — the cache-ownership specs measure
    * growth against this (numCachedEntries is private[sql] in the Scala
    * signature but public bytecode, hence the reflective read-only probe)
    */
  def cacheEntries: Int = {
    val cm = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager
    cm.getClass.getMethod("numCachedEntries").invoke(cm)
      .asInstanceOf[java.lang.Integer].intValue()
  }
}
