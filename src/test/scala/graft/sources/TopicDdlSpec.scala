package graft.sources

import graft.SparkSpec
import graft.rawdata.{EventsAsTopic, Topic}

/** SQL DDL over the connector: a topic registered with CREATE TABLE ...
  * USING `graft-topic` is queryable (and pruned) like any catalog table.
  */
class TopicDdlSpec extends SparkSpec {
  import spark.implicits._

  test("CREATE TABLE USING graft-topic makes a topic a first-class SQL table") {
    val dir = Topic.tempDir("ddl-topic")
    Topic.write(EventsAsTopic.messagesFromEvents(spark, sf).limit(100), dir, EventsAsTopic.cfg)
    spark.sql("DROP TABLE IF EXISTS rawdata_topic")
    spark.sql(s"CREATE TABLE rawdata_topic USING `graft-topic` OPTIONS (path '$dir')")
    try {
      val n = spark.sql("SELECT COUNT(*) FROM rawdata_topic").as[Long].collect().head
      assert(n === 100)
      val grouped = spark.sql(
        "SELECT orderingGroup, COUNT(*) AS n FROM rawdata_topic GROUP BY orderingGroup ORDER BY orderingGroup")
        .collect()
      assert(grouped.map(_.getLong(1)).sum === 100)
    } finally spark.sql("DROP TABLE IF EXISTS rawdata_topic")
  }
}
