package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** The events read path must survive BOTH physical typings of `ts` that
  * the testdata generator has shipped: INT64 TIMESTAMP(NANOS) (pre-r8) and
  * timestamp[us] (r8+). The round-8 generator retype silently zeroed 25
  * queries and 13 tests because the loader hardcoded the nanos workaround;
  * these fixtures (tools/make_events_fixtures.py — identical logical rows,
  * two typings) pin the contract so a future retype fails HERE, loudly.
  */
class TablesSpec extends SparkSpec {

  private def fixture(name: String): String = {
    val url = getClass.getClassLoader.getResource(s"$name/events.parquet")
    assert(url != null, s"missing test fixture $name/events.parquet")
    new java.io.File(url.toURI).getParent
  }

  test("events loads nanos-typed ts as TIMESTAMP_NTZ") {
    val df = Tables.events(spark, fixture("events_nanos"))
    assert(df.schema("ts").dataType == TimestampNTZType)
    assert(df.count() == 5)
  }

  test("events loads micros-typed ts as TIMESTAMP_NTZ") {
    val df = Tables.events(spark, fixture("events_micros"))
    assert(df.schema("ts").dataType == TimestampNTZType)
    assert(df.count() == 5)
  }

  test("both typings yield identical rows (values, not just schema)") {
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val nanos = Tables.events(spark, fixture("events_nanos"))
      .select(cols.map(col): _*).orderBy("event_id").collect()
    val micros = Tables.events(spark, fixture("events_micros"))
      .select(cols.map(col): _*).orderBy("event_id").collect()
    assert(nanos.toSeq == micros.toSeq)
    // sub-second precision survives the nanos→micros conversion: row 4's
    // .999999 micros field would round away under double math
    val r4 = micros.find(_.getLong(0) == 4).get
    assert(r4.getAs[java.time.LocalDateTime]("ts").getNano == 999999000)
  }

  test("the live testdata dir loads through the adaptive branch") {
    val df = Tables.events(spark, SfDir)
    assert(df.schema("ts").dataType == TimestampNTZType)
    assertNonEmpty(df.limit(1).toDF(), "events at sf0.001")
  }
}
