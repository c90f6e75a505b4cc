package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement}
import java.time.Instant
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import graft.sources.{Freshness, JdbcUpsert}

/** JDBC upsert protocol (reference import_cards.py:214-225) validated with
  * a recording stub driver — statement shape, batching cadence, and
  * null binding, no database required. */
object RecordingJdbc {
  val sqls = new ConcurrentLinkedQueue[String]()
  val added = new AtomicInteger()
  val flushed = new AtomicInteger()
  val nullsBound = new AtomicInteger()
  def reset(): Unit = { sqls.clear(); added.set(0); flushed.set(0); nullsBound.set(0) }

  private def statement(): PreparedStatement =
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[PreparedStatement]),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "addBatch" => added.incrementAndGet(); null
          case "executeBatch" => flushed.incrementAndGet(); Array.empty[Int]
          case "setObject" => if (args(1) == null) nullsBound.incrementAndGet(); null
          case _ => null
        }
      }).asInstanceOf[PreparedStatement]

  def connection(): Connection =
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "prepareStatement" => sqls.add(args(0).asInstanceOf[String]); statement()
          case _ => null
        }
      }).asInstanceOf[Connection]
}

class JdbcUpsertSpec extends SparkSpec {

  test("upsert SQL matches the reference's ON CONFLICT DO UPDATE shape") {
    val sql = JdbcUpsert.buildUpsertSql("cards",
      Seq("id", "name", "layout"), Seq("id"))
    assert(sql ==
      "INSERT INTO cards (id, name, layout) VALUES (?, ?, ?) " +
        "ON CONFLICT (id) DO UPDATE SET name = EXCLUDED.name, layout = EXCLUDED.layout")
    assert(JdbcUpsert.buildUpsertSql("t", Seq("k1", "k2"), Seq("k1", "k2"))
      .endsWith("ON CONFLICT (k1, k2) DO NOTHING"))
  }

  test("sink binds every row and flushes in batches per partition") {
    RecordingJdbc.reset()
    val df = Tables.orders(spark, SfDir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        when(col("o_orderkey") % 5 === 0, lit(null)).otherwise(col("o_totalprice"))
          .as("o_totalprice"))
      .repartition(3)
    val n = df.count()
    val expectedNulls = df.filter(col("o_totalprice").isNull).count()
    JdbcUpsert.upsertInto(df, "orders", Seq("o_orderkey"),
      () => RecordingJdbc.connection(), batchSize = 100)
    assert(RecordingJdbc.added.get() == n)
    assert(RecordingJdbc.sqls.size() == 3) // one statement per partition
    // ceil(rows/100) flushes per partition, roughly n/100 overall
    assert(RecordingJdbc.flushed.get() >= (n / 100).toInt)
    assert(RecordingJdbc.nullsBound.get() == expectedNulls)
  }

  test("freshness decision mirrors the reference's updated_at protocol") {
    val t0 = Instant.parse("2026-01-01T00:00:00Z")
    val t1 = Instant.parse("2026-02-01T00:00:00Z")
    assert(Freshness.decide(None, t1) == Freshness.InitialLoad)
    assert(Freshness.decide(Some(t0), t1) == Freshness.Refresh)
    assert(Freshness.decide(Some(t1), t1) == Freshness.UpToDate)
    assert(Freshness.decide(Some(t1), t0) == Freshness.UpToDate)
  }

  test("bulk-type selection mirrors the reference's desired-type mapping") {
    val t = Instant.parse("2026-03-01T00:00:00Z")
    val catalog = Seq(
      Freshness.BulkEntry("oracle_cards", t, "https://example.invalid/oracle.json"),
      Freshness.BulkEntry("unique_artwork", t, "https://example.invalid/art.json"),
      Freshness.BulkEntry("all_cards", t, "https://example.invalid/all.json"))
    // verbatim match
    assert(Freshness.select("oracle_cards", catalog)
      .exists(_.downloadUri.endsWith("oracle.json")))
    // the reference's all_prints -> all_cards mapping (import_cards.py:300-307)
    assert(Freshness.select("all_prints", catalog)
      .exists(_.tpe == "all_cards"))
    // missing type errors with the USER-FACING name, like the reference
    assert(Freshness.select("default_cards", catalog) ==
      Left("default_cards bulk data not found"))
    assert(Freshness.select("all_prints", catalog.filterNot(_.tpe == "all_cards")) ==
      Left("all_prints bulk data not found"))
  }

  test("applying stub executes ON CONFLICT semantics from the statement text") {
    import graft.sources.InMemoryUpsertDb
    import spark.implicits._
    InMemoryUpsertDb.drop("t_apply")
    // two versions of key 1 IN ORDER in one partition; key 2 single
    val df = Seq((1L, "a", 10L), (1L, "b", 20L), (2L, "c", 30L))
      .toDF("id", "name", "v").coalesce(1)
    JdbcUpsert.upsertInto(df, "t_apply", Seq("id"),
      () => InMemoryUpsertDb.connection(), batchSize = 2)
    val state = InMemoryUpsertDb.tableRows("t_apply")
      .map(r => (r(0), r(1), r(2))).toSet
    assert(state == Set((1L, "b", 20L), (2L, "c", 30L)),
      s"DO UPDATE must overwrite non-key cols in replay order: $state")
    // DO NOTHING (all columns are keys): first write wins
    InMemoryUpsertDb.drop("t_nothing")
    JdbcUpsert.upsertInto(
      Seq((1L, "x"), (1L, "y")).toDF("k1", "k2").coalesce(1),
      "t_nothing", Seq("k1", "k2"),
      () => InMemoryUpsertDb.connection(), batchSize = 10)
    assert(InMemoryUpsertDb.tableRows("t_nothing").size == 2,
      "composite-key DO NOTHING: distinct tuples both insert")
  }

  test("upsert_jdbc_protocol entry: final table state equals last-per-key replay") {
    import graft.operators.MergeOps
    val got = MergeOps.qUpsertJdbcProtocol(spark, SfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val orders = Tables.orders(spark, SfDir)
    val nU = orders.filter(col("o_orderkey") % 3 === 0).count()
    val n = orders.count()
    assert(got("U")._1 == nU && got("U")._3 == nU,
      "every third order must end upserted at seq 1 with status U")
    assert(got.values.map(_._1).sum == n, "one final row per order key")
    assert(got.filterKeys(_ != "U").values.forall(_._3 == 0L),
      "non-conflicted keys must never count as upserted")
  }

  test("freshness refresh protocol: first fetch, fresh hit, stale refresh, 404, miss") {
    import graft.sources.InMemoryBulkServer
    def cat(updatedAt: String, uri: String) =
      s"""{"data":[{"type":"oracle_cards","updated_at":"2026-01-01T00:00:00Z",""" +
        s""""download_uri":"mem://p/oracle"},""" +
        s"""{"type":"all_cards","updated_at":"$updatedAt","download_uri":"$uri"}]}"""
    val server = new InMemoryBulkServer
    server.publishPayload("mem://p/v1", "{\"id\":1}\n")
    server.publishCatalog(cat("2026-01-01T00:00:00Z", "mem://p/v1"))
    val f = java.nio.file.Files.createTempDirectory("graft_fresh")
      .resolve("bulk.jsonl").toFile

    // first fetch: no local file -> InitialLoad, one download, mtime
    // pinned to the server watermark (the reference's os.utime)
    val (d1, dl1) = Freshness.refreshIfStale(spark, server, "all_prints", f)
    assert(d1 == Freshness.InitialLoad && dl1 && server.nDownloads == 1)
    assert(f.lastModified == Instant.parse("2026-01-01T00:00:00Z").toEpochMilli)
    assert(java.nio.file.Files.readString(f.toPath).contains("\"id\":1"))

    // fresh hit: mtime == updated_at -> UpToDate, download counter frozen
    val (d2, dl2) = Freshness.refreshIfStale(spark, server, "all_prints", f)
    assert(d2 == Freshness.UpToDate && !dl2 && server.nDownloads == 1)

    // stale refresh: server bumps updated_at + URI -> Refresh, replaced
    server.publishPayload("mem://p/v2", "{\"id\":2}\n")
    server.publishCatalog(cat("2026-01-02T00:00:00Z", "mem://p/v2"))
    val (d3, dl3) = Freshness.refreshIfStale(spark, server, "all_prints", f)
    assert(d3 == Freshness.Refresh && dl3 && server.nDownloads == 2)
    assert(java.nio.file.Files.readString(f.toPath).contains("\"id\":2"))
    assert(f.lastModified == Instant.parse("2026-01-02T00:00:00Z").toEpochMilli)

    // a catalog entry pointing at an unpublished URI is a loud 404
    server.publishCatalog(cat("2026-01-03T00:00:00Z", "mem://p/missing"))
    intercept[java.io.IOException] {
      Freshness.refreshIfStale(spark, server, "all_prints", f)
    }

    // a desired type absent from the catalog errors with the USER-FACING
    // name (select's contract, through the full protocol path)
    val err = intercept[RuntimeException] {
      Freshness.refreshIfStale(spark, server, "default_cards", f)
    }
    assert(err.getMessage == "default_cards bulk data not found")
  }
}
