package graft.sources

import java.sql.{Connection, PreparedStatement}
import org.apache.spark.sql.{DataFrame, Row}

/** Keyed-UPSERT relational sink — the reference's exact write protocol
  * (`INSERT ... ON CONFLICT (id) DO UPDATE SET col = EXCLUDED.col` over
  * batches, /root/reference/import_cards.py:214-225) re-expressed as a
  * Spark `foreachPartition` sink.
  *
  * Design: each executor partition opens one connection and flushes
  * `batchSize`-row prepared-statement batches (the reference uses 10k).
  * The SQL builder is pure and unit-tested ([[JdbcUpsertSpec]]); the
  * connection plumbing takes a connection factory so tests can inject a
  * recording stub — no database is required to validate the protocol.
  */
object JdbcUpsert {

  /** Build the ON CONFLICT upsert statement for a row of `cols` keyed by
    * `keys` (reference import_cards.py:218-223 builds the same string from
    * its column list). */
  def buildUpsertSql(table: String, cols: Seq[String], keys: Seq[String]): String = {
    require(keys.nonEmpty && keys.forall(cols.contains), "keys must be a subset of cols")
    val updatable = cols.filterNot(keys.contains)
    val updates =
      if (updatable.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " + updatable.map(c => s"$c = EXCLUDED.$c").mkString(", ")
    s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${keys.mkString(", ")}) $updates"
  }

  /** Stream a DataFrame into a relational table with upsert semantics.
    * One connection per partition, batched execution, batch flush every
    * `batchSize` rows — the scale-safe JDBC write shape (no driver-side
    * collect, parallelism = partition count). */
  def upsertInto(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      connectionFactory: () => Connection,
      batchSize: Int = 10000): Unit = {
    val cols = df.columns.toSeq
    val sql = buildUpsertSql(table, cols, keys)
    df.foreachPartition { (rows: Iterator[Row]) =>
      val conn = connectionFactory()
      try {
        val st = conn.prepareStatement(sql)
        var pending = 0
        rows.foreach { row =>
          bindRow(st, row)
          st.addBatch()
          pending += 1
          if (pending >= batchSize) { st.executeBatch(); pending = 0 }
        }
        if (pending > 0) st.executeBatch()
        ()
      } finally conn.close()
    }
  }

  /** Bind one Row's values positionally (setObject lets the JDBC driver
    * coerce Spark's external types, mirroring psycopg2's adaptation). */
  private def bindRow(st: PreparedStatement, row: Row): Unit = {
    var i = 0
    while (i < row.length) {
      st.setObject(i + 1, if (row.isNullAt(i)) null else row.get(i))
      i += 1
    }
  }
}

/** An APPLYING in-memory implementation of the upsert contract — the
  * stand-in for the external Postgres the reference writes to
  * (import_cards.py:214-225). Unlike the recording stub in
  * JdbcUpsertSpec (which only counts calls), this one PARSES the
  * prepared `INSERT ... ON CONFLICT` statement and executes its
  * semantics against a JVM-shared table map, so the driver-contract
  * entry [[graft.operators.MergeOps.qUpsertJdbcProtocol]] can
  * hash-gate the whole foreachPartition + batched-statement protocol
  * end to end: statement text, positional binding, batch cadence, and
  * conflict resolution all have to be right for the final table state
  * to match the oracle.
  *
  * The JVM-static map models the EXTERNAL shared store: in production
  * every executor's connection reaches the same database; under
  * local[n] every executor thread reaches this map. Rows within a
  * partition apply in addBatch order (a list buffer per statement),
  * which is exactly the sequential-replay guarantee a single JDBC
  * connection gives the reference. */
object InMemoryUpsertDb {
  import java.lang.reflect.{InvocationHandler, Method, Proxy}
  import scala.jdk.CollectionConverters._

  /** table -> key-tuple -> row values (in statement column order). */
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.ConcurrentHashMap[Seq[Any], Array[Any]]]()

  def drop(table: String): Unit = { tables.remove(table); () }

  def tableRows(table: String): Seq[Seq[Any]] =
    Option(tables.get(table)).fold(Seq.empty[Seq[Any]])(
      _.values.asScala.map(_.toSeq).toSeq)

  private val upsertRe =
    ("""INSERT INTO (\S+) \(([^)]*)\) VALUES \([?, ]*\) """ +
      """ON CONFLICT \(([^)]*)\) (DO NOTHING|DO UPDATE SET (.*))""").r

  private def applyBatch(sql: String, batch: Seq[Array[Any]]): Unit = sql match {
    case upsertRe(table, colsCsv, keysCsv, action, setList) =>
      val cols = colsCsv.split(", ").toSeq
      val keyIdx = keysCsv.split(", ").toSeq.map(cols.indexOf)
      require(keyIdx.forall(_ >= 0), s"conflict keys not in column list: $sql")
      val updIdx =
        if (action == "DO NOTHING") Seq.empty
        else setList.split(", ").toSeq.map { a =>
          val Array(l, r) = a.split(" = ")
          require(r == s"EXCLUDED.$l", s"non-EXCLUDED update in: $sql")
          cols.indexOf(l)
        }
      val t = tables.computeIfAbsent(table,
        _ => new java.util.concurrent.ConcurrentHashMap[Seq[Any], Array[Any]]())
      batch.foreach { vals =>
        val key = keyIdx.map(vals(_)).toSeq
        t.merge(key, vals, (old, nw) => {
          if (updIdx.isEmpty) old
          else { val out = old.clone(); updIdx.foreach(i => out(i) = nw(i)); out }
        })
        ()
      }
    case _ => throw new IllegalArgumentException(s"unparseable upsert statement: $sql")
  }

  private def statement(sql: String): java.sql.PreparedStatement = {
    val pending = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
    var current = scala.collection.mutable.HashMap.empty[Int, Any]
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[java.sql.PreparedStatement]),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "setObject" =>
              current(args(0).asInstanceOf[Integer].intValue) = args(1); null
            case "addBatch" =>
              val n = if (current.isEmpty) 0 else current.keys.max
              pending += Array.tabulate(n)(i => current.getOrElse(i + 1, null))
              current = scala.collection.mutable.HashMap.empty[Int, Any]
              null
            case "executeBatch" =>
              applyBatch(sql, pending.toSeq); pending.clear()
              Array.empty[Int]
            case _ => null
          }
      }).asInstanceOf[java.sql.PreparedStatement]
  }

  def connection(): Connection =
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "prepareStatement" => statement(args(0).asInstanceOf[String])
            case _ => null
          }
      }).asInstanceOf[Connection]
}
