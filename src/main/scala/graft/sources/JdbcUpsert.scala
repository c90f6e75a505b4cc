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
