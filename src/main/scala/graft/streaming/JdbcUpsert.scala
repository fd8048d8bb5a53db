package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed JDBC target sink for change streams.
  *
  * The reference routes each change to an ODBC DSN table with
  * /APPEND, /UPDATE=(key) and /DELETE=(key) process types (reference:
  * /root/reference/src/main/java/Main.java:477-498). The Spark-native
  * equivalent is a `foreachBatch` sink: every micro-batch of change
  * rows (op + key + values) is applied transactionally per partition
  * with prepared statements — UPDATE-then-INSERT for c/u (an upsert
  * without dialect-specific MERGE), DELETE for d.
  *
  * Scale notes: the batch is reduced to one terminal change per key
  * BEFORE touching the database (latestPerKey — one shuffle on the
  * key), so the JDBC round-trips are bounded by distinct keys, not raw
  * events; partitions write in parallel with per-partition
  * connections, the standard JDBC-sink shape. Tests drive an embedded
  * Derby (in-memory, same JVM as local executors); any JDBC URL works
  * on a cluster.
  */
object JdbcUpsert {

  /** Target-database dialect: URL template, identifier quoting, and
    * an optional NATIVE single-statement upsert. The reference
    * targets arbitrary ODBC DSNs (Main.java:477-498 builds /APPEND,
    * /UPDATE=(key), /DELETE=(key) against whatever the DSN resolves
    * to); JDBC-side the differences that matter to this sink are
    * exactly these three. UPDATE-then-INSERT remains the portable
    * fallback for engines without a native upsert (Derby, the proven
    * in-sandbox target). Native statements bind (key, values...) —
    * the same order as the portable INSERT. */
  final case class TargetDialect(
      name: String,
      urlTemplate: String,
      quote: String,
      nativeUpsert: Option[(String, String, Seq[String]) => String]) {
    def url(host: String, port: Int, db: String): String = urlTemplate
      .replace("{host}", host).replace("{port}", port.toString)
      .replace("{db}", db)
    def quoted(ident: String): String = s"$quote$ident$quote"
  }

  object TargetDialect {
    val postgresql: TargetDialect = TargetDialect("postgresql",
      "jdbc:postgresql://{host}:{port}/{db}", "\"",
      Some((t, k, vs) =>
        s"INSERT INTO $t ($k, ${vs.mkString(", ")}) " +
          s"VALUES (?${", ?" * vs.size}) ON CONFLICT ($k) DO UPDATE SET " +
          vs.map(v => s"$v = EXCLUDED.$v").mkString(", ")))
    val mysql: TargetDialect = TargetDialect("mysql",
      "jdbc:mysql://{host}:{port}/{db}", "`",
      Some((t, k, vs) =>
        s"INSERT INTO $t ($k, ${vs.mkString(", ")}) " +
          s"VALUES (?${", ?" * vs.size}) ON DUPLICATE KEY UPDATE " +
          vs.map(v => s"$v = VALUES($v)").mkString(", ")))
    val sqlite: TargetDialect = TargetDialect("sqlite",
      "jdbc:sqlite:{db}", "\"",
      Some((t, k, vs) =>
        s"INSERT INTO $t ($k, ${vs.mkString(", ")}) " +
          s"VALUES (?${", ?" * vs.size}) ON CONFLICT ($k) DO UPDATE SET " +
          vs.map(v => s"$v = excluded.$v").mkString(", ")))
    // Derby (the embedded test target) and SQL Server: no portable
    // single-statement upsert wired — the UPDATE-then-INSERT fallback
    // applies (SQL Server's MERGE needs HOLDLOCK discipline that does
    // not belong in a generic sink)
    val derby: TargetDialect = TargetDialect("derby",
      "jdbc:derby:memory:{db};create=true", "\"", None)
    val sqlserver: TargetDialect = TargetDialect("sqlserver",
      "jdbc:sqlserver://{host}:{port};databaseName={db}", "\"", None)

    val byName: Map[String, TargetDialect] =
      Seq(postgresql, mysql, sqlite, derby, sqlserver)
        .map(d => d.name -> d).toMap
  }

  /** One terminal change per key: latest (ts, tiebreak) wins. Keeps
    * deletes — the apply step needs them to issue DELETEs. */
  def latestPerKey(batch: DataFrame, keyCol: String,
      orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(desc(orderCol))
    batch.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Apply a reduced batch of change rows to a keyed JDBC table.
    * Expected columns: `op` (c|u|d), the key, and `valueCols`. Row
    * effects: c/u → UPDATE, INSERT when no row matched; d → DELETE.
    * Each partition runs in ONE transaction (commit at the end), so a
    * failed task leaves the target untouched and a Spark retry is
    * safe (the statements are idempotent per key). */
  def applyBatch(batch: DataFrame, url: String, table: String,
      keyCol: String, valueCols: Seq[String],
      dialect: Option[TargetDialect] = None): Unit = {
    val cols = Seq("op", keyCol) ++ valueCols
    val upsertSql = dialect.flatMap(_.nativeUpsert)
      .map(f => f(table, keyCol, valueCols))
    batch.select(cols.map(col): _*).foreachPartition { it: Iterator[Row] =>
      if (it.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(url)
        var stmts = List.empty[java.sql.PreparedStatement]
        try {
          conn.setAutoCommit(false)
          val setExpr = valueCols.map(c => s"$c = ?").mkString(", ")
          val upd = conn.prepareStatement(
            s"UPDATE $table SET $setExpr WHERE $keyCol = ?")
          val ins = conn.prepareStatement(upsertSql.getOrElse(
            s"INSERT INTO $table ($keyCol, ${valueCols.mkString(", ")}) " +
              s"VALUES (?${", ?" * valueCols.size})"))
          val del = conn.prepareStatement(
            s"DELETE FROM $table WHERE $keyCol = ?")
          stmts = List(upd, ins, del)
          it.foreach { r =>
            val op = r.getString(0)
            val key = r.get(1)
            if (op == "d") {
              del.setObject(1, key)
              del.executeUpdate()
            } else if (upsertSql.isDefined) {
              // native upsert: one round-trip per change
              ins.setObject(1, key)
              valueCols.indices.foreach(i => ins.setObject(i + 2, r.get(i + 2)))
              ins.executeUpdate()
            } else {
              valueCols.indices.foreach(i => upd.setObject(i + 1, r.get(i + 2)))
              upd.setObject(valueCols.size + 1, key)
              if (upd.executeUpdate() == 0) {
                ins.setObject(1, key)
                valueCols.indices.foreach(i => ins.setObject(i + 2, r.get(i + 2)))
                ins.executeUpdate()
              }
            }
          }
          conn.commit()
        } catch {
          // an explicit rollback, not just close(): close-with-open-
          // transaction is implementation-defined in JDBC (some drivers
          // COMMIT the partial batch), which would break the retry-
          // safety contract above
          case e: Throwable =>
            try conn.rollback()
            catch { case s: java.sql.SQLException => e.addSuppressed(s) }
            throw e
        } finally {
          stmts.foreach(s =>
            try s.close() catch { case _: java.sql.SQLException => () })
          conn.close()
        }
      }
    }
  }

  /** foreachBatch adapter: reduce to the terminal change per key, then
    * apply — `stream.writeStream.foreachBatch(JdbcUpsert.sink(url,
    * table, key, order, values)).start()`. */
  def sink(url: String, table: String, keyCol: String, orderCol: String,
      valueCols: Seq[String],
      dialect: Option[TargetDialect] = None): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) =>
      applyBatch(latestPerKey(batch, keyCol, orderCol),
        url, table, keyCol, valueCols, dialect)
}
