package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Warehouse serving writer: JDBC load with delete-by-partition preactions.
  *
  * The reference deletes the (pais, periodo) slice in Redshift before
  * loading the refreshed slice (reference: artifacts/aws-glue/layer/
  * common_jobs_functions.py:450-533 `load_to_redshift`) — idempotent
  * partition-scoped replace on an engine without MERGE-on-load. The SQL
  * generation is pure and unit-testable; the write itself is standard
  * Spark JDBC (batched, partitioned by the DataFrame's partitions).
  */
object JdbcServing {
  /** SQL literal for a filter value, typed like the reference's
    * numeric/date filters (common_jobs_functions.py:511-573): numbers and
    * booleans render unquoted so an int-typed warehouse column is compared
    * as an int, not coerced from a string; dates render as ISO literals;
    * everything else is a single-quote-escaped string. */
  def sqlLiteral(v: Any): String = v match {
    case null => "NULL"
    case n @ (_: Byte | _: Short | _: Int | _: Long | _: Float | _: Double |
              _: Boolean) => n.toString
    case n: java.math.BigDecimal => n.toPlainString
    case n: BigDecimal => n.underlying.toPlainString
    case d: java.time.LocalDate => s"DATE '$d'"
    case d: java.sql.Date => s"DATE '$d'"
    case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
    case s => s"'${s.toString.replace("'", "''")}'"
  }

  /** DELETE preaction for the partition slice being loaded; None when no
    * filters (full-append semantics), like the reference's `select 1`. */
  def deletePreaction(table: String, filters: Seq[(String, Seq[Any])]): Option[String] = {
    val active = filters.filter(_._2.nonEmpty)
    if (active.isEmpty) None
    else Some(active.map { case (c, vs) =>
      s"$c IN (${vs.map(sqlLiteral).mkString(", ")})"
    }.mkString(s"DELETE FROM $table WHERE ", " AND ", ";"))
  }

  /** Preaction actually executed, modeling the reference's existence
    * probe (common_jobs_functions.py:511–549): before deleting, the
    * loader probes `SELECT 1 FROM table LIMIT 1`; when the probe fails
    * (first-ever load — the table doesn't exist yet) the DELETE is
    * replaced by the no-op `select 1;` so the load still proceeds.
    * Filterless loads keep None (plain append, no probe needed). */
  def effectivePreaction(table: String, filters: Seq[(String, Seq[Any])],
                         tableExists: String => Boolean): Option[String] =
    deletePreaction(table, filters).map { del =>
      if (tableExists(table)) del else "select 1;"
    }

  /** The reference's probe as a reusable thunk: a 1-row JDBC read of the
    * target that returns false on any failure. `probeSql` is
    * engine-specific (`LIMIT 1` on Redshift — the default — vs `FETCH
    * FIRST 1 ROWS ONLY` on Derby/DB2). The literal needs an alias:
    * Spark re-selects the probe's column BY NAME, and a bare `1` makes
    * that generated identifier unparseable on strict engines. */
  def probeViaJdbc(spark: org.apache.spark.sql.SparkSession, url: String,
                   props: Properties,
                   probeSql: String => String =
                     t => s"(SELECT 1 AS one FROM $t LIMIT 1) graft_probe")
                  : String => Boolean =
    table =>
      try { spark.read.jdbc(url, probeSql(table), props).collect(); true }
      catch {
        // Only a missing-object answer may become `false`: returning
        // false on ANY other failure would silently swap the DELETE
        // preaction for the no-op `select 1` and double-load the slice
        // once the condition clears. That includes permission errors —
        // class 42 ALSO holds 42501 (Postgres insufficient_privilege) /
        // 42000 (MySQL access denied), so only the object-not-found
        // states qualify: 42P01 (Postgres undefined_table), 42S02
        // (MySQL/ODBC base table not found), 42704 (DB2/Derby undefined
        // name), 42X05 (Derby table does not exist), S0002 (legacy
        // base-table-not-found). Connection errors, timeouts, auth, and
        // revoked grants all propagate.
        case t: Throwable =>
          val missingStates = Set("42P01", "42S02", "42704", "42X05", "S0002")
          val missing = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
            .collectFirst { case s: java.sql.SQLException => s }
            .flatMap(s => Option(s.getSQLState))
            .exists(missingStates.contains)
          if (missing) false else throw t
      }

  /** Load `df` into `table`, first running the preaction on the connection.
    * `runStatement` and `tableExists` are injected so tests (and non-JDBC
    * targets) can intercept; production passes java.sql thunks
    * ([[probeViaJdbc]] for the probe). */
  def load(df: DataFrame, url: String, table: String, props: Properties,
           filters: Seq[(String, Seq[Any])] = Nil,
           tableExists: String => Boolean = _ => true)
          (runStatement: String => Unit): Unit = {
    effectivePreaction(table, filters, tableExists).foreach(runStatement)
    df.write.mode(SaveMode.Append).jdbc(url, table, props)
  }
}
