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

  /** Load `df` into `table`, first running the preaction on the connection.
    * `runStatement` is injected so tests (and non-JDBC targets) can
    * intercept; production passes a thunk that executes over java.sql. */
  def load(df: DataFrame, url: String, table: String, props: Properties,
           filters: Seq[(String, Seq[Any])] = Nil)
          (runStatement: String => Unit): Unit = {
    deletePreaction(table, filters).foreach(runStatement)
    df.write.mode(SaveMode.Append).jdbc(url, table, props)
  }
}
