package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source-database extraction: query-driven, range-partitioned JDBC read
  * (reference: utils/extract_data/load_with_query_python.py — the job
  * that pulls BigMagic source tables into the raw layer by splitting
  * [MIN(pc), MAX(pc)] into N ranges and issuing one range query per
  * worker thread).
  *
  * Spark-first shape: the partitioning the reference hand-rolls with
  * threads IS Spark's JDBC partitioned scan — `spark.read.jdbc(url,
  * table, column, lo, hi, n, props)` plans one range query per
  * partition, executed by executors, not the driver. The extraction
  * query (columns + joins, :348) and business filter (FILTER_EXP, :352)
  * ride in a derived-table subquery, so the source engine evaluates them
  * inside each range scan; Spark pushes later `.filter`s down into the
  * generated SQL too (PushedFilters in the scan node — gate-checked in
  * JdbcExtractSpec).
  *
  * At 100 TB-source scale the bound probe stays O(1) (one MIN/MAX row)
  * and each executor holds one range's rows — numPartitions is the
  * memory/parallelism dial, exactly like the reference's NUMBER_THREADS.
  */
object JdbcExtract {

  /** One extraction, mirroring the reference's table_data config:
    * `query` is the full SELECT (columns, source table, JOIN_EXPR);
    * `filter` the optional FILTER_EXP; `boundsProbeFilter` the probe's
    * extra predicate (the reference pins `pc <> 0` — BigMagic uses 0 as
    * a null-date sentinel that would wreck the range split). Explicit
    * `bounds` skip the probe (re-extraction with known ranges). */
  final case class Extract(query: String,
                           partitionColumn: Option[String] = None,
                           numPartitions: Int = 8,
                           filter: Option[String] = None,
                           bounds: Option[(Long, Long)] = None,
                           boundsProbeFilter: Option[String] = None)

  /** The derived-table subquery Spark's JDBC relation scans. */
  private def subquery(e: Extract): String = {
    val where = e.filter.map(f => s" WHERE ($f)").getOrElse("")
    s"(SELECT * FROM (${e.query}) q$where) graft_extract"
  }

  /** MIN/MAX probe query (reference :310), as a one-row derived table.
    * Every predicate is parenthesized individually before AND-joining —
    * an OR inside one must not rebind against its neighbors. */
  def boundsQuery(e: Extract, pc: String): String = {
    val preds = (e.boundsProbeFilter.toSeq ++ e.filter.toSeq).map(f => s"($f)")
    val where = if (preds.isEmpty) "" else preds.mkString(" WHERE ", " AND ", "")
    s"(SELECT MIN($pc) AS lo, MAX($pc) AS hi FROM (${e.query}) q$where) graft_bounds"
  }

  private def probeBounds(spark: SparkSession, url: String,
                          props: Properties, e: Extract,
                          pc: String): (Long, Long) = {
    val row = spark.read.jdbc(url, boundsQuery(e, pc), props).collect()
      .headOption.getOrElse(throw new IllegalStateException(
        s"bounds probe returned no row for $pc"))
    require(!row.isNullAt(0) && !row.isNullAt(1),
      s"bounds probe found no rows (MIN/MAX of $pc is NULL) — " +
        "pass explicit bounds or widen the probe filter")
    def asLong(v: Any): Long = v match {
      case n: Number => n.longValue()
      case other => other.toString.toLong
    }
    (asLong(row.get(0)), asLong(row.get(1)))
  }

  /** Run the extraction. Partitioned when `partitionColumn` is set
    * (bounds auto-probed unless given); a single-stream read otherwise —
    * the reference's NUMBER_THREADS=1 path. */
  def read(spark: SparkSession, url: String, props: Properties,
           e: Extract): DataFrame =
    e.partitionColumn match {
      case None => spark.read.jdbc(url, subquery(e), props)
      case Some(pc) =>
        val (lo, hi) = e.bounds.getOrElse(probeBounds(spark, url, props, e, pc))
        // Spark's range split: N-1 half-open strides plus unbounded first/
        // last partitions, so MIN and MAX rows are always captured — the
        // invariant the reference hand-patches with its max_val+1 (:338)
        spark.read.jdbc(url, subquery(e), pc, lo, hi, e.numPartitions, props)
    }

  /** Sampled extraction: the dialect's first-N pagination over the full
    * filtered select, as a derived table for `spark.read.jdbc` — a
    * preview/validation read that never full-scans the source (Oracle
    * ROWNUM wrap, SQL Server TOP, MySQL LIMIT). */
  def sampleQuery(e: Extract, d: JdbcDialect, n: Int): String = {
    require(n > 0, "sample size must be positive")
    val where = e.filter.map(f => s" WHERE ($f)").getOrElse("")
    s"(${d.firstN(s"SELECT * FROM (${e.query}) q$where", n)}) graft_sample"
  }

  /** Build an [[Extract]] from one row of the reference's table
    * configuration (utils/load_dynamodb/datalake_tables_bigmagic.csv —
    * the per-table record load_with_query_python.py reads from
    * DynamoDB): COLUMNS is the select list (ID_COLUMN prepended `as id`
    * when present, :345), SOURCE_SCHEMA.SOURCE_TABLE + JOIN_EXPR form
    * the FROM clause (:348), FILTER_EXP is the standing business filter
    * (:352), and FILTER_COLUMN is the incremental date predicate with
    * `{0}`/`{1}` placeholders bound to the load window (:357). The
    * bounds probe keeps the reference's `pc <> 0` null-date sentinel
    * guard (:310). */
  def fromTableConfig(cfg: Map[String, String],
                      partitionColumn: Option[String] = None,
                      numPartitions: Int = 8,
                      window: Option[(String, String)] = None,
                      dialect: Option[JdbcDialect] = None): Extract = {
    def get(k: String): String = cfg.getOrElse(k, "").trim
    require(get("COLUMNS").nonEmpty && get("SOURCE_TABLE").nonEmpty,
      "table config needs COLUMNS and SOURCE_TABLE")
    val cols =
      if (get("ID_COLUMN").nonEmpty) s"${get("ID_COLUMN")} as id, ${get("COLUMNS")}"
      else get("COLUMNS")
    val from = (if (get("SOURCE_SCHEMA").nonEmpty)
      s"${get("SOURCE_SCHEMA")}.${get("SOURCE_TABLE")}" else get("SOURCE_TABLE")) +
      (if (get("JOIN_EXPR").nonEmpty) s" ${get("JOIN_EXPR")}" else "")
    // the window boundaries render as typed literals when the endpoint's
    // dialect and the table's FILTER_TYPE are known (the reference's
    // change_date_format, load_with_query_python.py:379-404: Oracle
    // TO_DATE/TO_TIMESTAMP, SQL Server CONVERT, epoch for BIGINT)
    val typedWindow = window.map { case (lo, hi) =>
      (dialect, get("FILTER_TYPE")) match {
        case (Some(d), ft) if ft.nonEmpty => (d.dateLiteral(ft, lo), d.dateLiteral(ft, hi))
        case _ => (lo, hi)
      }
    }
    val incremental = (get("FILTER_COLUMN"), typedWindow) match {
      case ("", _) | (_, None) => None
      case (f, Some((lo, hi))) if f.contains("{0}") =>
        // explicit placeholder form
        Some(f.replace("{0}", lo).replace("{1}", hi))
      case (f, Some((lo, hi))) if f.contains(",") =>
        // the reference's dual-column form (FILTER_COLUMN "a,b",
        // get_query_for_date_range:368-373): either column in-window
        val Array(a, b) = f.split(",", 2).map(_.trim)
        Some(s"($a IS NOT NULL AND $a BETWEEN $lo AND $hi) OR " +
          s"($b IS NOT NULL AND $b BETWEEN $lo AND $hi)")
      case (f, Some((lo, hi))) =>
        // bare column (get_query_for_date_range:375-377)
        Some(s"$f IS NOT NULL AND $f BETWEEN $lo AND $hi")
    }
    // parenthesize each predicate before AND-joining: an OR inside
    // FILTER_EXP must not swallow the incremental window by precedence
    val preds = (Option(get("FILTER_EXP")).filter(_.nonEmpty).toSeq ++
      incremental).map(p => s"($p)")
    Extract(
      query = s"SELECT $cols FROM $from",
      partitionColumn = partitionColumn,
      numPartitions = numPartitions,
      filter = if (preds.isEmpty) None else Some(preds.mkString(" AND ")),
      boundsProbeFilter = partitionColumn.map(pc => s"$pc <> 0"))
  }
}
