package graft.sources

import java.util.Properties
import com.fasterxml.jackson.databind.ObjectMapper
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
  private val mapper = new ObjectMapper()

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
        // revoked grants all propagate. Scope: the reference serves
        // Redshift (Postgres family) — Oracle's ambiguous 42000 for
        // ORA-00942 is deliberately NOT classified as missing; an Oracle
        // target would need a vendor-aware probe injected by the caller.
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

  // ------------------------------------------------------- staged bulk load

  /** A staged bulk load: part files + the COPY manifest naming exactly
    * those files, plus the COPY statement the warehouse runs. */
  final case class StagedLoad(manifestPath: String, files: Seq[String],
                              copySql: String)

  /** CSV conventions for the staged files — explicit and symmetric with
    * [[readStaged]], mirroring the connector's defaults (pipe-delimited
    * gzip CSV, `\N` nulls). */
  private val csvOptions = Map(
    "sep" -> "|", "nullValue" -> "\\N", "header" -> "false",
    "compression" -> "gzip", "escape" -> "\"", "quote" -> "\"",
    "timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Stage `df` for a warehouse bulk COPY — the reference's actual load
    * path (common_jobs_functions.py:450–573 rides the Redshift
    * connector, which unloads to staged files and issues a COPY; the
    * JDBC row insert in [[load]] is the small-dim fallback). The shape:
    *
    *   1. `df` is written as gzipped pipe-delimited CSV part files under
    *      `stagingDir` (one file per partition — the parallel-ingest unit
    *      a warehouse COPY fans out over);
    *   2. a COPY MANIFEST (the public Redshift manifest format:
    *      `{"entries":[{"url":..., "mandatory":true}]}`) lists exactly the
    *      staged part files, so the warehouse loads all-or-nothing and a
    *      stale file lingering in the staging prefix can never leak in;
    *   3. the returned COPY statement targets the manifest. The caller
    *      runs it through its connection (injected in tests — there is no
    *      live warehouse in the sandbox), after the usual delete
    *      preaction.
    *
    * Columns are projected in a stable declared order because COPY binds
    * CSV fields positionally — the column list is emitted into the COPY
    * statement for self-description. */
  /** The staging prefix is a LOCAL-FILESYSTEM scope by design: part
    * discovery lists the directory directly (the warehouse-side object
    * store upload is the caller's transport concern, reflected only in
    * `urlPrefix`). Identifiers and paths are validated/encoded rather
    * than trusted: the manifest is built with a JSON serializer and the
    * table name must be a plain (optionally schema-qualified)
    * identifier so neither can smuggle quotes into the COPY SQL. */
  private val tableIdent = """[A-Za-z_][A-Za-z0-9_$]*(\.[A-Za-z_][A-Za-z0-9_$]*)?""".r

  def stageForCopy(df: DataFrame, table: String, stagingDir: String,
                   urlPrefix: String = ""): StagedLoad = {
    require(tableIdent.matches(table),
      s"stageForCopy: '$table' is not a plain [schema.]table identifier")
    df.write.mode(SaveMode.Overwrite).options(csvOptions)
      .csv(stagingDir)
    val staged = {
      val d = new java.io.File(stagingDir)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.startsWith("part-"))
        .map(_.getAbsolutePath).sorted.toSeq
    }
    require(staged.nonEmpty, s"stageForCopy: no part files under $stagingDir")
    // JSON-encode via Jackson: urls containing quotes/backslashes/etc.
    // must produce a valid manifest, not a broken one
    val root = mapper.createObjectNode()
    val arr = root.putArray("entries")
    staged.foreach { p =>
      val e = arr.addObject()
      e.put("url", s"$urlPrefix$p")
      e.put("mandatory", true)
    }
    val manifest = mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
    val manifestPath = s"$stagingDir/manifest.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(manifestPath),
      manifest.getBytes("UTF-8"))
    val cols = df.columns.mkString("(", ", ", ")")
    val manifestUrl = s"$urlPrefix$manifestPath".replace("'", "''")
    val copy = s"COPY $table $cols FROM '$manifestUrl' " +
      "MANIFEST FORMAT CSV DELIMITER '|' NULL AS '\\N' GZIP " +
      "TIMEFORMAT 'auto';"
    StagedLoad(manifestPath, staged, copy)
  }

  /** Read staged part files back with the same conventions (round-trip
    * verification / a local warehouse stand-in). */
  def readStaged(spark: org.apache.spark.sql.SparkSession,
                 stagingDir: String,
                 schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.options(csvOptions).schema(schema)
      .csv(s"$stagingDir/part-*")

  /** Full staged-load flow: delete preaction (existence-probed), then the
    * manifest COPY — both through the injected statement runner. */
  def bulkLoad(df: DataFrame, table: String, stagingDir: String,
               filters: Seq[(String, Seq[Any])] = Nil,
               tableExists: String => Boolean = _ => true,
               urlPrefix: String = "")
              (runStatement: String => Unit): StagedLoad = {
    val staged = stageForCopy(df, table, stagingDir, urlPrefix)
    effectivePreaction(table, filters, tableExists).foreach(runStatement)
    runStatement(staged.copySql)
    staged
  }
}
