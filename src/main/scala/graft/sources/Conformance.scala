package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.operators.{Keys, Periods}

/** Config-driven column conformance — the reference's declarative
  * spec -> transform dispatch (reference:
  * code/redshift/loadt_stage_to_redshift.py:40-133 `transform_default` /
  * `transform_convert_fecha_bigmagic` / `transform_convert_hora_bigmagic` /
  * `transform_get_date` / `transform_column`, driven by the
  * stage_columns_to_load.csv metadata rows at :169-187).
  *
  * Each target column is declared as (source column | literal, target
  * type, function); the interpreter compiles the declaration list to ONE
  * `select` of Catalyst expressions — so a conformed table is added by
  * writing metadata, not code, and the whole conformance stays inside
  * whole-stage codegen (no UDFs, no per-column passes; the reference's
  * sequential `withColumn` loop builds the same projection less directly).
  *
  * The function vocabulary is the reference's four, plus the conformance
  * idioms its domain jobs hand-write per table (t_venta.py:25-165 /
  * dim_cliente.py): surrogate keys, trim+upper normalization, coalesce
  * defaulting, negative-flag derivation. With those declared, a dim build
  * like q3's is pure metadata (spec-pinned bit-equal in ConformanceSpec).
  */
object Conformance {
  /** One declared target column (mirrors a stage_columns_to_load.csv row:
    * COLUMNA_DESTINO, COLUMNA, TIPO_DATO_DESTINO, LITERAL_DESTINO,
    * FUNCION). `source` may be a comma list for multi-column functions
    * (surrogate). Empty function = "default", like the reference. */
  final case class Col(
      target: String,
      source: String = "",
      targetType: String = "string",
      literal: String = "",
      function: String = "default")

  /** Redshift-vocabulary type names -> Spark cast targets (reference:
    * transform_default's dispatch incl. numeric(p,s) parsing; smallint
    * deliberately widens to int exactly as the reference does). */
  def sparkType(t: String): String = {
    val lt = t.trim.toLowerCase
    lt match {
      case "varchar" | "varchar varying" | "character varying" | "text" |
           "character" | "string" => "string"
      case "integer" | "int" | "smallint" => "int"
      case "bigint" | "long" => "bigint"
      case "boolean" => "boolean"
      case "double precision" | "double" | "float" => "double"
      case "date" => "date"
      case "timestamp" => "timestamp_ntz"
      case n if n.startsWith("numeric") || n.startsWith("decimal") =>
        if (n.contains("(") && n.contains(")"))
          "decimal(" + n.substring(n.indexOf('(') + 1, n.indexOf(')')) + ")"
        else "decimal(38,12)" // reference default precision
      case other => other
    }
  }

  /** transform_default's value rule: a non-empty literal wins over the
    * source column; the literal "null" means SQL NULL. */
  private def defaultValue(c: Col): Column =
    if (c.literal != null && c.literal.nonEmpty) {
      if (c.literal.equalsIgnoreCase("null")) lit(null) else lit(c.literal)
    } else col(c.source)

  /** Cast only when a target type is declared — the transcribed reference
    * jobs contain bare `col(...)` select entries with no cast, which must
    * keep their incoming type (a forced string cast would diverge). */
  private def castDeclared(col: Column, targetType: String): Column =
    if (targetType == null || targetType.trim.isEmpty) col
    else col.cast(sparkType(targetType))

  /** Compile one declaration to its Catalyst expression. `today` is the
    * injected clock for get_date (the reference reads Lima now; injection
    * keeps runs deterministic and testable). */
  def compile(c: Col, today: String = "1970-01-01"): Column = {
    val out = c.function.trim.toLowerCase match {
      case "" | "default" if c.source.endsWith(".*") && c.literal.isEmpty =>
        return col(c.source) // qualified star select: no cast, no alias
      case "" | "default"
          if c.literal.isEmpty && c.targetType.trim.isEmpty &&
            c.source.nonEmpty && c.source.split('.').last == c.target =>
        // bare uncast column select: keep the attribute untouched so its
        // QUALIFIER survives (pyspark select(col("tv.x")) leaves later
        // col("tv.x") references resolvable; an alias would strip that)
        return col(c.source)
      case "" | "default" =>
        castDeclared(defaultValue(c), c.targetType)
      // ---- free-form Spark-SQL expression (the transcription fallback for
      // select entries outside the declared vocabulary; `source` holds the
      // SQL, already cast where the reference cast)
      case "expr" =>
        expr(c.source)
      case "convert_fecha_bigmagic" =>
        Periods.toMagic(col(c.source)).cast(sparkType(c.targetType))
      case "convert_hora_bigmagic" =>
        Periods.toMagicHora(col(c.source)).cast(sparkType(c.targetType))
      case "get_date" =>
        val d = to_date(lit(today))
        sparkType(c.targetType) match {
          case "string" => date_format(d, "yyyyMMdd")
          case "int" | "bigint" =>
            date_format(d, "yyyyMMdd").cast(sparkType(c.targetType))
          case "date" => d
          case "timestamp_ntz" => d.cast("timestamp_ntz")
          case other => date_format(d, "yyyyMMdd").cast(other)
        }
      // ---- domain-job conformance idioms, declared instead of hand-written
      case "surrogate" => // concat_ws("|", ...) over the comma-listed sources
        Keys.surrogate(c.source.split(",").map(s => col(s.trim)).toIndexedSeq: _*)
      case "upper_trim" =>
        upper(trim(col(c.source))).cast(sparkType(c.targetType))
      case "coalesce_default" => // null-defaulting with the declared literal
        Keys.orDefault(col(c.source), c.literal).cast(sparkType(c.targetType))
      case "flag_negative" => // 1 when source < 0 else 0
        when(col(c.source) < 0, lit(1)).otherwise(lit(0)).cast(IntegerType)
      case other =>
        throw new IllegalArgumentException(s"unknown conform function: $other")
    }
    out.as(c.target)
  }

  /** Conform `df` to exactly the declared columns, in declaration order —
    * one projection, no sequential withColumn passes. */
  def conform(df: DataFrame, cols: Seq[Col], today: String = "1970-01-01"): DataFrame =
    df.select(cols.map(c => compile(c, today)): _*)

  /** Load declarations from a `;`-separated CSV artifact shaped like the
    * reference's stage_columns_to_load.csv:
    * `table;target_column;source;target_type;literal;function;ordinal`.
    * Returns per-table declaration lists in ordinal order. */
  def fromCsv(spark: SparkSession, path: String): Map[String, Seq[Col]] = {
    val rows = spark.read.option("sep", ";").option("header", "true").csv(path)
      .select("table", "target_column", "source", "target_type", "literal",
        "function", "ordinal")
      .collect()
    rows.groupBy(_.getString(0)).map { case (t, rs) =>
      t -> rs.sortBy(_.getString(6).toInt).map { r =>
        Col(r.getString(1),
          Option(r.getString(2)).getOrElse(""),
          Option(r.getString(3)).getOrElse("string"),
          Option(r.getString(4)).getOrElse(""),
          Option(r.getString(5)).filter(_.nonEmpty).getOrElse("default"))
      }.toSeq
    }
  }
}
