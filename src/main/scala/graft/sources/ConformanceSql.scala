package graft.sources

import graft.sources.ConformanceJobs._

/** Renders a transcribed reference job — with its full dependency
  * closure (stage synthesis + upstream domain jobs) — as ONE DuckDB SQL
  * query, so the conformance twins are value-checkable through the
  * existing oracle gate (driver: oracle SQL must be runnable by DuckDB
  * over the same testdata parquet).
  *
  * Two halves:
  *   - a structural renderer (steps -> chained CTE subqueries) that
  *     mirrors ConformanceRunner's op semantics exactly: joins before
  *     the projection live in one SELECT level, post-projection ops wrap
  *     the level, groupBy closes a level with GROUP BY, the
  *     orderBy+dropDuplicates idiom becomes QUALIFY row_number() = 1,
  *     unions are positional (UNION ALL) or BY NAME;
  *   - a dialect translator (Spark SQL -> DuckDB) for the bounded
  *     function vocabulary the transcription uses: date_format->strftime,
  *     to_date->TRY_CAST, add_months->to_months interval, datediff->
  *     date_diff (args swapped), concat->|| (NULL-propagating, matching
  *     Spark), split->string_split_regex, element_at->list_extract,
  *     STRING->VARCHAR / TIMESTAMP_NTZ->TIMESTAMP cast tokens.
  */
object ConformanceSql {
  import ConformanceRunner.Params

  // ---------------------------------------------------------------- dialect

  private val fmtMap = Seq(
    "yyyyMMdd" -> "%Y%m%d", "yyyyMM" -> "%Y%m",
    "yyyy-MM-dd HH:mm:ss" -> "%Y-%m-%d %H:%M:%S",
    "yyyy-MM-dd" -> "%Y-%m-%d")

  /** Paren-aware rewrite of every `fn(...)` call in `sql`. */
  private def rewriteCalls(sql: String, fn: String,
                           render: Seq[String] => String): String = {
    val lower = sql.toLowerCase
    val pat = fn.toLowerCase + "("
    val i = {
      // find a call site that is not part of a longer identifier
      var at = lower.indexOf(pat)
      while (at > 0 && (lower.charAt(at - 1).isLetterOrDigit ||
             lower.charAt(at - 1) == '_')) at = lower.indexOf(pat, at + 1)
      at
    }
    if (i < 0) return sql
    // split args at depth-0 commas
    var depth = 1
    var j = i + pat.length
    val args = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inStr = false
    while (depth > 0) {
      val c = sql.charAt(j)
      if (inStr) { cur.append(c); if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true; cur.append(c)
        case '(' => depth += 1; cur.append(c)
        case ')' =>
          depth -= 1; if (depth > 0) cur.append(c)
        case ',' if depth == 1 => args += cur.toString.trim; cur.clear()
        case other => cur.append(other)
      }
      j += 1
    }
    if (cur.nonEmpty) args += cur.toString.trim
    val replaced = sql.substring(0, i) +
      render(args.toSeq.map(a => rewriteAll(a))) + sql.substring(j)
    rewriteCalls(replaced, fn, render) // next occurrence
  }

  private def mapFmt(quoted: String): String =
    fmtMap.foldLeft(quoted) { case (s, (j, d)) => s.replace(j, d) }

  private def rewriteAll(sql: String): String = {
    var s = sql
    s = rewriteCalls(s, "date_format",
      a => s"strftime(${a(0)}, ${mapFmt(a(1))})")
    s = rewriteCalls(s, "to_date", a =>
      if (a.length == 1) s"TRY_CAST(${a(0)} AS DATE)"
      else s"CAST(try_strptime(CAST(${a(0)} AS VARCHAR), ${mapFmt(a(1))}) AS DATE)")
    s = rewriteCalls(s, "to_timestamp", a =>
      if (a.length == 1) s"TRY_CAST(${a(0)} AS TIMESTAMP)"
      else s"try_strptime(CAST(${a(0)} AS VARCHAR), ${mapFmt(a(1))})")
    s = rewriteCalls(s, "add_months",
      a => s"(${a(0)} + to_months(CAST(${a(1)} AS INT)))")
    s = rewriteCalls(s, "datediff",
      a => s"date_diff('day', ${a(1)}, ${a(0)})")
    s = rewriteCalls(s, "coalesce", a =>
      "__COAL__(" + a.map(x =>
        if (x.matches("[0-9]+")) s"'$x'" else x).mkString(", ") + ")")
    s = rewriteCalls(s, "element_at",
      a => s"list_extract(${a(0)}, ${a(1)})")
    s = rewriteCalls(s, "split", a => {
      val lit = "^'\\\\\\\\(.)'$".r
      a(1) match {
        case lit(c) => s"string_split(${a(0)}, '$c')"
        case _      => s"string_split_regex(${a(0)}, ${a(1)})"
      }
    })
    // concat -> || chain (Spark concat returns NULL on any NULL arg;
    // DuckDB's concat() skips NULLs, || propagates them)
    s = rewriteCalls(s, "concat_ws", a => s"__CWS__(${a.mkString(", ")})")
    s = rewriteCalls(s, "concat", a => "(" + a.mkString(" || ") + ")")
    s = s.replace("__CWS__(", "concat_ws(")
    s = s.replace("__COAL__(", "coalesce(")
    s
  }

  /** Full dialect translation of one SQL fragment or statement. */
  def toDuck(sql: String): String =
    rewriteAll(sql)
      .replaceAll("(?i)AS STRING\\)", "AS VARCHAR)")
      .replaceAll("(?i)AS TIMESTAMP_NTZ\\)", "AS TIMESTAMP)")

  // ------------------------------------------------------------- structure

  private def bind(sql: String, p: Params): String = {
    val periods = p.periods.map(x => s"'$x'").mkString(", ")
    sql.replace("__PERIODS__", periods).replace("__TODAY__", p.today)
  }

  private def colSql(c: Conformance.Col): String = {
    def cast(e: String) =
      if (c.targetType.trim.isEmpty) e
      else s"CAST($e AS ${sqlType(c.targetType)})"
    c.function match {
      case "default" if c.source.endsWith(".*") => c.source
      case "default" if c.literal.nonEmpty =>
        val v = if (c.literal.equalsIgnoreCase("null")) "NULL"
                else s"'${c.literal.replace("'", "''")}'"
        s"${cast(v)} AS ${c.target}"
      case "default" => s"${cast(c.source)} AS ${c.target}"
      case "expr"    => s"${c.source} AS ${c.target}"
      case other =>
        throw new IllegalArgumentException(s"conformance sql: fn $other")
    }
  }

  private def sqlType(t: String): String = t.trim.toLowerCase match {
    case "string" => "STRING"
    case "int" | "integer" | "smallint" => "INT"
    case "bigint" | "long" => "BIGINT"
    case "date" => "DATE"
    case "timestamp" => "TIMESTAMP"
    case "double" | "float" => "DOUBLE"
    case "boolean" => "BOOLEAN"
    case d if d.startsWith("decimal") || d.startsWith("numeric") =>
      if (d.contains("(")) "DECIMAL" + d.substring(d.indexOf('('))
      else "DECIMAL(38,12)"
    case other => other.toUpperCase
  }

  /** Remove `alias.` qualifiers from identifier positions only: the
    * expression is split at single-quoted string literals first, and the
    * replacement runs on the non-quoted segments — a literal like
    * 'tv.total' must survive an alias named tv verbatim. */
  private[graft] def stripQuals(e: String, aliases: Set[String]): String = {
    val live = aliases.filter(_.nonEmpty)
    if (live.isEmpty) return e
    // split keeping the quoted literals as their own segments ('' stays
    // inside one literal segment per SQL escaping)
    val seg = "'(?:[^']|'')*'".r
    val sb = new StringBuilder
    var last = 0
    def stripped(s: String): String = live.foldLeft(s) { (x, a) =>
      x.replaceAll(s"\\b${java.util.regex.Pattern.quote(a)}\\.", "")
    }
    seg.findAllMatchIn(e).foreach { m =>
      sb.append(stripped(e.substring(last, m.start))).append(m.matched)
      last = m.end
    }
    sb.append(stripped(e.substring(last)))
    sb.toString
  }

  /** Render one step as a SQL query over already-rendered refs.
    * `refSql` maps a runner ref (src:var or step name) to a FROM-able
    * SQL identifier (a CTE name). */
  /** Best-effort select-list column names of a rendered SQL (used to
    * detect withColumn shadowing); None when a star select defeats it. */
  def selectColumns(sql: String): Option[Seq[String]] = {
    val body = sql.linesIterator.mkString(" ")
    val sel = body.indexOf("SELECT ")
    val from = body.indexOf(" FROM ")
    if (sel < 0 || from < sel) return None
    var items = List.empty[String]
    var depth = 0; val cur = new StringBuilder; var inStr = false
    body.substring(sel + 7, from).foreach { c =>
      if (inStr) { cur.append(c); if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true; cur.append(c)
        case '(' => depth += 1; cur.append(c)
        case ')' => depth -= 1; cur.append(c)
        case ',' if depth == 0 => items ::= cur.toString; cur.clear()
        case o => cur.append(o)
      }
    }
    items ::= cur.toString
    val names = items.reverse.map(_.trim.stripPrefix("DISTINCT").trim).map { it =>
      if (it.contains("*")) return None
      val asIdx = it.toUpperCase.lastIndexOf(" AS ")
      val raw = if (asIdx >= 0) it.substring(asIdx + 4).trim
                else it.split('.').last.trim
      if (raw.matches("[A-Za-z_][A-Za-z0-9_]*")) raw else return None
    }
    Some(names)
  }

  private def renderStep(job: Job, step: Step, refSql: String => String,
                         refOrder: String => Seq[String],
                         refCols: String => Option[Seq[String]],
                         p: Params,
                         exact: Int => Option[ExactDecimalSql.ExactOp])
      : (String, Seq[String], Option[Seq[String]]) = {
    var from = ""                      // FROM ... JOIN ... fragment
    val wheres = scala.collection.mutable.ArrayBuffer[String]()
    var cur: String = null             // closed level SQL
    var closed = false
    var aliases = Set[String]()
    var pendingOrder: Seq[String] = Seq.empty
    var outCols: Option[Seq[String]] = None
    // aliases bound by THIS step's FROM/JOINs (valid SQL names here)
    val bound: Set[String] = step.ops.collect {
      case From(_, a) if a.nonEmpty => a
      case Join(_, a, _, _, _) if a.nonEmpty => a
    }.toSet
    // every alias any step of the job binds: a Spark attribute KEEPS its
    // qualifier across steps (select(col("tv.x")) stays tv.x-resolvable
    // downstream), but in SQL a CTE's column is just x — strip foreign
    // qualifiers wherever they leak into this step's expressions
    val jobAliases: Set[String] = job.steps.flatMap(_.ops.collect {
      case From(_, a) if a.nonEmpty => a
      case Join(_, a, _, _, _) if a.nonEmpty => a
    }).toSet
    def stripForeign(e: String): String = stripQuals(e, jobAliases -- bound)

    def close(selectList: Seq[String], groupBy: Seq[String] = Nil): Unit = {
      val w = if (wheres.isEmpty) "" else "\nWHERE " + wheres.mkString("\n  AND ")
      val g = if (groupBy.isEmpty) "" else "\nGROUP BY " + groupBy.mkString(", ")
      val base = if (closed) s"(\n$cur\n)" else from
      cur = s"SELECT ${selectList.mkString(",\n       ")}\nFROM $base$w$g"
      wheres.clear()
      closed = true
    }
    def wrap(sel: String, tail: String = ""): Unit = {
      require(closed, s"${job.name}/${step.name}: wrap before projection")
      cur = s"SELECT $sel\nFROM (\n$cur\n)$tail"
    }
    def strip(e: String): String =
      if (closed) stripQuals(stripForeign(e), aliases) else stripForeign(e)

    // splice an exact-decimal template (ConformanceExact) in place of the
    // string-dialect rendering of a projection/aggregation op: the
    // template is already DuckDB SQL (toDuck-invariant by construction)
    // and closes the level exactly like close() would
    def closeExact(t: ExactDecimalSql.ExactOp): Unit = {
      val w = if (wheres.isEmpty) ""
              else "WHERE " + wheres.mkString("\n  AND ")
      val base = if (closed) s"(\n$cur\n)" else from
      cur = t.template.replace("__BASE__", base).replace("__WHERE__", w)
      wheres.clear()
      closed = true
      outCols = Some(t.targets)
      pendingOrder = Seq.empty
    }

    step.ops.zipWithIndex.foreach { case (op0, opIdx) => (op0, exact(opIdx)) match {
      case (Select(_) | GroupBy(_, _), Some(t)) => closeExact(t)
      case (op, _) => op match {
      case From(r, alias) =>
        from = refSql(r) + (if (alias.nonEmpty) s" AS $alias" else "")
        aliases += alias
        pendingOrder = refOrder(r)
        outCols = refCols(r)
      case Join(r, alias, jt, on, using) =>
        require(!closed, s"${job.name}/${step.name}: join after projection")
        aliases += alias
        val rhs = refSql(r) + (if (alias.nonEmpty) s" AS $alias" else "")
        val kw = jt.toLowerCase match {
          case "inner" | ""           => "JOIN"
          case "left" | "left_outer"  => "LEFT JOIN"
          case "right" | "right_outer" => "RIGHT JOIN"
          case "full" | "outer"       => "FULL JOIN"
          case "left_anti" | "anti"   => "ANTI JOIN"
          case "left_semi" | "semi"   => "SEMI JOIN"
          case other => throw new IllegalArgumentException(other)
        }
        from += (if (using.nonEmpty)
          s"\n$kw $rhs USING (${using.mkString(", ")})"
        else s"\n$kw $rhs ON ${stripForeign(bind(on.get, p))}")
        if (!Set("left_semi", "semi", "left_anti", "anti")(jt.toLowerCase))
          outCols = None // joined width unknown (semi/anti keep the left)
      case Filter(e) if e.startsWith("__SEMI__") =>
        val m = "__SEMI__ (\\S+) IN (\\S+)\\.(\\S+)".r.findFirstMatchIn(e).get
        val cond = s"${m.group(1)} IN (SELECT ${m.group(3)} FROM stage_${m.group(2)})"
        if (closed) wrap("*", s"\nWHERE ${stripQuals(cond, aliases)}")
        else wheres += cond
      case Filter(e) =>
        if (closed) wrap("*", s"\nWHERE ${strip(bind(e, p))}")
        else wheres += stripForeign(bind(e, p))
      case Select(cols) =>
        val sels = cols.map(c => strip(bind(colSql(c), p)))
        close(sels)
        outCols =
          if (cols.exists(_.source.endsWith(".*"))) None
          else Some(cols.map(_.target))
        pendingOrder = Seq.empty
      case GroupBy(keys, aggs) =>
        val bkeys = keys.map(k => strip(bind(k, p)))
        val groupExprs = bkeys.map(k =>
          k.split("(?i) AS ")(0).trim)
        close(bkeys ++ aggs.map(c => strip(bind(colSql(c), p))), groupExprs)
        outCols = {
          val keyNames = bkeys.map { k =>
            val ai = k.toUpperCase.lastIndexOf(" AS ")
            if (ai >= 0) k.substring(ai + 4).trim else k.split('.').last.trim
          }
          if (keyNames.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")))
            Some(keyNames ++ aggs.map(_.target))
          else None
        }
        pendingOrder = Seq.empty
      case WithColumn(n, e) =>
        // Spark withColumn REPLACES an existing column of the same name;
        // SELECT *, expr AS n would instead yield two columns and later
        // references would bind to the stale one — EXCLUDE the shadowed
        // column when the tracked schema proves it exists
        val shadowed = outCols.exists(_.exists(_.equalsIgnoreCase(n)))
        val star = if (shadowed) s"* EXCLUDE ($n)" else "*"
        if (closed) wrap(s"$star, ${strip(bind(e, p))} AS $n")
        else close(Seq(star, s"${stripForeign(bind(e, p))} AS $n"))
        if (!shadowed) outCols = outCols.map(_ :+ n)
      case UnionOp(r, byName) =>
        if (!closed) close(Seq("*"))
        val kw = if (byName) "UNION ALL BY NAME" else "UNION ALL"
        cur = s"($cur)\n$kw\n(SELECT * FROM ${refSql(r)})"
      case Distinct =>
        if (!closed) close(Seq("*"))
        cur = s"SELECT DISTINCT *\nFROM (\n$cur\n)"
      case DropDuplicates(subset) =>
        if (!closed) close(Seq("*"))
        if (subset.isEmpty) cur = s"SELECT DISTINCT *\nFROM (\n$cur\n)"
        else {
          val ord = if (pendingOrder.nonEmpty) pendingOrder
                    else subset // arbitrary but deterministic-enough tiebreak
          cur = s"SELECT *\nFROM (\n$cur\n)\nQUALIFY row_number() OVER " +
            s"(PARTITION BY ${subset.mkString(", ")} ORDER BY ${ord.mkString(", ")}) = 1"
        }
        pendingOrder = Seq.empty
      case OrderBy(keys) =>
        pendingOrder = keys
      }
    }}
    if (!closed) close(Seq("*"))
    (cur, pendingOrder, outCols)
  }

  /** Render `jobName` (and its whole dependency closure) as a single
    * DuckDB query over the testdata tables. `finalSelect` projects the
    * job's output for the gate (cast normalization). `exactOps` carries
    * ConformanceExact's exact-decimal templates for ops whose string
    * rendering could not hash-match (decimal rescale arithmetic). */
  def render(jobName: String, finalSelect: Seq[String],
             p: Params = Params(),
             exactOps: Map[(String, String, Int), ExactDecimalSql.ExactOp] =
               Map.empty): String = {
    val closure = scala.collection.mutable.LinkedHashSet[String]()
    def visit(name: String): Unit = {
      val j = ConformanceJobs.byName(name)
      j.dependencies.foreach { case (_, dep) => visit(dep) }
      closure += name
    }
    visit(jobName)
    // stage tables needed by the closure (in StageSynth declaration order
    // so stage-on-stage references resolve)
    val neededStage = closure.toSeq.flatMap(n =>
      ConformanceJobs.byName(n).stageTables).toSet
    val stageClosure = scala.collection.mutable.LinkedHashSet[String]()
    def visitStage(t: String): Unit =
      StageSynth.sql.find(_._1 == t).foreach { case (_, sql) =>
        "stage_([a-z0-9_]+)".r.findAllMatchIn(sql).map(_.group(1))
          .foreach(visitStage)
        stageClosure += t
      }
    StageSynth.sql.map(_._1).filter(neededStage).foreach(visitStage)

    val ctes = scala.collection.mutable.ArrayBuffer[(String, String)]()
    stageClosure.foreach { t =>
      ctes += s"stage_$t" -> StageSynth.sql.find(_._1 == t).get._2
    }
    val stageCols: Map[String, Option[Seq[String]]] =
      stageClosure.map(t =>
        t -> selectColumns(StageSynth.sql.find(_._1 == t).get._2
          .linesIterator.map(_.dropWhile(c => c == ' ' || c == '|'))
          .mkString("\n"))).toMap
    val jobCols = scala.collection.mutable.Map[String, Option[Seq[String]]]()
    closure.foreach { name =>
      val job = ConformanceJobs.byName(name)
      val srcByVar = job.sources.map(s => s.varName -> s).toMap
      val stepOrder = scala.collection.mutable.Map[String, Seq[String]]()
      val stepCols = scala.collection.mutable.Map[String, Option[Seq[String]]]()
      def refSql(r: String): String =
        if (r.startsWith("src:")) {
          val s = srcByVar(r.substring(4))
          if (s.layer == "BIGMAGIC") s"stage_${s.name}" else s"job_${s.name}"
        } else s"step_${name}_$r"
      def refOrder(r: String): Seq[String] =
        if (r.startsWith("src:")) Seq.empty
        else stepOrder.getOrElse(r, Seq.empty)
      def refCols(r: String): Option[Seq[String]] =
        if (r.startsWith("src:")) {
          val s = srcByVar(r.substring(4))
          if (s.layer == "BIGMAGIC") stageCols.getOrElse(s.name, None)
          else jobCols.getOrElse(s.name, None)
        } else stepCols.getOrElse(r, None)
      job.steps.foreach { st =>
        val (sql, pending, cols) = renderStep(job, st, refSql, refOrder,
          refCols, p, idx => exactOps.get((name, st.name, idx)))
        if (pending.nonEmpty) stepOrder(st.name) = pending
        stepCols(st.name) = cols
        ctes += s"step_${name}_${st.name}" -> sql
      }
      jobCols(name) = stepCols.getOrElse(job.result, None)
      ctes += s"job_$name" -> s"SELECT * FROM step_${name}_${job.result}"
    }
    val withClause = ctes.map { case (n, sql) =>
      s"$n AS (\n${sql.linesIterator.map("  " + _).mkString("\n")}\n)"
    }.mkString("WITH ", ",\n", "\n")
    val fin = finalSelect.mkString(",\n       ")
    toDuck(s"$withClause SELECT $fin FROM job_$jobName")
  }
}
