package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types._

/** Renders a RESOLVED Catalyst projection / aggregation as DuckDB SQL
  * that replays Spark's decimal arithmetic bit-exactly.
  *
  * Why: the reference's fact jobs (t_venta_detalle.py, fact_cliente_venta
  * .py, fact_kpi_detalle.py) chain numeric(38,12) multiplies/divides.
  * Spark (ANSI off, allowPrecisionLoss) computes each arithmetic node
  * EXACTLY and then rounds HALF_UP to the node's result scale, returning
  * NULL on precision-38 overflow and on divide-by-zero — semantics pinned
  * empirically in ExactDecimalSpec. DuckDB's native decimal ops instead
  * promote to DOUBLE (division always; multiplication when widths exceed
  * 38), so a string-level dialect translation of these jobs can never
  * hash-match. This renderer replays Spark's semantics in DuckDB HUGEINT
  * (int128) arithmetic: every decimal value is carried as its unscaled
  * integer at the scale Catalyst assigned, rescales are
  * round-half-away-from-zero integer divisions, and results materialize
  * back to true DECIMAL(p,s) columns at step boundaries via canonical
  * string formatting (exact both ways).
  *
  * Layout: expression trees are flattened into let-bound columns across
  * nested SELECT layers (one binding per arithmetic node), so rendered
  * SQL size stays linear in tree size — naive inlining would repeat the
  * numerator of every rounding division 3x per nesting level. Layer 1
  * hoists every attribute reference (decimal attrs as their unscaled
  * extraction), so all higher layers reference only generated names and
  * `SELECT *` star-carry is unambiguous even over multi-join bases.
  *
  * Exactness envelope (documented, spec-smoked in ExactDecimalSpec):
  * Spark's Decimal ops compute under MathContext.DECIMAL128 — 34
  * significant digits — before the rescale, and this replay is exact
  * (unbounded) integer arithmetic, so the two agree as long as every
  * exact intermediate holds <= 34 significant digits: integer digits +
  * (s1+s2) <= 34 per multiply, quotient digits + result scale <= 34 per
  * divide. With the lake's scales (6..24) that bounds values at ~1e9,
  * three orders of magnitude above the synthesized lake's largest money
  * amounts. int128 intermediates past ~1.7e38 fail LOUDLY (DuckDB
  * overflow error), never silently.
  */
object ExactDecimalSql {

  /** (precision, scale) extractor (DecimalType.Fixed is private[sql]). */
  private object Dec {
    def unapply(dt: DataType): Option[(Int, Int)] = dt match {
      case d: DecimalType => Some((d.precision, d.scale))
      case _ => None
    }
  }

  /** One rendered op template. `__BASE__` / `__WHERE__` are substituted
    * by ConformanceSql.renderStep with the step's FROM fragment and
    * pending WHERE clause. */
  final case class ExactOp(template: String, targets: Seq[String])

  /** Attribute-rendering context: aliases bound by the current step's
    * FROM/JOIN ops. A resolved attribute keeps stale upstream qualifiers
    * across projections, so only qualifiers this step actually bound
    * render as `alias.col`; everything else is a bare CTE column. */
  final case class Ctx(boundAliases: Set[String])

  // ------------------------------------------------------------ helpers

  private def pow10(k: Int): String = {
    require(k >= 0 && k <= 38, s"pow10($k)")
    ("1" + "0" * k) + "::HUGEINT"
  }

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Rendered value: `sql` is plain DuckDB SQL for non-decimal nodes and
    * the unscaled-HUGEINT representation for decimal nodes; `layer` is
    * the highest binding layer it references (0 = literals only). */
  private final case class R(sql: String, layer: Int)

  private final class Emitter(prefix: String) {
    final case class B(name: String, sql: String, layer: Int)
    val binds = mutable.ArrayBuffer[B]()
    private val attrCache = mutable.Map[Long, R]()
    def add(sql: String, layer: Int): R = {
      val n = s"__$prefix${binds.size}"
      val l = math.max(layer, 1) // layer 0 = literal-only; emit with L1
      binds += B(n, sql, l)
      R(n, l)
    }
    def attr(id: Long)(mk: => R): R = attrCache.getOrElseUpdate(id, mk)
    /** Bind unless already a bare generated/bare name (cheap to repeat). */
    def name(r: R): R =
      if (r.sql.matches("[A-Za-z_][A-Za-z0-9_.]*")) r else add(r.sql, r.layer)
    def maxLayer: Int = if (binds.isEmpty) 0 else binds.map(_.layer).max
  }

  /** Round-half-away-from-zero division of bound names (Spark HALF_UP). */
  private def roundDivSql(n: String, d: String): String =
    s"(CASE WHEN $d = 0 THEN NULL ELSE " +
      s"(CASE WHEN ($n < 0) != ($d < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * " +
      s"((2::HUGEINT * abs($n) + abs($d)) // (2::HUGEINT * abs($d))) END)"

  /** changePrecision overflow: NULL when |unscaled| >= 10^p (ANSI off). */
  private def checkSql(x: String, p: Int): String =
    if (p >= 39) x
    else s"(CASE WHEN abs($x) >= ${pow10(p)} THEN NULL ELSE $x END)"

  /** Canonical fixed-scale decimal STRING of an unscaled name (the ||
    * chain NULL-propagates like Spark). */
  private def fmtString(h: String, s: Int): String =
    if (s == 0)
      s"(CASE WHEN $h < 0 THEN '-' ELSE '' END || CAST(abs($h) AS VARCHAR))"
    else
      s"(CASE WHEN $h < 0 THEN '-' ELSE '' END || CAST(abs($h) // ${pow10(s)} AS VARCHAR)" +
        s" || '.' || lpad(CAST(abs($h) % ${pow10(s)} AS VARCHAR), $s, '0'))"

  /** DECIMAL(p,s) materialization via the canonical string (exact both
    * engines — string->decimal parses the unscaled integer verbatim). */
  private def fmtDecimal(h: String, p: Int, s: Int): String =
    s"CAST(${fmtString(h, s)} AS DECIMAL($p,$s))"

  /** Unscaled-HUGEINT extraction from a true DECIMAL column reference
    * (DuckDB prints decimals at fixed scale, so dropping the dot IS the
    * unscaled integer; NULL-safe). */
  private def extract(ref: String): String =
    s"CAST(replace(CAST($ref AS VARCHAR), '.', '') AS HUGEINT)"

  private def duckType(dt: DataType): String = dt match {
    case StringType => "VARCHAR"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case ShortType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "FLOAT"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case other => throw unsupported(s"duckType $other")
  }

  private val fmtMap = Seq(
    "yyyyMMdd" -> "%Y%m%d", "yyyyMM" -> "%Y%m",
    "yyyy-MM-dd HH:mm:ss" -> "%Y-%m-%d %H:%M:%S",
    "yyyy-MM-dd" -> "%Y-%m-%d")

  private def unsupported(what: String) =
    new IllegalArgumentException(s"ExactDecimalSql: unsupported $what")

  // --------------------------------------------------------- expressions

  /** Does this resolved tree contain decimal arithmetic that DuckDB's
    * native decimal typing cannot replay (rescale-rounding ops)? */
  def needsExact(e: Expression): Boolean = e.exists {
    case b @ (_: Multiply | _: Divide | _: Add | _: Subtract | _: Remainder)
      if b.dataType.isInstanceOf[DecimalType] => true
    case u: UnaryMinus if u.dataType.isInstanceOf[DecimalType] => true
    case c: Cast => (c.child.dataType, c.dataType) match {
      // narrowing scale rounds (HALF_UP) — DuckDB's native cast must not
      // be trusted to round identically; widening is exact natively
      case (Dec(_, s1), Dec(_, s2)) => s2 < s1
      case _ => false
    }
    case _ => false
  }

  private def decScale(e: Expression): Int = e.dataType match {
    case Dec(_, s) => s
    case other => throw unsupported(s"expected decimal, got $other in ${e.sql}")
  }

  /** Core renderer. Decimal-typed nodes return unscaled-HUGEINT SQL at
    * their Catalyst scale; everything else returns plain DuckDB SQL.
    * `aggCtx`, when set, routes AggregateExpression operands to the
    * pre-agg emitter and registers agg calls (see renderAggregate). */
  private final class Render(em: Emitter, ctx: Ctx,
                             aggCtx: Option[AggCtx] = None) {

    def rx(e: Expression): R =
      // In agg-output position, any subtree equal to a grouping
      // expression reads the grouped column (Spark resolves agg outputs
      // the same way).
      aggCtx.flatMap(_.groupMatch(e)).getOrElse(rx0(e))

    private def rx0(e: Expression): R = e match {
      case a: AttributeReference =>
        if (aggCtx.isDefined)
          throw unsupported(
            s"attribute ${a.name} in aggregate output is not a grouping column")
        attrRef(a)

      case Alias(child, _) => rx(child)

      case l: Literal => literal(l)

      case c: Cast => cast(c)

      case m: Multiply if m.dataType.isInstanceOf[DecimalType] =>
        val Dec(p, s) = m.dataType: @unchecked
        val (s1, s2) = (decScale(m.left), decScale(m.right))
        val a = em.name(rx(m.left)); val b = em.name(rx(m.right))
        val prod = R(s"(${a.sql} * ${b.sql})", math.max(a.layer, b.layer))
        val scaled = rescale(prod, s1 + s2, s)
        R(checkSql(em.name(scaled).sql, p), scaled.layer)

      case d: Divide if d.dataType.isInstanceOf[DecimalType] =>
        val Dec(p, s) = d.dataType: @unchecked
        val (s1, s2) = (decScale(d.left), decScale(d.right))
        val a = em.name(rx(d.left)); val b = em.name(rx(d.right))
        // value = (a/10^s1)/(b/10^s2); at scale s the unscaled result is
        // round(a * 10^(s+s2-s1) / b)
        val k = s + s2 - s1
        val num =
          if (k >= 0) em.name(R(s"(${a.sql} * ${pow10(k)})", a.layer))
          else a
        val den =
          if (k >= 0) b
          else em.name(R(s"(${b.sql} * ${pow10(-k)})", b.layer))
        val q = em.add(roundDivSql(num.sql, den.sql),
          math.max(num.layer, den.layer) + 1)
        R(checkSql(q.sql, p), q.layer)

      case ad: Add if ad.dataType.isInstanceOf[DecimalType] =>
        addSub(ad.left, ad.right, "+", ad.dataType)
      case sb: Subtract if sb.dataType.isInstanceOf[DecimalType] =>
        addSub(sb.left, sb.right, "-", sb.dataType)

      case u: UnaryMinus if u.dataType.isInstanceOf[DecimalType] =>
        val c = rx(u.child); R(s"(- ${c.sql})", c.layer)
      case u: UnaryMinus =>
        val c = rx(u.child); R(s"(- ${c.sql})", c.layer)

      // non-decimal arithmetic: int math is exact in both engines (and
      // double math bit-identical IEEE), render plainly
      case m: Multiply =>
        val l = rx(m.left); val r = rx(m.right)
        R(s"(${l.sql} * ${r.sql})", math.max(l.layer, r.layer))
      case a: Add =>
        val l = rx(a.left); val r = rx(a.right)
        R(s"(${l.sql} + ${r.sql})", math.max(l.layer, r.layer))
      case s: Subtract =>
        val l = rx(s.left); val r = rx(s.right)
        R(s"(${l.sql} - ${r.sql})", math.max(l.layer, r.layer))
      case d: Divide if d.dataType == DoubleType =>
        // Spark double division: x/0 -> Inf, not NULL; DuckDB x/0 -> NULL.
        // None of the five jobs divide doubles; fail loudly if one appears
        throw unsupported(s"double division ${d.sql}")

      case cw: CaseWhen =>
        val parts = cw.branches.map { case (pr, v) =>
          val rp = rx(pr); val rv = rx(v)
          (s"WHEN ${rp.sql} THEN ${rv.sql}", math.max(rp.layer, rv.layer))
        }
        val els = cw.elseValue.map(rx)
        val sql = "(CASE " + parts.map(_._1).mkString(" ") +
          els.map(e => s" ELSE ${e.sql}").getOrElse("") + " END)"
        R(sql, (parts.map(_._2) ++ els.map(_.layer)).max)

      case c: Coalesce =>
        val rs = c.children.map(rx)
        // parenthesize bare numeric literals: ConformanceSql.toDuck
        // string-quotes bare-integer coalesce args (a Spark-side dialect
        // fix) and must not touch these already-duck templates
        val args = rs.map(r =>
          if (r.sql.matches("[0-9]+")) s"(${r.sql})" else r.sql)
        R(s"coalesce(${args.mkString(", ")})", rs.map(_.layer).max)

      case eq: EqualTo => cmp(eq.left, eq.right, "=")
      case gt: GreaterThan => cmp(gt.left, gt.right, ">")
      case ge: GreaterThanOrEqual => cmp(ge.left, ge.right, ">=")
      case lt: LessThan => cmp(lt.left, lt.right, "<")
      case le: LessThanOrEqual => cmp(le.left, le.right, "<=")

      case a: And =>
        val l = rx(a.left); val r = rx(a.right)
        R(s"(${l.sql} AND ${r.sql})", math.max(l.layer, r.layer))
      case o: Or =>
        val l = rx(o.left); val r = rx(o.right)
        R(s"(${l.sql} OR ${r.sql})", math.max(l.layer, r.layer))
      case n: Not =>
        val c = rx(n.child); R(s"(NOT ${c.sql})", c.layer)
      case i: IsNull =>
        val c = rx(i.child); R(s"(${c.sql} IS NULL)", c.layer)
      case i: IsNotNull =>
        val c = rx(i.child); R(s"(${c.sql} IS NOT NULL)", c.layer)

      case in: In =>
        val v = rx(in.value); val xs = in.list.map(rx)
        R(s"(${v.sql} IN (${xs.map(_.sql).mkString(", ")}))",
          (v.layer +: xs.map(_.layer)).max)

      case up: Upper => val c = rx(up.child); R(s"upper(${c.sql})", c.layer)
      case lo: Lower => val c = rx(lo.child); R(s"lower(${c.sql})", c.layer)
      case t: StringTrim =>
        require(t.trimStr.isEmpty, "trim with trimStr")
        val c = rx(t.srcStr); R(s"trim(${c.sql})", c.layer)

      case cws: ConcatWs =>
        val rs = cws.children.map(rx)
        R(s"concat_ws(${rs.map(_.sql).mkString(", ")})", rs.map(_.layer).max)
      case cc: Concat =>
        val rs = cc.children.map(rx)
        R("(" + rs.map(_.sql).mkString(" || ") + ")", rs.map(_.layer).max)

      case df: DateFormatClass =>
        val c = rx(df.left)
        val fmt = df.right match {
          case Literal(v, StringType) =>
            fmtMap.collectFirst { case (j, d) if j == v.toString => d }
              .getOrElse(throw unsupported(s"date_format pattern $v"))
          case other => throw unsupported(s"dynamic date_format ${other.sql}")
        }
        R(s"strftime(${c.sql}, '$fmt')", c.layer)

      case gt: GetTimestamp =>
        // the engine under to_date/to_timestamp(x, fmt); NULL on parse
        // failure matches ANSI-off via try_strptime
        val c = rx(gt.left)
        val fmt = gt.right match {
          case Literal(v, StringType) =>
            fmtMap.collectFirst { case (j, d) if j == v.toString => d }
              .getOrElse(throw unsupported(s"gettimestamp pattern $v"))
          case other => throw unsupported(s"dynamic gettimestamp ${other.sql}")
        }
        R(s"try_strptime(CAST(${c.sql} AS VARCHAR), '$fmt')", c.layer)

      case am: AddMonths =>
        val d = rx(am.startDate); val n = rx(am.numMonths)
        R(s"(${d.sql} + to_months(CAST(${n.sql} AS INT)))",
          math.max(d.layer, n.layer))

      case dd: DateDiff =>
        val e1 = rx(dd.endDate); val e2 = rx(dd.startDate)
        R(s"date_diff('day', ${e2.sql}, ${e1.sql})", math.max(e1.layer, e2.layer))

      case ae: AggregateExpression =>
        aggCtx.getOrElse(throw unsupported("aggregate outside agg context"))
          .aggCall(ae, this)

      case rr: RuntimeReplaceable => rx(rr.replacement)

      case other =>
        throw unsupported(s"node ${other.getClass.getSimpleName}: ${other.sql}")
    }

    def attrRef(a: AttributeReference): R = em.attr(a.exprId.id) {
      val q = a.qualifier.lastOption.filter(ctx.boundAliases.contains)
      val ref = q.map(_ + ".").getOrElse("") + a.name
      a.dataType match {
        case _: DecimalType => em.add(extract(ref), 1)
        case _ => em.add(ref, 1)
      }
    }

    /** Rescale an unscaled value from `from` scale to `to` scale
      * (round-half-away on narrowing, exact widening). */
    private def rescale(r: R, from: Int, to: Int): R =
      if (from == to) r
      else if (to > from) {
        val n = em.name(r)
        R(s"(${n.sql} * ${pow10(to - from)})", n.layer)
      } else {
        val n = em.name(r)
        em.add(roundDivSql(n.sql, pow10(from - to)), n.layer + 1)
      }

    private def addSub(le: Expression, re: Expression, op: String,
                       dt: DataType): R = {
      val Dec(p, s) = dt: @unchecked
      val (s1, s2) = (decScale(le), decScale(re))
      val m = math.max(s1, s2)
      val a = rescale(em.name(rx(le)), s1, m)
      val b = rescale(em.name(rx(re)), s2, m)
      val sum = R(s"(${a.sql} $op ${b.sql})", math.max(a.layer, b.layer))
      val scaled = rescale(sum, m, s)
      R(checkSql(em.name(scaled).sql, p), scaled.layer)
    }

    private def cmp(le: Expression, re: Expression, op: String): R =
      (le.dataType, re.dataType) match {
        case (Dec(_, s1), Dec(_, s2)) =>
          val m = math.max(s1, s2)
          val a = rescale(em.name(rx(le)), s1, m)
          val b = rescale(em.name(rx(re)), s2, m)
          R(s"(${a.sql} $op ${b.sql})", math.max(a.layer, b.layer))
        case _ =>
          val a = rx(le); val b = rx(re)
          R(s"(${a.sql} $op ${b.sql})", math.max(a.layer, b.layer))
      }

    private def literal(l: Literal): R = l.dataType match {
      case Dec(_, _) =>
        if (l.value == null) R("NULL::HUGEINT", 0)
        else R(l.value.asInstanceOf[Decimal].toJavaBigDecimal
          .unscaledValue().toString + "::HUGEINT", 0)
      case NullType => R("NULL", 0)
      case _ if l.value == null => R(s"CAST(NULL AS ${duckType(l.dataType)})", 0)
      case StringType => R(sqlStr(l.value.toString), 0)
      case IntegerType | LongType | ShortType | DoubleType | BooleanType =>
        R(l.value.toString, 0)
      case DateType =>
        R(s"DATE '${java.time.LocalDate.ofEpochDay(l.value.asInstanceOf[Int].toLong)}'", 0)
      case TimestampType | TimestampNTZType =>
        val micros = l.value.asInstanceOf[Long]
        val i = java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
        val s = java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
          .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))
        R(s"TIMESTAMP '$s'", 0)
      case other => throw unsupported(s"literal of $other")
    }

    private def cast(c: Cast): R = (c.child.dataType, c.dataType) match {
      case (Dec(p1, s1), Dec(p2, s2)) =>
        val h = em.name(rx(c.child))
        val scaled = rescale(h, s1, s2)
        if (p2 < p1 + math.max(0, s2 - s1))
          R(checkSql(em.name(scaled).sql, p2), scaled.layer)
        else scaled
      case (IntegerType | LongType | ShortType, Dec(p, s)) =>
        val v = rx(c.child)
        val h = R(s"(CAST(${v.sql} AS HUGEINT)${if (s > 0) s" * ${pow10(s)}" else ""})", v.layer)
        R(checkSql(em.name(h).sql, p), h.layer)
      case (Dec(_, s), DoubleType) =>
        // direct string->double: correctly-rounded nearest in both
        // engines (matches Spark's BigDecimal.doubleValue); a DECIMAL
        // intermediate would double-round via hugeint->double / 10^s
        val h = em.name(rx(c.child))
        R(s"CAST(${fmtString(h.sql, s)} AS DOUBLE)", h.layer)
      case (Dec(_, s), StringType) =>
        // Spark prints the decimal at its full fixed scale
        val h = em.name(rx(c.child))
        R(fmtString(h.sql, s), h.layer)
      case (Dec(_, s), IntegerType | LongType) =>
        // Spark Decimal.toLong truncates toward zero
        val h = em.name(rx(c.child))
        val trunc = if (s == 0) h.sql
          else s"((CASE WHEN ${h.sql} < 0 THEN -1::HUGEINT ELSE 1::HUGEINT END) * (abs(${h.sql}) // ${pow10(s)}))"
        R(s"CAST($trunc AS ${duckType(c.dataType)})", h.layer)
      case (StringType, DateType) =>
        val v = rx(c.child); R(s"TRY_CAST(${v.sql} AS DATE)", v.layer)
      case (StringType, TimestampType | TimestampNTZType) =>
        val v = rx(c.child); R(s"TRY_CAST(${v.sql} AS TIMESTAMP)", v.layer)
      case (StringType, IntegerType | LongType | ShortType) =>
        val v = rx(c.child)
        R(s"TRY_CAST(${v.sql} AS ${duckType(c.dataType)})", v.layer)
      case (_, StringType) =>
        val v = rx(c.child); R(s"CAST(${v.sql} AS VARCHAR)", v.layer)
      case (TimestampType | TimestampNTZType, DateType) =>
        val v = rx(c.child); R(s"CAST(${v.sql} AS DATE)", v.layer)
      case (DateType, TimestampType | TimestampNTZType) =>
        val v = rx(c.child); R(s"CAST(${v.sql} AS TIMESTAMP)", v.layer)
      case (IntegerType | ShortType | LongType,
            IntegerType | ShortType | LongType | DoubleType) =>
        val v = rx(c.child)
        R(s"CAST(${v.sql} AS ${duckType(c.dataType)})", v.layer)
      case (NullType, Dec(_, _)) => R("NULL::HUGEINT", 0)
      case (NullType, _) => R(s"CAST(NULL AS ${duckType(c.dataType)})", 0)
      case (from, to) if from == to => rx(c.child)
      // session tz is pinned UTC, so tz-adjust casts are identity here
      case (TimestampType, TimestampNTZType) | (TimestampNTZType, TimestampType) =>
        rx(c.child)
      case (from, to) => throw unsupported(s"cast $from -> $to")
    }
  }

  // --------------------------------------------------------- aggregation

  /** Aggregate-context state: grouping-column mapping + registered agg
    * calls (operands rendered through the PRE-agg emitter, results read
    * by the POST-agg emitter as layer-0 names). */
  private final class AggCtx(grouping: Seq[(Expression, String)],
                             pre: Emitter, ctx: Ctx) {
    val calls = mutable.ArrayBuffer[(String, String)]() // name -> sql
    private val preRender = new Render(pre, ctx, None)

    def groupMatch(e: Expression): Option[R] =
      grouping.collectFirst { case (g, n) if g.semanticEquals(e) => R(n, 0) }

    def aggCall(ae: AggregateExpression, post: Render): R = {
      val dist = if (ae.isDistinct) "DISTINCT " else ""
      val sql = ae.aggregateFunction match {
        case s: Sum =>
          val op = pre.name(preRender.rx(s.child))
          s.dataType match {
            case Dec(_, _) => s"sum($dist${op.sql})"
            case LongType => s"CAST(sum($dist${op.sql}) AS BIGINT)"
            case DoubleType =>
              // double summation is order-dependent in BOTH engines — a
              // hash gate over it would flake; the reference keeps money
              // in decimal, so refuse rather than render a coin flip
              throw unsupported(s"order-dependent double sum ${s.sql}")
            case other => throw unsupported(s"sum of $other")
          }
        case m: Max =>
          val op = pre.name(preRender.rx(m.child)); s"max(${op.sql})"
        case m: Min =>
          val op = pre.name(preRender.rx(m.child)); s"min(${op.sql})"
        case c: Count =>
          val ops = c.children.map(ch => pre.name(preRender.rx(ch)).sql)
          s"CAST(count($dist${ops.mkString(", ")}) AS BIGINT)"
        case other =>
          throw unsupported(s"aggregate ${other.getClass.getSimpleName}")
      }
      val name = s"__agg${calls.size}"
      calls += name -> sql
      val checked = ae.aggregateFunction match {
        // Spark's decimal sum nulls on precision overflow (ANSI off)
        case s: Sum => s.dataType match {
          case Dec(p, _) => checkSql(name, p)
          case _ => name
        }
        case _ => name
      }
      R(checked, 0)
    }
  }

  // ----------------------------------------------------------- assembly

  private def layersSql(em: Emitter, base: String): String = {
    val byLayer = em.binds.groupBy(_.layer)
    val maxL = em.maxLayer
    require(maxL >= 1, "no layer-1 bindings")
    // Layer 1 is an explicit projection over the (possibly multi-join)
    // base; higher layers star-carry the unique generated names.
    var sql = s"SELECT ${byLayer(1).map(b => s"${b.sql} AS ${b.name}").mkString(",\n       ")}" +
      s"\nFROM __BASE__\n__WHERE__"
    (2 to maxL).foreach { l =>
      val bs = byLayer.getOrElse(l, mutable.ArrayBuffer.empty)
      sql = s"SELECT *,\n       ${bs.map(b => s"${b.sql} AS ${b.name}").mkString(",\n       ")}" +
        s"\nFROM (\n$sql\n)"
    }
    sql
  }

  private def outSql(ne: NamedExpression, r: R): String = ne.dataType match {
    case Dec(p, s) => s"${fmtDecimal(r.sql, p, s)} AS ${ne.name}"
    case _ => s"${r.sql} AS ${ne.name}"
  }

  /** Render a resolved projection (Project node output) as an ExactOp
    * template. */
  def renderProject(projectList: Seq[NamedExpression], ctx: Ctx): ExactOp = {
    val em = new Emitter("x")
    val render = new Render(em, ctx)
    val outs = projectList.map(ne => ne -> em.name(render.rx(ne)))
    val body = layersSql(em, "__BASE__")
    val fin = outs.map { case (ne, r) => outSql(ne, r) }.mkString(",\n       ")
    ExactOp(s"SELECT $fin\nFROM (\n$body\n)", projectList.map(_.name))
  }

  /** Render a resolved aggregation (Aggregate node) as an ExactOp
    * template: pre-agg layers -> GROUP BY -> post-agg layers -> final. */
  def renderAggregate(grouping: Seq[Expression],
                      out: Seq[NamedExpression], ctx: Ctx): ExactOp = {
    val pre = new Emitter("p")
    val preRender = new Render(pre, ctx)
    val gNamed = grouping.zipWithIndex.map { case (g, i) =>
      val r = pre.name(preRender.rx(g))
      // group keys must be bound names so the agg layer can carry them
      val bound = if (r.sql.startsWith("__")) r else pre.add(r.sql, math.max(r.layer, 1))
      (g, bound.sql)
    }
    val ac = new AggCtx(gNamed, pre, ctx)
    val post = new Emitter("q")
    val postRender = new Render(post, ctx, Some(ac))
    val outs = out.map(ne => ne -> postRender.rx(ne))

    val preBody = layersSql(pre, "__BASE__")
    val aggSel = (gNamed.map(_._2) ++ ac.calls.map { case (n, s) => s"$s AS $n" })
      .mkString(",\n       ")
    val aggBody = s"SELECT $aggSel\nFROM (\n$preBody\n)" +
      (if (gNamed.nonEmpty) s"\nGROUP BY ${gNamed.map(_._2).mkString(", ")}" else "")
    // post-agg layers (if any) star-carry over the agg output
    var body = aggBody
    val byLayer = post.binds.groupBy(_.layer)
    (1 to post.maxLayer).foreach { l =>
      val bs = byLayer.getOrElse(l, mutable.ArrayBuffer.empty)
      if (bs.nonEmpty)
        body = s"SELECT *,\n       ${bs.map(b => s"${b.sql} AS ${b.name}").mkString(",\n       ")}" +
          s"\nFROM (\n$body\n)"
    }
    val fin = outs.map { case (ne, r) => outSql(ne, r) }.mkString(",\n       ")
    ExactOp(s"SELECT $fin\nFROM (\n$body\n)", out.map(_.name))
  }
}
