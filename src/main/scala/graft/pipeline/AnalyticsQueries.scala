package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType}
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Round-3 analytics wave: SCD2 history build, grouping-set rollups,
  * pivoted measure blocks, and rank-based distribution metrics — the
  * serving-layer shapes the reference's Redshift marts compute from the
  * dimensional model (fact_* rollups, dim history, priority mixes).
  *
  * Scale shapes: every query is a single hash shuffle (one window
  * partitioning or one agg keyset); the pivot's value list is declared so
  * no distinct-scan job runs before planning; money sums stay
  * decimal-exact inside the plan and emit portable doubles.
  */
object AnalyticsQueries {
  private def dec(c: Column): Column = c.cast(DecimalType(38, 6))

  // ---------------------------------------------------------------- q42
  /** SCD2 dimension history from an ordered change feed: collapse each
    * customer's order-priority timeline to its change points, then close
    * each version with the next one's effective date (reference: the
    * update_table SCD1 merge's historical sibling — what dim history
    * would be had the reference kept validity intervals).
    *
    * Both windows ride ONE hash partitioning of o_custkey (Spark reuses
    * the Exchange across the filter), so the history build costs a single
    * shuffle regardless of version fanout. */
  def q42Scd2History(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val changes = ord
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_orderpriority"))
      .withColumn("prev", lag(col("o_orderpriority"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("o_orderpriority"))
    changes
      .withColumn("version", row_number().over(w).cast(IntegerType))
      .withColumn("vigente_hasta", lead(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey"), col("version"),
        col("o_orderpriority").as("prioridad"),
        col("o_orderdate").as("vigente_desde"), col("vigente_hasta"))
  }

  val q42Sql: String =
    """WITH ordered AS (
      |  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
      |    lag(o_orderpriority) OVER w AS prev
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |changes AS (
      |  SELECT * FROM ordered WHERE prev IS NULL OR prev <> o_orderpriority)
      |SELECT o_custkey,
      |  CAST(row_number() OVER w AS INTEGER) AS version,
      |  o_orderpriority AS prioridad,
      |  o_orderdate AS vigente_desde,
      |  lead(o_orderdate) OVER w AS vigente_hasta
      |FROM changes
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  // ---------------------------------------------------------------- q43
  /** Grouping-set rollup: revenue by (nation, year) with year subtotals
    * and a grand total in one pass (reference: the mart's drill-up views).
    * ROLLUP plans as a single Expand + one hash agg — one shuffle for all
    * three grouping levels, with map-side partial aggregation; NULL marks
    * the rolled-up level (nation names are never null in the dim). */
  def q43Rollup(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val cst = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val nat = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"))
    ord.join(cst, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nacion"),
        year(col("o_orderdate")).as("anio"), col("o_totalprice"))
      .rollup(col("nacion"), col("anio"))
      .agg(count(lit(1)).as("n_pedidos"),
        graft.operators.CurrencyMicros.toAmount(sum(
          graft.operators.CurrencyMicros.micros(col("o_totalprice")))).as("imp_total"))
  }

  val q43Sql: String =
    """SELECT nacion, anio, count(*) AS n_pedidos,
      |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS imp_total
      |FROM (
      |  SELECT n_name AS nacion, CAST(year(o_orderdate) AS INTEGER) AS anio,
      |    o_totalprice
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey)
      |GROUP BY ROLLUP (nacion, anio)""".stripMargin

  // ---------------------------------------------------------------- q44
  /** Pivoted measure block: order-priority mix per market segment as
    * columns (reference: the serving marts denormalize category mixes to
    * columns for BI). With a DECLARED value list, conditional aggregation
    * beats `DataFrame.pivot` twice over: `.pivot` plans a two-level agg
    * (an extra Exchange for the pivotfirst pass) and emits NULL for empty
    * cells, while one conditional agg is a single map-side-combined
    * shuffle and empty cells are an honest 0. */
  def q44Pivot(spark: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT" -> "n_urgente", "2-HIGH" -> "n_alta",
      "3-MEDIUM" -> "n_media", "4-NOT SPECIFIED" -> "n_sin_prioridad",
      "5-LOW" -> "n_baja")
    val ord = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderpriority"))
    val cst = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val cells = prios.map { case (value, name) =>
      count(when(col("o_orderpriority") === value, 1)).as(name)
    }
    ord.join(cst, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(cells.head, cells.tail: _*)
  }

  val q44Sql: String =
    """SELECT c_mktsegment,
      |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgente,
      |  count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_alta,
      |  count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS n_media,
      |  count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_sin_prioridad,
      |  count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_baja
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q45
  /** Rank-based distribution metrics: each customer's lifetime revenue
    * placed within their nation — percent_rank, cume_dist, and decile
    * (reference: fact_cliente_venta's ranking block). All three are exact
    * integer-rank arithmetic (single int/int divisions — no float
    * interpolation, so the oracle matches bit-for-bit; ntile ties are
    * broken by the unique custkey ordering). Two shuffles total: the
    * revenue agg on custkey, then one window partitioning on nation. */
  def q45RankDistribution(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val cst = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val revenue = ord.groupBy(col("o_custkey"))
      .agg(graft.operators.CurrencyMicros.toAmount(sum(
        graft.operators.CurrencyMicros.micros(col("o_totalprice")))).as("imp_total"))
      .join(cst, col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("imp_total").desc, col("o_custkey"))
    revenue.select(col("o_custkey"), col("c_nationkey"), col("imp_total"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume"),
      ntile(10).over(w).cast(IntegerType).as("decil"))
  }

  val q45Sql: String =
    """SELECT o_custkey, c_nationkey,
      |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS imp_total,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume,
      |  CAST(ntile(10) OVER w AS INTEGER) AS decil
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY o_custkey, c_nationkey
      |WINDOW w AS (PARTITION BY c_nationkey
      |  ORDER BY CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) DESC,
      |           o_custkey)""".stripMargin

  // ---------------------------------------------------------------- q48
  /** Keyless range join via bin bucketing: orders classified into
    * OVERLAPPING price bands (a rate-table shape — each order can match
    * several bands, no equality key exists). The naive BETWEEN join plans
    * a BroadcastNestedLoopJoin; [[graft.operators.RangeJoin.byBins]]
    * restores an equi-key by discretizing the price axis, so the plan is
    * an ordinary hash join + residual filter at O(N + bands·spanBins)
    * instead of O(N·bands). */
  def q48BandJoin(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
    val bands = spark.range(30).select(
      col("id").cast(IntegerType).as("banda"),
      (col("id") * 15000.0).as("lo"),
      (col("id") * 15000.0 + 40000.0).as("hi"))
    graft.operators.RangeJoin
      .byBins(ord, col("o_totalprice"), bands, col("lo"), col("hi"), 20000.0)
      .groupBy(col("banda"))
      .agg(count(lit(1)).as("n_pedidos"),
        graft.operators.CurrencyMicros.toAmount(sum(
          graft.operators.CurrencyMicros.micros(col("o_totalprice")))).as("imp_total"))
  }

  val q48Sql: String =
    """WITH bands AS (
      |  SELECT CAST(i AS INTEGER) AS banda, i * 15000.0 AS lo,
      |    i * 15000.0 + 40000.0 AS hi
      |  FROM range(30) t(i))
      |SELECT banda, count(*) AS n_pedidos,
      |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS imp_total
      |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice <= hi
      |GROUP BY banda""".stripMargin

  // ---------------------------------------------------------------- q50
  /** Cross-fact KPI union (reference: analytics/fact_kpi_detalle.py —
    * pedido/venta/visita branches conformed to one KPI grain and
    * unioned): three independently-aggregated sources share the
    * (kpi, id_periodo, cantidad, valor) shape and union metadata-only.
    * Each branch is one map-side-combined shuffle at its own grain; the
    * union adds none, so the whole KPI build costs three small
    * aggregations regardless of fact skew.
    *
    * Hot-loop shape (r11): the branches are pure scan-aggs, so per-row
    * cost IS the query — the period key aggregates as an integer
    * (Periods.periodKey; date_format built a string per fact row) and the
    * currency sum runs over exact long micros (operators/CurrencyMicros —
    * Spark's decimal(38,6) sum paid a per-row BigDecimal; the micros form
    * is bit-identical on currency-grid data and plain-long fast).
    * Measured at the 100× slice: 4.2 s → scan-floor. */
  def q50KpiUnion(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.{CurrencyMicros, Periods}
    def branch(df: DataFrame, dateCol: Column, amount: Column,
               kpi: String): DataFrame =
      df.groupBy(Periods.periodKey(dateCol).as("__p"))
        .agg(count(lit(1)).as("cantidad"),
          sum(CurrencyMicros.micros(amount)).as("__micros"))
        .select(lit(kpi).as("kpi"), col("__p").cast("string").as("id_periodo"),
          col("cantidad"), CurrencyMicros.toAmount(col("__micros")).as("valor"))
    val ventas = branch(Tables.orders(spark, dir),
      col("o_orderdate"), col("o_totalprice"), "ventas")
    val neto = branch(Tables.lineitem(spark, dir), col("l_shipdate"),
      col("l_extendedprice") * (lit(1.0) - col("l_discount")), "lineas_neto")
    val eventos = branch(Tables.events(spark, dir),
      col("ts"), col("value"), "eventos")
    ventas.unionByName(neto).unionByName(eventos)
  }

  val q50Sql: String =
    """SELECT 'ventas' AS kpi, strftime(o_orderdate, '%Y%m') AS id_periodo,
      |  count(*) AS cantidad,
      |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS valor
      |FROM orders GROUP BY 2
      |UNION ALL
      |SELECT 'lineas_neto', strftime(l_shipdate, '%Y%m'), count(*),
      |  CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
      |FROM lineitem GROUP BY 2
      |UNION ALL
      |SELECT 'eventos', strftime(ts, '%Y%m'), count(*),
      |  CAST(CAST(sum(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)
      |FROM events GROUP BY 2""".stripMargin

  // ---------------------------------------------------------------- q51
  /** View→purchase conversion funnel per market segment: first-touch
    * timestamps per user (one agg with conditional min — no per-step
    * scans), conversion = first purchase strictly after first view,
    * rolled up to the customer dim. Rate is one exact int/int division.
    * Two shuffles: the per-user agg and the segment rollup (dim side
    * broadcast). */
  def q51Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val firsts = ev.groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("primera_vista"),
        min(when(col("event_type") === "purchase", col("ts"))).as("primera_compra"))
      .filter(col("primera_vista").isNotNull)
    val cst = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    def rollup(joined: DataFrame): DataFrame = joined
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_vistas"),
        count(when(col("primera_compra") > col("primera_vista"), 1))
          .as("n_convertidos"))
      .withColumn("tasa_conversion",
        col("n_convertidos").cast("double") / col("n_vistas").cast("double"))
    // r10: the segment seam is one FK -> attribute against a uniquely
    // keyed dim — the forced customer broadcast re-built a multi-M-row
    // HashedRelation per action at the 100x slice (the q8 lesson), which
    // WAS q51's wall. The DimLookup string probe replaces it: the packed
    // map builds once per data fingerprint and the per-row cost is a
    // codegen'd probe; NULL result drops unmatched users exactly like
    // the inner join. Over the entry cap the builder answers None and
    // the broadcast join stays the fallback.
    graft.operators.DimLookup.forFrameString(cst, "c_custkey",
      "c_mktsegment") match {
      case Some(probe) =>
        rollup(firsts.withColumn("c_mktsegment", probe(col("user_id")))
          .filter(col("c_mktsegment").isNotNull))
      case None =>
        rollup(firsts.join(broadcast(cst), col("user_id") === col("c_custkey")))
    }
  }

  val q51Sql: String =
    """WITH f AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN ts END) AS primera_vista,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS primera_compra
      |  FROM events GROUP BY user_id)
      |SELECT c_mktsegment, count(*) AS n_vistas,
      |  count(*) FILTER (WHERE primera_compra > primera_vista) AS n_convertidos,
      |  CAST(count(*) FILTER (WHERE primera_compra > primera_vista) AS DOUBLE)
      |    / count(*) AS tasa_conversion
      |FROM f JOIN customer ON user_id = c_custkey
      |WHERE primera_vista IS NOT NULL
      |GROUP BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q52
  /** Retention cohort matrix: users grouped by first-activity month,
    * counted in each month they return. ONE pass over events: per user,
    * the first-touch min and the distinct-period set come from a single
    * aggregation (set size is bounded by the calendar, not activity), so
    * the 100 TB plan is one scan + one user-keyed shuffle + the tiny
    * cohort×period count — not the textbook two-scans-and-a-join. */
  def q52CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Periods
    val ev = Tables.events(spark, dir)
    ev.groupBy(col("user_id"))
      .agg(Periods.periodOf(min(col("ts"))).as("cohorte"),
        collect_set(Periods.periodOf(col("ts"))).as("periodos"))
      .select(col("cohorte"), explode(col("periodos")).as("periodo"))
      .groupBy(col("cohorte"), col("periodo"))
      .agg(count(lit(1)).as("n_usuarios"))
  }

  val q52Sql: String =
    """WITH c AS (
      |  SELECT user_id, strftime(min(ts), '%Y%m') AS cohorte
      |  FROM events GROUP BY user_id),
      |a AS (
      |  SELECT DISTINCT user_id, strftime(ts, '%Y%m') AS periodo FROM events)
      |SELECT cohorte, periodo, count(*) AS n_usuarios
      |FROM c JOIN a USING (user_id)
      |GROUP BY cohorte, periodo""".stripMargin

  // ---------------------------------------------------------------- q88
  /** EXACT price percentiles (p50/p90/p99) over the fact — order
    * statistics without a global sort (operators/ExactQuantile: iterative
    * histogram refinement, one bounded ≤65536-row exchange per level,
    * depth ≤ 4 on any 64-bit domain; parquet min/max pushdown prunes the
    * deeper levels' scans). The exact alternative to percentile_approx
    * when the cut-off feeds billing/SLA logic. Values in exact long
    * micros (operators/CurrencyMicros grid contract); quantile targets
    * in basis points, ranks as exact integer rationals — zero
    * floating-point ambiguity against the oracle. */
  def q88ExactQuantile(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.{CurrencyMicros, ExactQuantile}
    val micros = Tables.lineitem(spark, dir)
      .select(CurrencyMicros.micros(col("l_extendedprice")).as("x"))
    val res = ExactQuantile.quantilesBp(micros, "x", Seq(5000, 9000, 9900))
    import spark.implicits._
    res.sortBy(_._1).toDF("cuantil_bp", "valor_micros")
  }

  val q88Sql: String =
    """WITH v AS (
      |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS x
      |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
      |n AS (SELECT count(*) AS c FROM v),
      |ranked AS (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM v),
      |t(cuantil_bp) AS (VALUES (5000), (9000), (9900))
      |SELECT t.cuantil_bp AS cuantil_bp, r.x AS valor_micros
      |FROM t, n, ranked r
      |WHERE r.rn = GREATEST(1, (CAST(t.cuantil_bp AS BIGINT) * n.c + 9999) // 10000)
      |ORDER BY cuantil_bp""".stripMargin

  // ---------------------------------------------------------------- q91
  /** PER-GROUP exact price percentiles — q88's order statistics at the
    * grouped grain the reference's metric blocks publish (per supplier
    * nation here): ExactQuantile.quantilesBpByGroup batches all 25
    * nations' histogram refinements into ONE bounded exchange per level
    * (≤ buckets × active ranges rows, the per-nation range table rides a
    * broadcast join into the fact scan), then resolves every sub-65536
    * candidate range in ONE batched window pass — never a per-group sort,
    * never a full-column exchange, depth still bounded by the value
    * DOMAIN. The supplier dim joins broadcast before the quantile scans.
    * Exact long micros, basis-point ranks in integer arithmetic — the
    * q88 zero-ambiguity contract per group. */
  def q91GroupQuantile(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.{CurrencyMicros, ExactQuantile}
    val li = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"),
        CurrencyMicros.micros(col("l_extendedprice")).as("x"))
    val sup = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey").as("nacion"))
    val v = li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("nacion"), col("x"))
    ExactQuantile.quantilesBpByGroup(v, "nacion", "x", Seq(5000, 9000, 9900))
      .select(col("nacion"), col("cuantil_bp"),
        col("valor").as("valor_micros"))
      .orderBy(col("nacion"), col("cuantil_bp"))
  }

  val q91Sql: String =
    """WITH v AS (
      |  SELECT s.s_nationkey AS nacion,
      |    CAST(CAST(l.l_extendedprice AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS x
      |  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  WHERE l.l_extendedprice IS NOT NULL),
      |n AS (SELECT nacion, count(*) AS c FROM v GROUP BY nacion),
      |ranked AS (
      |  SELECT nacion, x,
      |    row_number() OVER (PARTITION BY nacion ORDER BY x) AS rn
      |  FROM v),
      |t(cuantil_bp) AS (VALUES (5000), (9000), (9900))
      |SELECT r.nacion, t.cuantil_bp AS cuantil_bp, r.x AS valor_micros
      |FROM t, n, ranked r
      |WHERE r.nacion = n.nacion
      |  AND r.rn = GREATEST(1, (CAST(t.cuantil_bp AS BIGINT) * n.c + 9999) // 10000)
      |ORDER BY r.nacion, cuantil_bp""".stripMargin

  // ---------------------------------------------------------------- maps
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q91_group_quantile"    -> (q91GroupQuantile _),
    "q88_exact_quantile"    -> (q88ExactQuantile _),
    "q42_scd2_history"      -> (q42Scd2History _),
    "q43_rollup"            -> (q43Rollup _),
    "q44_pivot"             -> (q44Pivot _),
    "q45_rank_distribution" -> (q45RankDistribution _),
    "q48_band_join"         -> (q48BandJoin _),
    "q50_kpi_union"         -> (q50KpiUnion _),
    "q51_funnel"            -> (q51Funnel _),
    "q52_cohort_retention"  -> (q52CohortRetention _))

  val oracles: Map[String, String] = Map(
    "q91_group_quantile"    -> q91Sql,
    "q88_exact_quantile"    -> q88Sql,
    "q42_scd2_history"      -> q42Sql,
    "q43_rollup"            -> q43Sql,
    "q44_pivot"             -> q44Sql,
    "q45_rank_distribution" -> q45Sql,
    "q48_band_join"         -> q48Sql,
    "q50_kpi_union"         -> q50Sql,
    "q51_funnel"            -> q51Sql,
    "q52_cohort_retention"  -> q52Sql)
}
