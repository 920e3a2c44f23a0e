package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType, IntegerType}
import graft.core.Tables
import graft.operators._

/** Flow wave — temporal/merge/stream patterns (SURVEY.md §2 A, rows 9–14). */
object FlowQueries {
  private def dec(c: Column): Column = c.cast(DecimalType(38, 6))

  // ---------------------------------------------------------------- q9
  /** BigMagic integer-date encode/decode roundtrip
    * (reference: common_jobs_functions.py:405-424). */
  def q9MagicDate(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    ord.select(
      col("o_orderkey"),
      col("o_orderdate").cast(DateType).as("fecha"),
      Periods.toMagic(col("o_orderdate")).as("fecha_magic"))
      .withColumn("fecha_roundtrip", Periods.fromMagic(col("fecha_magic")))
  }

  val q9Sql: String =
    """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS fecha,
      |  CAST(date_diff('day', DATE '2008-01-01', CAST(o_orderdate AS DATE)) + 733042 AS INTEGER) AS fecha_magic,
      |  DATE '2008-01-01' + CAST(date_diff('day', DATE '2008-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS fecha_roundtrip
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------- q66
  /** BigMagic time-of-day twin of q9: HHMMSS integer-string encoding of a
    * timestamp (reference: code/redshift/loadt_stage_to_redshift.py:98-104
    * `transform_convert_hora_bigmagic`), its seconds-of-day inverse, and
    * the (magic day, magic hora) -> timestamp rebuild. Leading zeros drop
    * with the integer form (00:05:09 -> "509", midnight -> "0"); the
    * rebuild recovers ts at second precision (sub-second truncates, as the
    * HHMMSS encoding implies). Zero-shuffle map stage. */
  def q66MagicHora(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.select(
      col("event_id"),
      col("ts"),
      Periods.toMagicHora(col("ts")).as("hora_magic"),
      Periods.toMagic(col("ts")).as("fecha_magic"))
      .withColumn("seg_dia", Periods.fromMagicHoraSeconds(col("hora_magic")))
      .withColumn("ts_roundtrip",
        Periods.fromMagicParts(col("fecha_magic"), col("hora_magic"))
          .cast("timestamp_ntz"))
  }

  val q66Sql: String =
    """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
      |  CAST(hour(ts) * 10000 + minute(ts) * 100 + CAST(second(ts) AS INTEGER) AS VARCHAR) AS hora_magic,
      |  CAST(date_diff('day', DATE '2008-01-01', CAST(ts AS DATE)) + 733042 AS INTEGER) AS fecha_magic,
      |  CAST(hour(ts) * 3600 + minute(ts) * 60 + CAST(second(ts) AS INTEGER) AS INTEGER) AS seg_dia,
      |  date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts_roundtrip
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- q10
  /** As-of join: each purchase event picks up the user's most recent
    * click value at-or-before it (rate-in-force pattern,
    * reference: domain/t_venta.py:79-119 tipo_cambio). */
  def q10AsofRate(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    AsOfJoin.lastValue(purchases, clicks, key = "user_id", time = "ts",
        valueCols = Seq("value" -> "valor_click"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("value").as("valor_compra"), col("valor_click"))
  }

  val q10Sql: String =
    """SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
      |  p.value AS valor_compra, c.value AS valor_click
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin

  // ---------------------------------------------------------------- q11
  /** SCD1 merge: late-period rows (with a simulated price correction) merge
    * over the historical snapshot (reference: common_jobs_functions.py:288
    * Delta whenMatchedUpdateAll/whenNotMatchedInsertAll). */
  def q11MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val target = ord.filter(col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
    val source = ord.filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .withColumn("o_totalprice", col("o_totalprice") * lit(1.1))
      .withColumn("o_orderstatus", lit("R"))
    MergeSCD1.merge(target, source, Seq("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").as("imp_total"), col("o_orderdate"))
  }

  val q11Sql: String =
    """WITH source AS (
      |  SELECT o_orderkey, o_custkey, 'R' AS o_orderstatus,
      |    o_totalprice * 1.1 AS o_totalprice, o_orderdate
      |  FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'),
      |target AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
      |  FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01')
      |SELECT o_orderkey, o_custkey, o_orderstatus,
      |  o_totalprice AS imp_total, o_orderdate
      |FROM (SELECT * FROM source UNION ALL
      |      SELECT * FROM target WHERE o_orderkey NOT IN (SELECT o_orderkey FROM source))""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Multi-instance union with schema drift: instance B lacks the segment
    * column; union tolerates it, conformance defaults it
    * (reference: common_jobs_functions.py:246-268). */
  def q12UnionInstances(spark: SparkSession, dir: String): DataFrame = {
    val cst = Tables.customer(spark, dir)
    val instA = cst.filter(col("c_nationkey") % 2 === 0)
    val instB = cst.filter(col("c_nationkey") % 2 === 1).drop("c_mktsegment")
    UnionInstances.unionTagged(Seq("inst_a" -> instA, "inst_b" -> instB))
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal").as("imp_saldo"),
        Keys.orDefault(col("c_mktsegment"), "SEGMENTO DEFAULT").as("desc_segmento"),
        col("instancia"))
  }

  val q12Sql: String =
    """SELECT c_custkey, c_name, c_nationkey,
      |  c_acctbal AS imp_saldo,
      |  coalesce(c_mktsegment, 'SEGMENTO DEFAULT') AS desc_segmento,
      |  instancia
      |FROM (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
      |    'inst_a' AS instancia FROM customer WHERE c_nationkey % 2 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, NULL,
      |    'inst_b' AS instancia FROM customer WHERE c_nationkey % 2 = 1)""".stripMargin

  // ---------------------------------------------------------------- q13
  /** Gap-based sessionization (30 min) + per-session rollup. */
  def q13Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    Sessionize.byGap(ev, "user_id", "ts", gapSeconds = 1800,
        tiebreak = col("event_id"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("inicio"),
        max(col("ts")).as("fin"),
        count(lit(1)).as("n_eventos"),
        graft.operators.CurrencyMicros.toAmount(sum(
          graft.operators.CurrencyMicros.micros(col("value")))).as("imp_valor"))
  }

  val q13Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS es_nueva
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT *, sum(es_nueva) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |  CAST(min(ts) AS TIMESTAMP) AS inicio, CAST(max(ts) AS TIMESTAMP) AS fin,
      |  count(*) AS n_eventos,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS imp_valor
      |FROM sessions GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q14
  /** Structured Streaming tumbling-window rollup, driven to completion with
    * AvailableNow (SURVEY §2 row 14). Epoch-aligned == batch date_trunc. */
  def q14StreamTumbling(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventsStream.tumblingCounts(spark, dir, "1 hour")

  val q14Sql: String =
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ventana, event_type,
      |  count(*) AS n_eventos,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS imp_valor
      |FROM events GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q37
  /** Stateful streaming sessionization (flatMapGroupsWithState with
    * event-time timeout) driven to completion; emits the sessions the run
    * closed. The oracle rebuilds the same session set in SQL and keeps a
    * session iff it closed inline (the user has a later session) or its
    * expiry timeout (first whole ms after end+gap) fell strictly below the
    * final watermark (floor(max event ms) - delay) — the exact engine
    * arithmetic, µs-precise. */
  def q37StreamSessionize(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventsStream.sessionizedEvents(spark, dir,
      gapSeconds = 1800, watermarkDelay = "1 minute")

  val q37Sql: String =
    """WITH ev AS (
      |  SELECT user_id, ts, epoch_us(ts) AS us FROM events),
      |flagged AS (
      |  SELECT user_id, ts, us,
      |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS es_nueva
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us)),
      |sess AS (
      |  SELECT *, sum(es_nueva) OVER (PARTITION BY user_id ORDER BY us
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged),
      |agg AS (
      |  SELECT user_id, sid, min(ts) AS inicio, max(ts) AS fin,
      |    max(us) AS fin_us, count(*) AS n_eventos
      |  FROM sess GROUP BY 1, 2),
      |lastsid AS (SELECT user_id, max(sid) AS max_sid FROM agg GROUP BY 1),
      |wm AS (SELECT max(us) // 1000 - 60000 AS wm_ms FROM ev)
      |SELECT a.user_id, a.inicio, a.fin, a.n_eventos
      |FROM agg a JOIN lastsid l USING (user_id), wm
      |WHERE a.sid < l.max_sid
      |   OR (a.fin_us + 1800000000) // 1000 + 1 < wm.wm_ms""".stripMargin

  // ---------------------------------------------------------------- q41
  /** Watermarked stream-stream interval join (view→purchase attribution)
    * driven to completion with AvailableNow. A watermark delay beyond the
    * data's time span makes the bounded run's inner-join output exactly
    * the batch interval join, so the streaming operator itself is
    * value-checked by the gate (production tunes the delay down and the
    * join state stays O(watermark + window)). */
  def q41StreamJoin(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventsStream.intervalJoined(spark, dir,
      typeA = "view", typeB = "purchase",
      windowSeconds = 3600, watermarkDelay = "90 days")

  val q41Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    make_timestamp(epoch_us(ts)) AS ts
      |  FROM events)
      |SELECT a.user_id, a.event_id AS id_a, a.ts AS ts_a,
      |  b.event_id AS id_b, b.ts AS ts_b
      |FROM e a JOIN e b ON a.user_id = b.user_id
      |WHERE a.event_type = 'view' AND b.event_type = 'purchase'
      |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 3600 SECONDS""".stripMargin

  // ---------------------------------------------------------------- q59
  /** Streaming exact dedup (dropDuplicatesWithinWatermark) driven to
    * completion with AvailableNow over a self-unioned source — every event
    * redelivered once, the dedup collapses the stream back to the distinct
    * event set, and the gate value-checks it against a plain SELECT (the
    * duplicates are bit-identical so survivor choice cannot diverge). */
  def q59StreamDedup(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventsStream.dedupedRun(spark, dir)

  val q59Sql: String =
    """SELECT event_id, user_id, event_type, value,
      |  make_timestamp(epoch_us(ts)) AS ts
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- q53
  /** Hopping (sliding) windows in batch: each event lands in the three
    * 3-hour windows (stride 1 h) covering it, via an exploded window-start
    * sequence — the batch twin of streaming `window(ts, "3 hours",
    * "1 hour")`. Explode is pipelined; the single shuffle is the window
    * agg with map-side combine, so cost is 3× event rows into a combiner,
    * not a self-join per hop. */
  def q53HoppingWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.core.Tables.events(spark, dir)
    val hourUs = 3600L * 1000000L
    // div, not "/": Column "/" on longs is DOUBLE division, and a
    // one-ulp-low quotient would truncate to the wrong hour
    val h0 = expr(s"unix_micros(ts) div $hourUs") // epoch hour
    ev.select(col("event_type"), col("value"),
        explode(sequence(h0 - 2, h0)).as("ventana_h"))
      .groupBy(col("ventana_h"), col("event_type"))
      .agg(count(lit(1)).as("n_eventos"),
        graft.operators.CurrencyMicros.toAmount(sum(
          graft.operators.CurrencyMicros.micros(col("value")))).as("imp_valor"))
      .withColumn("ventana", timestamp_micros(col("ventana_h") * hourUs))
      .drop("ventana_h")
  }

  val q53Sql: String =
    """WITH e AS (
      |  SELECT event_type, value, epoch_us(ts) // 3600000000 AS h0
      |  FROM events),
      |x AS (
      |  SELECT event_type, value, unnest(range(h0 - 2, h0 + 1)) AS ventana_h
      |  FROM e)
      |SELECT event_type, count(*) AS n_eventos,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS imp_valor,
      |  make_timestamp(ventana_h * 3600000000) AS ventana
      |FROM x GROUP BY event_type, ventana_h""".stripMargin

  // ---------------------------------------------------------------- q54
  /** Event-type transition matrix (Markov counts): for each user's
    * time-ordered event stream, count (from → to) consecutive-type pairs.
    * One window shuffle on user_id; the matrix agg combines map-side into
    * at most |types|² rows per task. */
  def q54Transitions(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.core.Tables.events(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.select(col("user_id"), col("event_type").as("hasta"),
        lag(col("event_type"), 1).over(w).as("desde"))
      .filter(col("desde").isNotNull)
      .groupBy(col("desde"), col("hasta"))
      .agg(count(lit(1)).as("n_transiciones"))
  }

  val q54Sql: String =
    """WITH s AS (
      |  SELECT event_type AS hasta,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS desde
      |  FROM events)
      |SELECT desde, hasta, count(*) AS n_transiciones
      |FROM s WHERE desde IS NOT NULL
      |GROUP BY desde, hasta""".stripMargin

  // ---------------------------------------------------------------- maps
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_stream_join"    -> (q41StreamJoin _),
    "q59_stream_dedup"   -> (q59StreamDedup _),
    "q53_hopping_window" -> (q53HoppingWindow _),
    "q54_transitions"    -> (q54Transitions _),
    "q9_magic_date"      -> (q9MagicDate _),
    "q66_magic_hora"     -> (q66MagicHora _),
    "q10_asof_rate"      -> (q10AsofRate _),
    "q11_merge_upsert"   -> (q11MergeUpsert _),
    "q12_union_instances" -> (q12UnionInstances _),
    "q13_sessionize"     -> (q13Sessionize _),
    "q14_stream_tumbling" -> (q14StreamTumbling _),
    "q37_stream_sessionize" -> (q37StreamSessionize _))

  val oracles: Map[String, String] = Map(
    "q41_stream_join"    -> q41Sql,
    "q59_stream_dedup"   -> q59Sql,
    "q53_hopping_window" -> q53Sql,
    "q54_transitions"    -> q54Sql,
    "q9_magic_date"      -> q9Sql,
    "q66_magic_hora"     -> q66Sql,
    "q10_asof_rate"      -> q10Sql,
    "q11_merge_upsert"   -> q11Sql,
    "q12_union_instances" -> q12Sql,
    "q13_sessionize"     -> q13Sql,
    "q14_stream_tumbling" -> q14Sql,
    "q37_stream_sessionize" -> q37Sql)
}
