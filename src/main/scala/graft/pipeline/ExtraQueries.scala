package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType}
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.operators.Keys

/** Completion wave (SURVEY §2 A, rows 27–30): hierarchy flattening,
  * running balances, and semi/anti join exclusion semantics. */
object ExtraQueries {
  private def dec(c: Column): Column = c.cast(DecimalType(38, 6))

  // ---------------------------------------------------------------- q27
  /** Multi-level hierarchy flatten: each level conformed to a common shape
    * and unioned with a level tag (reference: domain/
    * m_estructura_comercial.py:20-196 unions ruta/zona/division/subregion/
    * region into one structure dim). Union is metadata-only — no shuffle. */
  def q27HierarchyUnion(spark: SparkSession, dir: String): DataFrame = {
    val reg = Tables.region(spark, dir)
    val nat = Tables.nation(spark, dir)
    val lvlRegion = reg.select(
      Keys.surrogate(lit("R"), col("r_regionkey")).as("id_estructura"),
      lit(null).cast("string").as("id_padre"),
      upper(trim(col("r_name"))).as("descripcion"),
      lit(1).cast(IntegerType).as("nivel"),
      lit("region").as("tipo"))
    val lvlNation = nat.select(
      Keys.surrogate(lit("N"), col("n_nationkey")).as("id_estructura"),
      Keys.surrogate(lit("R"), col("n_regionkey")).as("id_padre"),
      upper(trim(col("n_name"))).as("descripcion"),
      lit(2).cast(IntegerType).as("nivel"),
      lit("nacion").as("tipo"))
    lvlRegion.unionByName(lvlNation)
  }

  val q27Sql: String =
    """SELECT concat_ws('|', 'R', CAST(r_regionkey AS VARCHAR)) AS id_estructura,
      |  CAST(NULL AS VARCHAR) AS id_padre, upper(trim(r_name)) AS descripcion,
      |  CAST(1 AS INTEGER) AS nivel, 'region' AS tipo
      |FROM region
      |UNION ALL
      |SELECT concat_ws('|', 'N', CAST(n_nationkey AS VARCHAR)),
      |  concat_ws('|', 'R', CAST(n_regionkey AS VARCHAR)), upper(trim(n_name)),
      |  CAST(2 AS INTEGER), 'nacion'
      |FROM nation""".stripMargin

  // ---------------------------------------------------------------- q28
  /** Running balance per customer: unbounded-preceding cumulative sum in
    * order-date order (reference: domain/t_saldos_iniciales.py balance
    * carry-forward). One shuffle on the key; decimal-exact so the running
    * prefix sums are order-stable. */
  def q28RunningBalance(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ord.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice").as("imp_pedido"))
      .withColumn("saldo_acumulado",
        graft.operators.CurrencyMicros.toAmount(sum(
          graft.operators.CurrencyMicros.micros(col("imp_pedido"))).over(w)))
  }

  val q28Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  o_totalprice AS imp_pedido,
      |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS saldo_acumulado
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------- q29
  /** Anti join: customers with no orders in a period (NOT EXISTS). At scale
    * a broadcast/shuffled left_anti carries only the keys. */
  def q29AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cst = Tables.customer(spark, dir)
    val ord97 = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    cst.join(ord97, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  val q29Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |    AND o_orderdate >= TIMESTAMP '1997-01-01'
      |    AND o_orderdate <  TIMESTAMP '1998-01-01')""".stripMargin

  // ---------------------------------------------------------------- q30
  /** Semi join: customers with at least one urgent order (EXISTS). */
  def q30SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cst = Tables.customer(spark, dir)
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    cst.join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal").as("imp_saldo"))
  }

  val q30Sql: String =
    """SELECT c_custkey, c_name, c_acctbal AS imp_saldo
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin

  // ---------------------------------------------------------------- q31
  /** Semi-structured extraction: JSON event properties parsed lakeside
    * (events.props carries a JSON payload; the stage layer conforms it to
    * typed columns). get_json_object is codegen'd path extraction — no UDF,
    * pushdown-friendly column pruning still applies. */
  def q31JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("prop_k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eventos"),
        sum(col("prop_k")).as("suma_k"),
        min(col("prop_k")).as("min_k"),
        max(col("prop_k")).as("max_k"))
  }

  val q31Sql: String =
    """SELECT event_type, count(*) AS n_eventos,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS suma_k,
      |  min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
      |FROM events GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q32
  /** Deterministic per-source corpus sample via the bottom-k-by-hash
    * TypedImperativeAggregate (graft.functions.BottomKSample): one pass,
    * O(k) state per group, reproducible across retries/partitioning. */
  def q32DeterministicSample(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(expr("bottom_k_sample(md5(text), doc_id, 5)").as("muestra"))
      .select(col("source"), posexplode(col("muestra")).as(Seq("pos", "doc_id")))
      .select(col("source"), (col("pos") + 1).cast(IntegerType).as("rango"), col("doc_id"))
  }

  val q32Sql: String =
    """SELECT source, CAST(rn AS INTEGER) AS rango, doc_id FROM (
      |  SELECT source, doc_id, row_number() OVER (
      |    PARTITION BY source ORDER BY md5(text), doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 5""".stripMargin

  // ---------------------------------------------------------------- q33
  /** Corpus vocabulary: explode word tokens, count, keep the top 100 terms
    * (count desc, term asc). The flatten-then-aggregate shape: explode is
    * pipelined (no shuffle), the single shuffle is the word-count agg with
    * map-side partial aggregation, and the top-k is a tiny global sort. */
  def q33Vocabulary(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(explode(split(trim(col("text")), "\\s+")).as("termino"))
      .filter(length(col("termino")) > 0)
      .groupBy(col("termino"))
      .agg(count(lit(1)).as("frecuencia"))
      .orderBy(col("frecuencia").desc, col("termino").asc)
      .limit(100)
  }

  val q33Sql: String =
    """SELECT termino, count(*) AS frecuencia FROM (
      |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS termino
      |  FROM documents)
      |WHERE length(termino) > 0
      |GROUP BY termino
      |ORDER BY frecuencia DESC, termino ASC
      |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q89
  /** EXACT heavy hitters over the token stream: every term with frequency
    * strictly > n/201 (k = 200 counters), with exact counts. q33's
    * vocabulary shuffles the FULL token stream to count it; this is the
    * scale form — a mergeable Misra–Gries pass (O(k) state, ≤ k pairs
    * per partition in the exchange, guaranteed superset of the answer)
    * then an exact count of the ≤ k candidates only (the stream is
    * InSet-filtered BEFORE the exchange). Two scans, both exchanges
    * bounded by k, results exact — operators/HeavyHitters. Tokenization
    * identical to q33 (whitespace split, empties dropped). */
  def q89HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val tokens = Tables.documents(spark, dir)
      .select(explode(split(trim(col("text")), "\\s+")).as("termino"))
      .filter(length(col("termino")) > 0)
    graft.operators.HeavyHitters.exact(tokens, "termino", k = 200)
  }

  val q89Sql: String =
    """WITH tok AS (
      |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS termino
      |  FROM documents),
      |tt AS (SELECT termino FROM tok WHERE length(termino) > 0),
      |n AS (SELECT count(*) AS c FROM tt)
      |SELECT termino, count(*) AS frecuencia
      |FROM tt, n
      |GROUP BY termino, n.c
      |HAVING count(*) * 201 > n.c
      |ORDER BY frecuencia DESC, termino ASC
      |LIMIT 200""".stripMargin

  // ---------------------------------------------------------------- q93
  /** PER-GROUP exact heavy hitters — q89's two bounded passes keyed by
    * language (q67's top-terms-per-source shape WITH guarantees): for
    * every lang, every term whose in-language frequency·(k+1) exceeds
    * that language's token count, with exact counts. Pass 1 runs
    * mg_candidates under groupBy(lang) (exchange ≤ k pairs per
    * partition-group; driver state ≤ |langs|·k — the DimLookup capped
    * collect); pass 2 semi-joins the stream against the broadcast
    * (lang, term) candidate table BEFORE the exchange, so the count
    * shuffle carries ≤ |langs|·k keys, then the per-group integer
    * threshold count·(k+1) > n_lang cuts the superset exactly —
    * operators/HeavyHitters.exactPerGroup. Tokenization identical to
    * q33/q89. */
  def q93GroupHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val tokens = Tables.documents(spark, dir)
      .select(col("lang"),
        explode(split(trim(col("text")), "\\s+")).as("termino"))
      .filter(length(col("termino")) > 0)
    graft.operators.HeavyHitters.exactPerGroup(tokens, "lang", "termino",
      k = 40)
  }

  val q93Sql: String =
    """WITH tok AS (
      |  SELECT lang,
      |    unnest(regexp_split_to_array(trim(text), '\s+')) AS termino
      |  FROM documents),
      |tt AS (SELECT lang, termino FROM tok WHERE length(termino) > 0),
      |n AS (SELECT lang, count(*) AS c FROM tt GROUP BY lang)
      |SELECT tt.lang, tt.termino, count(*) AS frecuencia
      |FROM tt JOIN n ON n.lang = tt.lang
      |GROUP BY tt.lang, tt.termino, n.c
      |HAVING count(*) * 41 > n.c
      |ORDER BY tt.lang ASC, frecuencia DESC, tt.termino ASC""".stripMargin

  // ---------------------------------------------------------------- maps
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q93_group_heavy_hitters" -> (q93GroupHeavyHitters _),
    "q89_heavy_hitters"   -> (q89HeavyHitters _),
    "q27_hierarchy_union" -> (q27HierarchyUnion _),
    "q28_running_balance" -> (q28RunningBalance _),
    "q29_anti_join"       -> (q29AntiJoin _),
    "q30_semi_join"       -> (q30SemiJoin _),
    "q31_json_extract"    -> (q31JsonExtract _),
    "q32_deterministic_sample" -> (q32DeterministicSample _),
    "q33_vocabulary"      -> (q33Vocabulary _))

  val oracles: Map[String, String] = Map(
    "q93_group_heavy_hitters" -> q93Sql,
    "q89_heavy_hitters"   -> q89Sql,
    "q27_hierarchy_union" -> q27Sql,
    "q28_running_balance" -> q28Sql,
    "q29_anti_join"       -> q29Sql,
    "q30_semi_join"       -> q30Sql,
    "q31_json_extract"    -> q31Sql,
    "q32_deterministic_sample" -> q32Sql,
    "q33_vocabulary"      -> q33Sql)
}
