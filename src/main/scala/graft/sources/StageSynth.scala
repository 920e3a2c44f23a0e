package graft.sources

import org.apache.spark.sql.SparkSession
import graft.core.Tables

/** Deterministic synthesis of the reference's BigMagic STAGE layer from
  * the testdata tables — the fixture side of the conformance parity
  * sweep (reference stage schema: the union of columns the 52 jobs read,
  * resources/graft/conformance/stage_columns.json).
  *
  * Every stage table is a pure SQL view over the testdata parquet
  * (region/nation/customer/supplier/part/orders/lineitem), so the DuckDB
  * oracle replays the identical fixture from the identical inputs — no
  * synthetic files, no RNG, no clock. Key formulas are shared across
  * tables (a cliente's compania is ALWAYS custkey % 25, a detail row's
  * articulo is ALWAYS partkey, fechas come from CAST(o_orderdate AS DATE)), which gives
  * the synthesized lake referential integrity: inner joins in the
  * reference jobs hit, periods line up, and branch-covering value
  * domains (estado '002', moneda 'DOL', sucursal '00', NULL/'' zona
  * postal ...) exercise the jobs' CASE/coalesce paths.
  *
  * Dialect: Spark SQL here; ConformanceSql.toDuckDb translates
  * mechanically (STRING->VARCHAR, date_format->strftime, ...) for the
  * oracle side.
  *
  * Dim×dim expansions (nation×region, part×nation) are written as
  * constant-equi joins (`ON x % 1 = y % 1`) rather than comma cross
  * joins: the result is identical (both keys are 0 for every row, the
  * sides are bounded dims), but Catalyst extracts the equi key and plans
  * a hash join, keeping every conformance twin inside PlanAuditSpec's
  * no-BNLJ gate instead of carving out a "bounded cross join" exemption.
  */
object StageSynth {
  /** compania code of a customer/order key — the one formula every table
    * shares so the lake joins. */
  private def co(k: String) = s"lpad(CAST(($k) % 25 AS STRING), 2, '0')"
  private def suc(k: String) = s"lpad(CAST(($k) % 5 AS STRING), 2, '0')"
  /** deterministic DATE in 1995-04..06 (inside the sweep's period set). */
  private def dt(k: String) =
    s"CAST(CONCAT('1995-0', CAST(4 + ($k) % 3 AS STRING), '-', " +
      s"lpad(CAST(1 + ($k) % 28 AS STRING), 2, '0')) AS DATE)"
  /** deterministic TIMESTAMP derived from [[dt]]. */
  private def ts(k: String) =
    s"CAST(CONCAT(CAST(${dt(k)} AS STRING), ' ', " +
      s"lpad(CAST(($k) % 24 AS STRING), 2, '0'), ':00:00') AS TIMESTAMP)"

  /** (table -> Spark-SQL SELECT) in dependency order: later entries may
    * reference earlier stage views by `stage_<name>`. */
  val sql: Seq[(String, String)] = Seq(
    "m_pais" ->
      """SELECT CAST(r_regionkey AS STRING) AS cod_pais,
        |       CONCAT('PA', CAST(r_regionkey AS STRING)) AS id_pais,
        |       r_name AS desc_pais,
        |       CASE WHEN r_regionkey < 2 THEN 'AMERICA' ELSE 'EMEA' END AS continente
        |FROM region""".stripMargin,

    "m_compania" ->
      s"""SELECT lpad(CAST(n_nationkey AS STRING), 2, '0') AS cod_compania,
         |       lpad(CAST(n_nationkey AS STRING), 2, '0') AS id_compania,
         |       CAST(n_regionkey AS STRING) AS cod_pais,
         |       n_name AS desc_compania,
         |       CASE WHEN n_nationkey % 7 = 0 THEN '0' ELSE '1' END AS es_activo,
         |       ${dt("n_nationkey")} AS fecha_creacion,
         |       ${dt("n_nationkey + 1")} AS fecha_modificacion
         |FROM nation""".stripMargin,

    "m_parametro" ->
      """SELECT lpad(CAST(n_nationkey AS STRING), 2, '0') AS id_compania,
        |       'SOL' AS cod_moneda_mn
        |FROM nation""".stripMargin,

    // companias x sucursales 00..04
    "m_sucursal" ->
      s"""SELECT lpad(CAST(n_nationkey AS STRING), 2, '0') AS cod_compania,
         |       lpad(CAST(r_regionkey AS STRING), 2, '0') AS cod_sucursal,
         |       CONCAT('SUC ', n_name, ' ', CAST(r_regionkey AS STRING)) AS desc_sucursal,
         |       CASE WHEN r_regionkey = 4 AND n_nationkey % 11 = 0 THEN '0' ELSE '1' END AS es_activo,
         |       CASE WHEN r_regionkey % 3 = 0 THEN '00' ELSE CAST(r_regionkey AS STRING) END AS cod_tipo_sucursal,
         |       ${dt("n_nationkey + r_regionkey")} AS fecha_creacion,
         |       ${dt("n_nationkey + r_regionkey + 1")} AS fecha_modificacion
         |FROM nation JOIN region ON n_nationkey % 1 = r_regionkey % 1""".stripMargin,

    "m_cliente" ->
      s"""SELECT CAST(c_custkey AS STRING) AS cod_cliente,
         |       ${co("c_custkey")} AS cod_compania,
         |       ${suc("c_custkey")} AS cod_sucursal,
         |       c_name AS nomb_cliente,
         |       CONCAT('DIR ', c_name) AS direccion,
         |       CAST(c_custkey % 7 AS STRING) AS cod_canal,
         |       CAST(c_custkey % 11 AS STRING) AS cod_giro,
         |       CAST(c_custkey % 13 AS STRING) AS cod_subgiro,
         |       CAST(c_custkey % 4 AS STRING) AS cod_lista_precio,
         |       CAST(c_custkey % 17 AS STRING) AS cod_cuenta_clave,
         |       CASE WHEN c_custkey % 5 = 0 THEN NULL
         |            WHEN c_custkey % 5 = 1 THEN ''
         |            ELSE CONCAT('Z', CAST(c_custkey % 50 AS STRING)) END AS cod_zona_postal,
         |       CASE WHEN c_custkey % 3 = 0 THEN NULL
         |            ELSE CAST(c_custkey % 100 AS STRING) END AS cod_cliente_principal,
         |       'DNI' AS tipo_documento_identidad,
         |       CAST(10000000 + c_custkey AS STRING) AS nro_documento_identidad,
         |       CASE WHEN c_custkey % 19 = 0 THEN '0' ELSE '1' END AS es_activo,
         |       ${ts("c_custkey")} AS fecha_creacion,
         |       ${ts("c_custkey + 1")} AS fecha_modificacion
         |FROM customer""".stripMargin,

    "m_asignacion_modulo" ->
      s"""SELECT CAST(c_custkey AS STRING) AS cod_cliente,
         |       ${co("c_custkey")} AS cod_compania,
         |       ${suc("c_custkey")} AS cod_sucursal,
         |       CAST(c_custkey % 3 AS STRING) AS cod_fuerza_venta,
         |       CAST(c_custkey % 9 AS STRING) AS cod_modulo,
         |       CAST(c_custkey % 180 AS STRING) AS coord_x,
         |       CAST(c_custkey % 90 AS STRING) AS coord_y
         |FROM customer
         |WHERE c_custkey % 6 <> 0""".stripMargin,

    "m_tipo_cliente" ->
      s"""SELECT CAST(c_custkey AS STRING) AS cod_cliente,
         |       ${co("c_custkey")} AS cod_compania,
         |       CASE c_custkey % 6 WHEN 0 THEN 'A' WHEN 1 THEN 'V'
         |            WHEN 2 THEN 'T' WHEN 3 THEN 'a' WHEN 4 THEN 'N'
         |            ELSE 'X' END AS tipo_cliente
         |FROM customer
         |WHERE c_custkey % 4 < 3""".stripMargin,

    "m_cuenta_clave" ->
      """SELECT DISTINCT cod_compania, cod_cuenta_clave,
        |       CONCAT('CUENTA ', cod_cuenta_clave) AS descripcion
        |FROM stage_m_cliente""".stripMargin,

    "m_canal" ->
      """SELECT DISTINCT cod_compania, cod_canal,
        |       CONCAT('CANAL ', cod_canal) AS desc_canal,
        |       CASE WHEN cod_canal = '6' THEN '0' ELSE '1' END AS es_activo
        |FROM stage_m_cliente""".stripMargin,

    "m_giro" ->
      """SELECT DISTINCT cod_compania, cod_giro,
        |       CONCAT('GIRO ', cod_giro) AS desc_giro,
        |       '1' AS es_activo
        |FROM stage_m_cliente""".stripMargin,

    "m_subgiro" ->
      """SELECT DISTINCT cod_compania, cod_subgiro,
        |       CONCAT('SUBGIRO ', cod_subgiro) AS desc_subgiro,
        |       '1' AS es_activo
        |FROM stage_m_cliente""".stripMargin,

    "i_relacion_consumo" ->
      """SELECT DISTINCT cod_compania, cod_canal, cod_giro, cod_subgiro
        |FROM stage_m_cliente
        |WHERE cod_giro IS NOT NULL""".stripMargin,

    "m_lista_precio" ->
      """SELECT DISTINCT cod_compania, cod_lista_precio,
        |       CONCAT(cod_compania, '|', cod_lista_precio) AS id_lista_precio,
        |       CONCAT('LISTA ', cod_lista_precio) AS desc_lista_precio
        |FROM stage_m_cliente""".stripMargin,

    "m_fuerza_venta" ->
      """SELECT DISTINCT cod_compania, cod_fuerza_venta,
        |       CONCAT(cod_compania, '|', cod_fuerza_venta) AS id_fuerza_venta,
        |       CONCAT('FUERZA ', cod_fuerza_venta) AS desc_fuerza_venta
        |FROM stage_m_asignacion_modulo""".stripMargin,

    "m_modulo" ->
      """SELECT DISTINCT cod_compania, cod_sucursal, cod_modulo,
        |       cod_fuerza_venta,
        |       CAST(CAST(cod_modulo AS INT) % 5 AS STRING) AS cod_ruta,
        |       CONCAT(cod_compania, '|', cod_modulo) AS id_modulo,
        |       CONCAT('MODULO ', cod_modulo) AS desc_modulo
        |FROM stage_m_asignacion_modulo""".stripMargin,

    "m_ruta" ->
      """SELECT DISTINCT cod_compania, cod_sucursal, cod_ruta,
        |       cod_fuerza_venta,
        |       CAST(1 + CAST(cod_ruta AS INT) % 4 AS STRING) AS cod_modelo_atencion,
        |       CAST(CAST(cod_ruta AS INT) * 8 % 40 AS STRING) AS cod_vendedor,
        |       CAST(CAST(cod_ruta AS INT) % 15 AS STRING) AS cod_zona,
        |       CONCAT('RUTA ', cod_ruta) AS desc_ruta,
        |       '1' AS es_activo
        |FROM stage_m_modulo""".stripMargin,

    "m_modelo_atencion" ->
      """SELECT lpad(CAST(n_nationkey AS STRING), 2, '0') AS id_compania,
        |       CAST(1 + r_regionkey AS STRING) AS cod_modelo_atencion,
        |       CASE r_regionkey WHEN 0 THEN 'Pre Venta' WHEN 1 THEN 'Auto Venta'
        |            WHEN 2 THEN 'Televenta' WHEN 3 THEN 'Especializado'
        |            ELSE 'Otro' END AS desc_modelo_atencion
        |FROM nation JOIN region ON n_nationkey % 1 = r_regionkey % 1""".stripMargin,

    "m_region" ->
      """SELECT DISTINCT CAST(n_regionkey AS STRING) AS cod_pais,
        |       CAST(n_nationkey % 4 AS STRING) AS cod_region,
        |       CONCAT('REGION ', CAST(n_nationkey % 4 AS STRING)) AS desc_region,
        |       1 AS es_activo
        |FROM nation""".stripMargin,

    "m_subregion" ->
      """SELECT DISTINCT CAST(n_regionkey AS STRING) AS cod_pais,
        |       CAST(n_nationkey % 4 AS STRING) AS cod_region,
        |       CAST(n_nationkey % 8 AS STRING) AS cod_subregion,
        |       CONCAT('SUBREGION ', CAST(n_nationkey % 8 AS STRING)) AS desc_subregion,
        |       1 AS es_activo
        |FROM nation""".stripMargin,

    "m_zona" ->
      s"""SELECT DISTINCT ${co("c_custkey")} AS cod_compania,
         |       ${suc("c_custkey")} AS cod_sucursal,
         |       CAST(c_custkey % 15 AS STRING) AS cod_zona,
         |       CAST((c_custkey % 15) % 4 AS STRING) AS cod_region,
         |       CAST((c_custkey % 15) % 8 AS STRING) AS cod_subregion,
         |       CONCAT('ZONA ', CAST(c_custkey % 15 AS STRING)) AS desc_zona,
         |       CAST(c_custkey % 15 AS STRING) AS cod_centro_distribucion,
         |       CAST((c_custkey % 15) * 5 % 40 AS STRING) AS cod_supervisor,
         |       1 AS es_activo
         |FROM customer""".stripMargin,

    // m_division doubles as the reference's centro de distribucion
    // (t_venta joins mcd.cod_division = mzo.cod_zona)
    "m_division" ->
      s"""SELECT DISTINCT ${co("c_custkey")} AS cod_compania,
         |       CAST(c_custkey % 15 AS STRING) AS cod_division,
         |       CONCAT('DIVISION ', CAST(c_custkey % 15 AS STRING)) AS desc_division,
         |       CAST((c_custkey % 15) * 3 % 40 AS STRING) AS cod_jefe_venta,
         |       '1' AS es_activo
         |FROM customer""".stripMargin,

    // territorial hierarchy: ng1 > ng2 > ng3(zona postal)
    "m_ng1" ->
      """SELECT DISTINCT CAST(n_regionkey AS STRING) AS id_pais,
        |       CAST(n_nationkey % 3 AS STRING) AS cod_ng1,
        |       CONCAT('NG1 ', CAST(n_nationkey % 3 AS STRING)) AS desc_ng1
        |FROM nation""".stripMargin,

    "m_ng2" ->
      """SELECT DISTINCT CAST(n_regionkey AS STRING) AS id_pais,
        |       CAST(n_nationkey % 3 AS STRING) AS cod_ng1,
        |       CAST(n_nationkey % 6 AS STRING) AS cod_ng2,
        |       CONCAT('NG2 ', CAST(n_nationkey % 6 AS STRING)) AS desc_ng2
        |FROM nation""".stripMargin,

    "m_ng3" ->
      s"""SELECT DISTINCT
         |       CAST((c_custkey % 25) % 5 AS STRING) AS id_pais,
         |       CAST(c_custkey % 3 AS STRING) AS cod_ng1,
         |       CAST(c_custkey % 6 AS STRING) AS cod_ng2,
         |       CAST(c_custkey % 12 AS STRING) AS cod_ng3,
         |       CONCAT('Z', CAST(c_custkey % 50 AS STRING)) AS cod_zona_postal,
         |       CONCAT('NG3 ', CAST(c_custkey % 12 AS STRING)) AS desc_ng3
         |FROM customer
         |WHERE c_custkey % 5 > 1""".stripMargin,

    // ---- articulo catalog (from part)
    "m_articulo" ->
      s"""SELECT CAST(p_partkey AS STRING) AS cod_articulo,
         |       lpad(CAST(n_nationkey AS STRING), 2, '0') AS cod_compania,
         |       CAST(9000000 + p_partkey % 500 AS STRING) AS cod_articulo_corp,
         |       CONCAT(lpad(CAST(n_nationkey AS STRING), 2, '0'), '|',
         |              CAST(p_partkey AS STRING)) AS id_articulo,
         |       p_name AS desc_articulo,
         |       upper(p_name) AS desc_articulo_corp,
         |       lpad(CAST(p_partkey % 5 AS STRING), 3, '0') AS cod_familia,
         |       lpad(CAST(p_partkey % 9 AS STRING), 3, '0') AS cod_subfamilia,
         |       CAST(10 + p_partkey % 10 AS STRING) AS cod_linea,
         |       CAST(p_partkey % 8 AS STRING) AS cod_marca,
         |       CAST(p_partkey % 6 AS STRING) AS cod_categoria,
         |       CAST(p_partkey % 7 AS STRING) AS cod_formato,
         |       CAST(p_partkey % 4 AS STRING) AS cod_presentacion,
         |       CAST(p_partkey % 5 AS STRING) AS cod_sabor,
         |       CAST(p_partkey % 3 AS STRING) AS cod_tipo_envase,
         |       CASE p_partkey % 6 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4
         |            WHEN 3 THEN 5 WHEN 4 THEN 8 ELSE 10 END AS cant_unidad_paquete,
         |       1 + p_partkey % 6 AS cant_paquete_caja,
         |       CAST(p_size AS DECIMAL(18,6)) AS cant_unidad_volumen,
         |       CAST(p_size + 0.5 AS DECIMAL(18,6)) AS cant_unidad_peso,
         |       1 + p_partkey % 40 AS cant_cajas_por_palet,
         |       'CAJ' AS unidad_compra,
         |       'UND' AS unidad_manejo,
         |       CAST(p_size AS STRING) AS unidad_volumen,
         |       CASE WHEN p_partkey % 23 = 0 THEN '0' ELSE '1' END AS es_activo,
         |       CASE WHEN p_partkey % 2 = 0 THEN '1' ELSE '0' END AS es_explosion,
         |       CASE WHEN p_partkey % 3 = 0 THEN 'T' ELSE 'F' END AS flgskuplan,
         |       ${dt("p_partkey")} AS fecha_creacion,
         |       ${dt("p_partkey + 2")} AS fecha_modificacion
         |FROM part JOIN nation ON p_partkey % 1 = n_nationkey % 1""".stripMargin,

    "m_marca" ->
      """SELECT DISTINCT cod_compania, cod_marca,
        |       CONCAT('MARCA ', cod_marca) AS desc_marca
        |FROM stage_m_articulo""".stripMargin,
    "m_categoria" ->
      """SELECT DISTINCT cod_compania, cod_categoria,
        |       CONCAT('CATEGORIA ', cod_categoria) AS desc_categoria
        |FROM stage_m_articulo""".stripMargin,
    "m_familia" ->
      """SELECT DISTINCT cod_compania, cod_familia, cod_linea,
        |       CONCAT('FAMILIA ', cod_familia) AS desc_familia
        |FROM stage_m_articulo""".stripMargin,
    "m_subfamilia" ->
      """SELECT DISTINCT cod_compania, cod_familia, cod_linea, cod_subfamilia,
        |       CONCAT('SUBFAMILIA ', cod_subfamilia) AS desc_subfamilia
        |FROM stage_m_articulo""".stripMargin,
    "m_linea" ->
      """SELECT DISTINCT cod_compania, cod_linea,
        |       CONCAT('LINEA ', cod_linea) AS desc_linea,
        |       CASE WHEN cod_linea = '12' THEN 'TE'
        |            WHEN cod_linea = '17' THEN 'T' ELSE 'F' END AS flg_linea
        |FROM stage_m_articulo""".stripMargin,
    "m_formato" ->
      """SELECT DISTINCT cod_compania, cod_formato,
        |       CONCAT('FORMATO ', cod_formato) AS desc_formato
        |FROM stage_m_articulo""".stripMargin,
    "m_presentacion" ->
      """SELECT DISTINCT cod_compania, cod_presentacion,
        |       CONCAT('PRESENTACION ', cod_presentacion) AS desc_presentacion
        |FROM stage_m_articulo""".stripMargin,
    "m_sabor" ->
      """SELECT DISTINCT cod_compania, cod_sabor,
        |       CONCAT('SABOR ', cod_sabor) AS desc_sabor
        |FROM stage_m_articulo""".stripMargin,
    "m_tipo_envase" ->
      """SELECT DISTINCT cod_compania, cod_tipo_envase,
        |       CONCAT('ENVASE ', cod_tipo_envase) AS desc_tipo_envase
        |FROM stage_m_articulo""".stripMargin,

    // ---- people / vehicles (from supplier)
    "m_persona" ->
      s"""SELECT CAST(s_suppkey AS STRING) AS cod_persona,
         |       lpad(CAST(s_suppkey % 25 AS STRING), 2, '0') AS cod_compania,
         |       CONCAT(lpad(CAST(s_suppkey % 25 AS STRING), 2, '0'), '|',
         |              CAST(s_suppkey AS STRING)) AS id_persona,
         |       s_name AS nomb_persona,
         |       CAST(20000000 + s_suppkey AS STRING) AS nro_documento
         |FROM supplier""".stripMargin,

    "m_empleado" ->
      """SELECT DISTINCT CAST(c_custkey % 100 AS STRING) AS cod_empleado,
        |       lpad(CAST((c_custkey % 100) % 25 AS STRING), 2, '0') AS cod_compania
        |FROM customer""".stripMargin,

    "m_vendedor" ->
      """SELECT CAST(s_suppkey % 40 AS STRING) AS cod_vendedor,
        |       lpad(CAST(s_suppkey % 25 AS STRING), 2, '0') AS cod_compania,
        |       CASE WHEN s_suppkey % 2 = 0 THEN 'V' ELSE 'S' END AS cod_tipo_vendedor
        |FROM supplier""".stripMargin,

    "m_tipo_vehiculo" ->
      """SELECT DISTINCT lpad(CAST(s_suppkey % 25 AS STRING), 2, '0') AS cod_compania,
        |       CAST(s_suppkey % 5 AS STRING) AS cod_tipo_vehiculo,
        |       CONCAT('TIPO VEH ', CAST(s_suppkey % 5 AS STRING)) AS descripcion
        |FROM supplier""".stripMargin,

    "m_capacidad_vehiculo" ->
      """SELECT DISTINCT lpad(CAST(s_suppkey % 25 AS STRING), 2, '0') AS cod_compania,
        |       CAST(s_suppkey % 5 AS STRING) AS cod_tipo_capacidad_vehiculo,
        |       CONCAT('CAP ', CAST(s_suppkey % 5 AS STRING)) AS desc_tipo_vehiculo,
        |       CAST(1000 + (s_suppkey % 5) * 250 AS DECIMAL(18,6)) AS pesoxcamion,
        |       CAST(10 + (s_suppkey % 5) * 2 AS DECIMAL(18,6)) AS tarimasxcamion
        |FROM supplier""".stripMargin,

    "m_vehiculo" ->
      s"""SELECT CAST(s_suppkey AS STRING) AS cod_vehiculo,
         |       lpad(CAST(s_suppkey % 25 AS STRING), 2, '0') AS cod_compania,
         |       CAST(s_suppkey % 5 AS STRING) AS cod_tipo_vehiculo,
         |       CONCAT(lpad(CAST(s_suppkey % 25 AS STRING), 2, '0'), '|',
         |              CAST(s_suppkey AS STRING)) AS id_medio_transporte,
         |       CONCAT('MARCA', CAST(s_suppkey % 4 AS STRING)) AS marca,
         |       CAST(900 + s_suppkey % 600 AS DECIMAL(18,6)) AS capacidad_max_kg,
         |       ${ts("s_suppkey")} AS fecha_creacion,
         |       ${ts("s_suppkey + 3")} AS fecha_modificacion
         |FROM supplier""".stripMargin,

    "m_tipo_transportista" ->
      """SELECT DISTINCT lpad(CAST(s_suppkey % 25 AS STRING), 2, '0') AS cod_compania,
        |       CAST(s_suppkey % 3 AS STRING) AS cod_tipo_transportista,
        |       CONCAT('TIPO TRANS ', CAST(s_suppkey % 3 AS STRING)) AS descripcion1
        |FROM supplier""".stripMargin,

    "m_transportista" ->
      s"""SELECT CAST(s_suppkey AS STRING) AS cod_transportista,
         |       lpad(CAST(s_suppkey % 25 AS STRING), 2, '0') AS cod_compania,
         |       CAST(s_suppkey % 3 AS STRING) AS cod_tipo_transportista,
         |       CONCAT(lpad(CAST(s_suppkey % 25 AS STRING), 2, '0'), '|',
         |              CAST(s_suppkey AS STRING)) AS id_transportista,
         |       ${ts("s_suppkey")} AS fecha_creacion,
         |       ${ts("s_suppkey + 5")} AS fecha_modificacion
         |FROM supplier""".stripMargin,

    // ---- almacenes (companias x sucursales x almacenes)
    "m_almacen" ->
      """SELECT s.cod_compania,
        |       CAST(r.r_regionkey % 6 AS STRING) AS cod_almacen,
        |       CONCAT('ALM ', s.cod_compania, s.cod_sucursal,
        |              CAST(r.r_regionkey % 6 AS STRING)) AS desc_almacen,
        |       CONCAT(s.cod_compania, '|', s.cod_sucursal, '|',
        |              CAST(r.r_regionkey % 6 AS STRING)) AS id_almacen,
        |       CONCAT(s.cod_compania, '|', s.cod_sucursal) AS id_sucursal,
        |       CASE WHEN r.r_regionkey % 2 = 0 THEN 'P' ELSE 'T' END AS tipo_almacen
        |FROM stage_m_sucursal s JOIN region r ON length(s.cod_compania) % 1 = r.r_regionkey % 1""".stripMargin,

    // ---- operation catalogs
    "m_documento_transaccion" ->
      """SELECT DISTINCT lpad(CAST(n_nationkey AS STRING), 2, '0') AS cod_compania,
        |       t.cod AS cod_documento_transaccion,
        |       CONCAT('DOC TRANS ', t.cod) AS desc_documento_transaccion
        |FROM nation JOIN
        |     (SELECT DISTINCT CASE n_nationkey % 8 WHEN 0 THEN 'FAC'
        |              WHEN 1 THEN 'BOL' WHEN 2 THEN 'NCC' WHEN 3 THEN 'GRA'
        |              WHEN 4 THEN 'NIN' WHEN 5 THEN '200' WHEN 6 THEN '300'
        |              ELSE 'DCV' END AS cod FROM nation) t
        |     ON n_nationkey % 1 = length(t.cod) % 1""".stripMargin,

    "m_operacion" ->
      """SELECT DISTINCT lpad(CAST(n_nationkey AS STRING), 2, '0') AS cod_compania,
        |       t.cod AS cod_operacion,
        |       t.cod AS cod_documento_transaccion,
        |       CASE WHEN t.cod IN ('FAC', 'BOL', 'GRA', '200') THEN 'Ven'
        |            ELSE 'Pro' END AS cod_tipo_operacion,
        |       CASE WHEN t.cod = 'DCV' THEN 'REV' ELSE 'STD' END AS cod_procedimiento
        |FROM nation JOIN
        |     (SELECT DISTINCT CASE n_nationkey % 8 WHEN 0 THEN 'FAC'
        |              WHEN 1 THEN 'BOL' WHEN 2 THEN 'NCC' WHEN 3 THEN 'GRA'
        |              WHEN 4 THEN 'NIN' WHEN 5 THEN '200' WHEN 6 THEN '300'
        |              ELSE 'DCV' END AS cod FROM nation) t
        |     ON n_nationkey % 1 = length(t.cod) % 1""".stripMargin,

    "m_procedimiento" ->
      """SELECT DISTINCT cod_compania, cod_procedimiento,
        |       cod_documento_transaccion, cod_tipo_operacion,
        |       CONCAT('PROC ', cod_procedimiento) AS desc_procedimiento,
        |       cod_tipo_operacion AS id_tipo_operacion
        |FROM stage_m_operacion""".stripMargin,

    "m_documento_almacen" ->
      """SELECT DISTINCT d.cod_compania,
        |       CASE WHEN d.cod_documento_transaccion IN ('GRA', '200', 'FAC', 'BOL')
        |            THEN 'S' ELSE 'R' END AS cod_operacion_origen,
        |       d.cod_documento_transaccion AS cod_transaccion
        |FROM stage_m_documento_transaccion d""".stripMargin,

    "m_tipo_documento" ->
      """SELECT DISTINCT d.cod_compania,
        |       d.cod_documento_transaccion AS cod_tipo_documento
        |FROM stage_m_documento_transaccion d""".stripMargin,

    "m_forma_pago" ->
      s"""SELECT lpad(CAST(n_nationkey AS STRING), 2, '0') AS cod_compania,
         |       CAST(r_regionkey AS STRING) AS cod_forma_pago,
         |       CONCAT(lpad(CAST(n_nationkey AS STRING), 2, '0'), '|',
         |              CAST(r_regionkey AS STRING)) AS id_forma_pago,
         |       CASE r_regionkey WHEN 0 THEN 'CONTADO' ELSE 'CREDITO' END AS desc_forma_pago,
         |       ${dt("n_nationkey + r_regionkey")} AS fecha_creacion,
         |       ${dt("n_nationkey + r_regionkey + 1")} AS fecha_modificacion
         |FROM nation JOIN region ON n_nationkey % 1 = r_regionkey % 1""".stripMargin,

    "m_origen_pedido" ->
      """SELECT lpad(CAST(n_nationkey AS STRING), 2, '0') AS cod_compania,
        |       CAST(r_regionkey AS STRING) AS cod_origen_pedido,
        |       CONCAT(lpad(CAST(n_nationkey AS STRING), 2, '0'), '|',
        |              CAST(r_regionkey AS STRING)) AS id_origen_pedido,
        |       CASE r_regionkey WHEN 0 THEN 'VENDEDOR' WHEN 1 THEN 'B2B'
        |            ELSE 'CALLCENTER' END AS desc_origen_pedido
        |FROM nation JOIN region ON n_nationkey % 1 = r_regionkey % 1""".stripMargin,

    "i_relacion_proced_venta" ->
      """SELECT DISTINCT lpad(CAST(n_nationkey AS STRING), 2, '0') AS cod_compania,
        |       CASE r_regionkey WHEN 0 THEN 'FAC' WHEN 1 THEN 'BOL'
        |            WHEN 2 THEN 'NCC' WHEN 3 THEN 'CMD' ELSE 'RMD' END AS cod_documento_venta,
        |       'STD' AS cod_procedimiento_venta,
        |       'VTA' AS cod_operacion_venta,
        |       '200' AS cod_documento_pedido,
        |       'STD' AS cod_procedimiento_pedido,
        |       CAST(r_regionkey AS STRING) AS cod_tipo_pedido
        |FROM nation JOIN region ON n_nationkey % 1 = r_regionkey % 1""".stripMargin,

    "m_tipo_transaccion" ->
      """SELECT DISTINCT cod_compania, cod_documento_transaccion,
        |       CASE WHEN cod_documento_transaccion IN ('FAC', 'BOL', 'DCV', '200', '300')
        |            THEN 'DCV' ELSE 'STD' END AS cod_tipo_transaccion
        |FROM stage_m_documento_transaccion""".stripMargin,

    "m_tipo_cambio" ->
      """SELECT DISTINCT lpad(CAST(n_nationkey AS STRING), 2, '0') AS cod_compania,
        |       lpad(CAST(n_nationkey AS STRING), 2, '0') AS id_compania,
        |       m.moneda AS cod_moneda,
        |       CAST(o_orderdate AS DATE) AS fecha,
        |       CASE WHEN CAST(substring(CAST(CAST(o_orderdate AS DATE) AS STRING), 9, 2) AS INT) = 13
        |            THEN CAST(0 AS DECIMAL(18,6))
        |            ELSE CAST(CASE CAST(substring(CAST(CAST(o_orderdate AS DATE) AS STRING), 9, 2) AS INT) % 4
        |                 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 5
        |                 END AS DECIMAL(18,6)) END AS tc_compra,
        |       CAST(CASE CAST(substring(CAST(CAST(o_orderdate AS DATE) AS STRING), 9, 2) AS INT) % 4
        |            WHEN 0 THEN 2 WHEN 1 THEN 4 WHEN 2 THEN 5 ELSE 8
        |            END AS DECIMAL(18,6)) AS tc_venta
        |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS o_orderdate FROM orders) d
        |     JOIN nation ON year(d.o_orderdate) % 1 = n_nationkey % 1
        |     JOIN (SELECT CASE WHEN r_regionkey = 0 THEN 'DOL' ELSE 'SOL' END AS moneda
        |      FROM region WHERE r_regionkey < 2) m
        |     ON n_nationkey % 1 = length(m.moneda) % 1""".stripMargin,

    // ---- sales documents (from orders x customer-aligned keys)
    "t_documento_venta" ->
      s"""SELECT CAST(o_custkey AS STRING) AS cod_cliente,
         |       ${co("o_custkey")} AS cod_compania,
         |       ${suc("o_custkey")} AS cod_sucursal,
         |       CASE o_orderkey % 11 WHEN 0 THEN 'NCC' WHEN 1 THEN 'CMD'
         |            WHEN 2 THEN 'RMD' WHEN 3 THEN 'BOL' ELSE 'FAC' END AS cod_documento_venta,
         |       CAST(o_orderkey AS STRING) AS nro_documento_venta,
         |       CONCAT('CPB', CAST(o_orderkey AS STRING)) AS nro_comprobante,
         |       CASE WHEN o_orderkey % 13 = 0 THEN '002'
         |            WHEN o_orderkey % 13 < 7 THEN 'PLI' ELSE 'LIQ' END AS cod_estado_comprobante,
         |       CASE WHEN o_orderkey % 9 = 0 THEN 'REV' ELSE 'STD' END AS cod_procedimiento,
         |       CAST(o_orderkey % 6 AS STRING) AS cod_almacen,
         |       CASE WHEN o_orderkey % 4 = 0 THEN 'GRA' ELSE 'NIN' END AS cod_documento_almacen,
         |       CONCAT('A', CAST(o_orderkey AS STRING)) AS nro_documento_almacen,
         |       '200' AS cod_documento_pedido,
         |       CONCAT('P', CAST(o_orderkey AS STRING)) AS nro_documento_pedido,
         |       CAST(r.r_regionkey AS STRING) AS cod_forma_pago,
         |       CAST(o_orderkey % 40 AS STRING) AS cod_vendedor,
         |       CAST(o_orderkey % 40 AS STRING) AS cod_supervisor,
         |       CAST(o_custkey % 3 AS STRING) AS cod_fuerza_venta,
         |       CAST(o_custkey % 9 AS STRING) AS cod_modulo,
         |       CAST(o_custkey % 4 AS STRING) AS cod_lista_precio,
         |       CAST(o_custkey % 15 AS STRING) AS cod_zona,
         |       CAST((o_custkey % 9) % 5 AS STRING) AS cod_ruta,
         |       CASE WHEN o_orderkey % 17 = 0 THEN 'RCH' ELSE NULL END AS cod_motivo_rechazo,
         |       CASE WHEN o_orderkey % 5 = 0 THEN 'DOL'
         |            WHEN o_orderkey % 5 = 1 THEN 'USD' ELSE 'SOL' END AS cod_moneda,
         |       CASE WHEN o_orderkey % 7 = 0 THEN 'T'
         |            WHEN o_orderkey % 7 = 1 THEN NULL ELSE 'F' END AS flg_facglob,
         |       CASE WHEN o_orderkey % 19 = 0 THEN 'T'
         |            WHEN o_orderkey % 19 = 1 THEN NULL ELSE 'F' END AS flg_refact,
         |       CAST(CASE o_orderkey % 5 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4
         |            WHEN 3 THEN 5 ELSE 8 END AS DECIMAL(18,6)) AS tipo_cambio_mn,
         |       CASE WHEN o_orderkey % 23 = 0 THEN CAST(0 AS DECIMAL(18,6))
         |            ELSE CAST(CASE o_orderkey % 4 WHEN 0 THEN 2 WHEN 1 THEN 4
         |                 WHEN 2 THEN 5 ELSE 10 END AS DECIMAL(18,6)) END AS tipo_cambio_me,
         |       CAST(o_orderdate AS DATE) AS fecha_liquidacion,
         |       CAST(o_orderdate AS DATE) AS fecha_emision,
         |       CAST(o_orderdate AS DATE) AS fecha_pedido,
         |       CAST(CONCAT(CAST(CAST(o_orderdate AS DATE) AS STRING), ' ',
         |            lpad(CAST(o_orderkey % 24 AS STRING), 2, '0'), ':00:00') AS TIMESTAMP) AS fecha_creacion,
         |       CAST(CONCAT(CAST(CAST(o_orderdate AS DATE) AS STRING), ' ',
         |            lpad(CAST(o_orderkey % 24 AS STRING), 2, '0'), ':30:00') AS TIMESTAMP) AS fecha_modificacion
         |FROM orders,
         |     (SELECT r_regionkey FROM region) r
         |WHERE r.r_regionkey = o_orderkey % 5""".stripMargin,

    "t_documento_venta_detalle" ->
      s"""SELECT CAST(l_orderkey AS STRING) AS nro_comprobante_venta,
         |       lpad(CAST(o.o_custkey % 25 AS STRING), 2, '0') AS cod_compania,
         |       lpad(CAST(o.o_custkey % 5 AS STRING), 2, '0') AS cod_sucursal,
         |       CAST(l_partkey AS STRING) AS cod_articulo,
         |       CAST(l_orderkey % 6 AS STRING) AS cod_almacen,
         |       CASE l_orderkey % 11 WHEN 0 THEN 'NCC' WHEN 1 THEN 'CMD'
         |            WHEN 2 THEN 'RMD' WHEN 3 THEN 'BOL' ELSE 'FAC' END AS cod_documento_transaccion,
         |       CASE l_orderkey % 11 WHEN 0 THEN 'NCC' WHEN 1 THEN 'CMD'
         |            WHEN 2 THEN 'RMD' WHEN 3 THEN 'BOL' ELSE 'FAC' END AS cod_operacion,
         |       CASE WHEN l_orderkey % 9 = 0 THEN 'REV' ELSE 'STD' END AS cod_procedimiento,
         |       CAST(l_quantity AS DECIMAL(18,6)) AS cant_paquete,
         |       CAST(l_quantity * (1 + l_linenumber % 3) AS DECIMAL(18,6)) AS cant_unidad,
         |       CAST(l_extendedprice AS DECIMAL(18,6)) AS imp_valorizado,
         |       CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS imp_cobrar,
         |       CAST(l_extendedprice * l_discount AS DECIMAL(18,6)) AS imp_descuento,
         |       CAST(l_extendedprice * l_discount * 0.9 AS DECIMAL(18,6)) AS imp_descuento_sinimp,
         |       CAST(l_extendedprice * l_tax AS DECIMAL(18,6)) AS imp_igv,
         |       CAST(l_extendedprice * 0.02 AS DECIMAL(18,6)) AS imp_isc,
         |       CAST(l_extendedprice * 0.002 AS DECIMAL(18,6)) AS imp_im3,
         |       CAST(l_extendedprice * 0.003 AS DECIMAL(18,6)) AS imp_im4,
         |       CAST(l_extendedprice * 0.004 AS DECIMAL(18,6)) AS imp_im5,
         |       CAST(l_extendedprice * 0.005 AS DECIMAL(18,6)) AS imp_im6,
         |       CAST(l_extendedprice * 0.01 AS DECIMAL(18,6)) AS precio_paquete,
         |       CAST(o.o_orderdate AS DATE) AS fecha_liquidacion,
         |       CAST(CONCAT(CAST(CAST(o.o_orderdate AS DATE) AS STRING), ' 08:00:00') AS TIMESTAMP) AS fecha_creacion,
         |       CAST(CONCAT(CAST(CAST(o.o_orderdate AS DATE) AS STRING), ' 09:00:00') AS TIMESTAMP) AS fecha_modificacion
         |FROM lineitem
         |JOIN orders o ON l_orderkey = o.o_orderkey""".stripMargin,

    // ---- pedidos (orders-shaped)
    "t_documento_pedido" ->
      s"""SELECT '200' AS cod_documento_pedido,
         |       CONCAT('P', CAST(o_orderkey AS STRING)) AS nro_documento_pedido,
         |       ${co("o_custkey")} AS cod_compania,
         |       ${suc("o_custkey")} AS cod_sucursal,
         |       CAST(o_orderkey % 6 AS STRING) AS cod_almacen,
         |       CAST(o_custkey % 15 AS STRING) AS cod_zona_distribucion,
         |       CAST(o_custkey % 15 AS STRING) AS cod_centro_distribucion,
         |       CAST(o_orderkey % 5 AS STRING) AS cod_tipo_pedido,
         |       CASE WHEN o_orderkey % 3 = 0 THEN 'CONTADO' ELSE 'CREDITO' END AS cod_condicion_pago,
         |       CAST(o_orderkey % 40 AS STRING) AS cod_vendedor,
         |       CAST(o_custkey % 3 AS STRING) AS cod_fuerza_venta,
         |       CASE WHEN o_orderkey % 8 = 0
         |            THEN CONCAT('P', CAST(o_orderkey % 500 AS STRING))
         |            ELSE NULL END AS cod_documento_pedido_origen,
         |       CAST(o_orderdate AS DATE) AS fecha_pedido,
         |       CAST(o_orderdate AS DATE) AS fecha_entrega,
         |       CAST(CONCAT(CAST(CAST(o_orderdate AS DATE) AS STRING), ' 07:00:00') AS TIMESTAMP) AS fecha_creacion,
         |       CAST(CONCAT(CAST(CAST(o_orderdate AS DATE) AS STRING), ' 07:30:00') AS TIMESTAMP) AS fecha_modificacion
         |FROM orders""".stripMargin,

    "t_documento_pedido_detalle" ->
      s"""SELECT '200' AS cod_documento_pedido,
         |       CONCAT('P', CAST(l_orderkey AS STRING)) AS nro_documento_pedido,
         |       lpad(CAST(o.o_custkey % 25 AS STRING), 2, '0') AS cod_compania,
         |       lpad(CAST(o.o_custkey % 5 AS STRING), 2, '0') AS cod_sucursal,
         |       CAST(o.o_custkey AS STRING) AS cod_cliente,
         |       CAST(l_partkey AS STRING) AS cod_articulo,
         |       CAST(l_orderkey % 6 AS STRING) AS cod_almacen,
         |       CASE WHEN l_orderkey % 4 = 0 THEN 'GRA' ELSE 'NIN' END AS cod_documento_almacen,
         |       CONCAT('A', CAST(l_orderkey AS STRING)) AS nro_documento_almacen,
         |       CAST(o.o_custkey % 4 AS STRING) AS cod_lista_precio,
         |       CAST(o.o_custkey % 9 AS STRING) AS cod_modulo,
         |       CAST((o.o_custkey % 9) % 5 AS STRING) AS cod_ruta,
         |       CAST(o.o_custkey % 15 AS STRING) AS cod_zona,
         |       CASE WHEN l_orderkey % 9 = 0 THEN 'REV' ELSE 'STD' END AS cod_procedimiento,
         |       CONCAT('SF', CAST(l_orderkey AS STRING), '-', CAST(l_linenumber AS STRING)) AS id_salesforce,
         |       CAST(l_quantity AS DECIMAL(18,6)) AS cant_paquete,
         |       CAST(CASE WHEN l_linenumber % 4 = 0 THEN l_quantity * 0.5
         |            ELSE l_quantity END AS DECIMAL(18,6)) AS cant_paquete_asignado,
         |       CAST(l_quantity * (1 + l_linenumber % 3) AS DECIMAL(18,6)) AS cant_unidad,
         |       CAST(CASE WHEN l_linenumber % 4 = 0 THEN l_quantity * (1 + l_linenumber % 3) * 0.5
         |            ELSE l_quantity * (1 + l_linenumber % 3) END AS DECIMAL(18,6)) AS cant_unidad_asignado,
         |       CAST(o.o_orderdate AS DATE) AS fecha_pedido,
         |       CAST(CONCAT(CAST(CAST(o.o_orderdate AS DATE) AS STRING), ' 07:00:00') AS TIMESTAMP) AS fecha_creacion,
         |       CAST(CONCAT(CAST(CAST(o.o_orderdate AS DATE) AS STRING), ' 07:45:00') AS TIMESTAMP) AS fecha_modificacion
         |FROM lineitem
         |JOIN orders o ON l_orderkey = o.o_orderkey""".stripMargin,

    "t_documento_pedido_ades" ->
      s"""SELECT CASE o_orderkey % 4 WHEN 0 THEN '200' WHEN 1 THEN '300'
         |            WHEN 2 THEN 'GRA' ELSE 'NIN' END AS cod_documento_transaccion,
         |       CONCAT('CPB', CAST(o_orderkey AS STRING)) AS nro_comprobante,
         |       ${co("o_custkey")} AS cod_compania,
         |       ${suc("o_custkey")} AS cod_sucursal,
         |       CAST(o_orderkey % 6 AS STRING) AS cod_almacen_emisor,
         |       CAST(o_custkey % 15 AS STRING) AS cod_zona_distribucion,
         |       CAST(o_custkey % 15 AS STRING) AS cod_centro_distribucion,
         |       CAST(o_orderkey % 5 AS STRING) AS cod_tipo_pedido,
         |       '200' AS cod_tipo_documento_origen,
         |       CASE WHEN o_orderkey % 3 = 0 THEN 'CONTADO' ELSE 'CREDITO' END AS cod_condicion_pago,
         |       CAST(o_orderkey % 40 AS STRING) AS cod_vendedor,
         |       CAST(o_custkey % 3 AS STRING) AS cod_fuerza_venta,
         |       CAST(o_orderdate AS DATE) AS fecha_pedido,
         |       CAST(o_orderdate AS DATE) AS fecha_entrega,
         |       CAST(CONCAT(CAST(CAST(o_orderdate AS DATE) AS STRING), ' 06:00:00') AS TIMESTAMP) AS fecha_creacion,
         |       CAST(CONCAT(CAST(CAST(o_orderdate AS DATE) AS STRING), ' 06:30:00') AS TIMESTAMP) AS fecha_modificacion
         |FROM orders
         |WHERE o_orderkey % 2 = 0""".stripMargin,

    "t_documento_pedido_ades_detalle" ->
      s"""SELECT CASE l_orderkey % 4 WHEN 0 THEN '200' WHEN 1 THEN '300'
         |            WHEN 2 THEN 'GRA' ELSE 'NIN' END AS cod_documento_transaccion,
         |       CONCAT('CPB', CAST(l_orderkey AS STRING)) AS nro_comprobante,
         |       lpad(CAST(o.o_custkey % 25 AS STRING), 2, '0') AS cod_compania,
         |       lpad(CAST(o.o_custkey % 5 AS STRING), 2, '0') AS cod_sucursal,
         |       CAST(o.o_custkey AS STRING) AS cod_cliente,
         |       CAST(l_partkey AS STRING) AS cod_articulo,
         |       CAST(l_orderkey % 6 AS STRING) AS cod_almacen_emisor,
         |       'GRA' AS cod_tipo_documento_almacen,
         |       CONCAT('A', CAST(l_orderkey AS STRING)) AS nro_documento_almacen,
         |       CAST(o.o_custkey % 4 AS STRING) AS cod_lista_precios,
         |       CAST(o.o_custkey % 9 AS STRING) AS cod_modulo,
         |       CAST((o.o_custkey % 9) % 5 AS STRING) AS cod_ruta_distribucion,
         |       CAST(o.o_custkey % 15 AS STRING) AS cod_zona_distribucion,
         |       CASE WHEN l_orderkey % 9 = 0 THEN 'REV' ELSE 'STD' END AS cod_procedimiento,
         |       CONCAT('SF', CAST(l_orderkey AS STRING), '-', CAST(l_linenumber AS STRING)) AS id_salesforce,
         |       CAST(l_quantity AS DECIMAL(18,6)) AS cantidad_cajas,
         |       CAST(CASE WHEN l_linenumber % 4 = 0 THEN l_quantity * 0.5
         |            ELSE l_quantity END AS DECIMAL(18,6)) AS cantidad_cajas_asignada,
         |       CAST(l_quantity * 12 AS DECIMAL(18,6)) AS cantidad_botellas,
         |       CAST(CASE WHEN l_linenumber % 4 = 0 THEN l_quantity * 6
         |            ELSE l_quantity * 12 END AS DECIMAL(18,6)) AS cantidad_botellas_asignada,
         |       CAST(o.o_orderdate AS DATE) AS fecha_pedido,
         |       CAST(CONCAT(CAST(CAST(o.o_orderdate AS DATE) AS STRING), ' 06:00:00') AS TIMESTAMP) AS fecha_creacion,
         |       CAST(CONCAT(CAST(CAST(o.o_orderdate AS DATE) AS STRING), ' 06:45:00') AS TIMESTAMP) AS fecha_modificacion
         |FROM lineitem
         |JOIN orders o ON l_orderkey = o.o_orderkey
         |WHERE l_orderkey % 2 = 0""".stripMargin,

    // ---- inventory movements (orders/lineitem-shaped)
    "t_movimiento_inventario" ->
      s"""SELECT ${co("o_custkey")} AS cod_compania,
         |       ${suc("o_custkey")} AS cod_sucursal,
         |       CASE o_orderkey % 5 WHEN 0 THEN 'GRA' WHEN 1 THEN 'NIN'
         |            WHEN 2 THEN '200' WHEN 3 THEN '300' ELSE 'DCV' END AS cod_documento_transaccion,
         |       CASE o_orderkey % 5 WHEN 0 THEN 'GRA' WHEN 1 THEN 'NIN'
         |            WHEN 2 THEN '200' WHEN 3 THEN '300' ELSE 'DCV' END AS cod_documento_transaccion1,
         |       CAST(o_orderkey AS STRING) AS nro_documento_movimiento,
         |       CONCAT('A', CAST(o_orderkey AS STRING)) AS nro_documento_almacen,
         |       CONCAT('A', CAST(o_orderkey AS STRING)) AS nro_documento_almacen1,
         |       CASE WHEN o_orderkey % 6 = 0
         |            THEN CONCAT('A', CAST(o_orderkey % 700 AS STRING))
         |            ELSE NULL END AS nro_documento_almacen_referencia2,
         |       CASE WHEN o_orderkey % 6 = 0 THEN '300' ELSE NULL END AS cod_tipo_documento_referencia2,
         |       CASE WHEN o_orderkey % 13 = 0 THEN '002'
         |            WHEN o_orderkey % 13 < 7 THEN 'PLI' ELSE 'LIQ' END AS cod_estado_comprobante,
         |       CASE o_orderkey % 5 WHEN 0 THEN 'GRA' WHEN 1 THEN 'NIN'
         |            WHEN 2 THEN '200' WHEN 3 THEN '300' ELSE 'DCV' END AS cod_procedimiento,
         |       CAST(o_orderkey % 6 AS STRING) AS cod_almacen_emisor_origen,
         |       CAST(o_orderkey % 100 AS STRING) AS cod_chofer,
         |       CAST(o_orderkey % 100 AS STRING) AS cod_transportista,
         |       CAST(o_orderkey % 100 AS STRING) AS cod_vehiculo,
         |       'FLT' AS cod_tipo_documento_liquidacion,
         |       CONCAT('L', CAST(o_orderkey AS STRING)) AS nro_documento_liquidacion,
         |       CONCAT('S', CAST(o_orderkey % 10 AS STRING)) AS nro_serie_alm,
         |       CAST(o_orderkey % 1000 AS STRING) AS nropricoal,
         |       CONCAT(${co("o_custkey")}, '|', ${suc("o_custkey")}, '|',
         |              CAST(o_orderkey % 6 AS STRING)) AS id_almacen,
         |       CASE WHEN o_orderkey % 6 = 0
         |            THEN CONCAT(${co("o_custkey")}, '|', ${suc("o_custkey")}, '|',
         |                 CAST((o_orderkey + 1) % 6 AS STRING))
         |            ELSE NULL END AS id_almacen_referencia,
         |       ${co("o_custkey")} AS id_compania_referencia,
         |       CONCAT('GRA', '|', 'A', CAST(o_orderkey AS STRING)) AS id_documento_almacen,
         |       CONCAT('MV', CAST(o_orderkey AS STRING)) AS id_movimiento_almacen,
         |       CASE WHEN o_orderkey % 4 = 0
         |            THEN CONCAT('MV', CAST(o_orderkey % 900 AS STRING))
         |            ELSE NULL END AS id_movimiento_ingreso,
         |       CONCAT(${co("o_custkey")}, '|', CAST(o_orderkey % 100 AS STRING)) AS id_persona,
         |       CONCAT(${co("o_custkey")}, '|STD') AS id_procedimiento,
         |       CONCAT(${co("o_custkey")}, '|', ${suc("o_custkey")}, '|',
         |              CAST(o_orderkey % 6 AS STRING), '|GRA|A',
         |              CAST(o_orderkey AS STRING)) AS id_reparto,
         |       CONCAT(${co("o_custkey")}, '|', ${suc("o_custkey")}) AS id_sucursal,
         |       CONCAT(${co("o_custkey")}, '|', ${suc("o_custkey")}) AS id_sucursal_referencia,
         |       CONCAT(${co("o_custkey")}, '|', CAST(o_orderkey % 100 AS STRING)) AS id_transportista,
         |       CONCAT(${co("o_custkey")}, '|', CAST(o_orderkey % 100 AS STRING)) AS id_vehiculo,
         |       CONCAT(${co("o_custkey")}, '|', CAST(o_orderkey % 40 AS STRING)) AS id_vendedor,
         |       CAST(o_orderdate AS DATE) AS fecha_almacen,
         |       CAST(o_orderdate AS DATE) AS fecha_emision,
         |       CAST(o_orderdate AS DATE) AS fecha_liquidacion,
         |       CAST(CONCAT(CAST(CAST(o_orderdate AS DATE) AS STRING), ' 05:00:00') AS TIMESTAMP) AS fecha_creacion,
         |       CAST(CONCAT(CAST(CAST(o_orderdate AS DATE) AS STRING), ' 05:30:00') AS TIMESTAMP) AS fecha_modificacion,
         |       'etl' AS usuario_creacion,
         |       'etl' AS usuario_modificacion
         |FROM orders""".stripMargin,

    "t_movimiento_inventario_detalle" ->
      s"""SELECT lpad(CAST(o.o_custkey % 25 AS STRING), 2, '0') AS cod_compania,
         |       lpad(CAST(o.o_custkey % 25 AS STRING), 2, '0') AS id_compania,
         |       CASE l_orderkey % 5 WHEN 0 THEN 'GRA' WHEN 1 THEN 'NIN'
         |            WHEN 2 THEN '200' WHEN 3 THEN '300' ELSE 'DCV' END AS cod_documento_transaccion,
         |       CASE WHEN l_orderkey % 6 = 0 THEN '300' ELSE NULL END AS cod_documento_transaccion_ref,
         |       CAST(l_orderkey AS STRING) AS nro_documento_movimiento,
         |       CONCAT('A', CAST(l_orderkey AS STRING)) AS nro_documento_almacen,
         |       CASE WHEN l_orderkey % 6 = 0
         |            THEN CONCAT('A', CAST(l_orderkey % 700 AS STRING))
         |            ELSE NULL END AS nro_documento_almacen_ref,
         |       CAST(l_linenumber AS STRING) AS nro_linea_comprobante,
         |       CAST(l_linenumber AS STRING) AS nro_secuencia_origen,
         |       CAST(l_partkey AS STRING) AS cod_articulo,
         |       CASE l_orderkey % 5 WHEN 0 THEN 'GRA' WHEN 1 THEN 'NIN'
         |            WHEN 2 THEN '200' WHEN 3 THEN '300' ELSE 'DCV' END AS cod_procedimiento,
         |       CASE WHEN l_linenumber % 3 = 0 THEN 'MRM' ELSE NULL END AS cod_motivo,
         |       'CAJ' AS cod_unidad_articulo,
         |       CASE WHEN l_orderkey % 2 = 0 THEN 'I' ELSE 'S' END AS operacion_kardex,
         |       CASE WHEN l_orderkey % 13 = 0 THEN '002' ELSE 'PLI' END AS estado,
         |       CASE WHEN l_orderkey % 13 = 0 THEN '002' ELSE 'PLI' END AS cod_estado_comprobante,
         |       CAST(l_quantity AS DECIMAL(18,6)) AS cant_cajas,
         |       CAST(l_quantity * 12 AS DECIMAL(18,6)) AS cant_botellas,
         |       CAST(l_quantity * (1 + l_linenumber % 3) AS DECIMAL(18,6)) AS cant_unidades,
         |       CAST(l_extendedprice * 0.05 AS DECIMAL(18,6)) AS costo_unitario,
         |       CAST(l_extendedprice AS DECIMAL(18,6)) AS costo_total,
         |       CONCAT(lpad(CAST(o.o_custkey % 25 AS STRING), 2, '0'), '|',
         |              lpad(CAST(o.o_custkey % 5 AS STRING), 2, '0'), '|',
         |              CAST(l_orderkey % 6 AS STRING)) AS id_almacen,
         |       CONCAT(lpad(CAST(o.o_custkey % 25 AS STRING), 2, '0'), '|',
         |              CAST(l_partkey AS STRING)) AS id_articulo,
         |       CONCAT('CC', CAST(l_orderkey % 20 AS STRING)) AS id_centro_costo,
         |       CONCAT('MV', CAST(l_orderkey AS STRING)) AS id_movimiento_almacen,
         |       CONCAT(lpad(CAST(o.o_custkey % 25 AS STRING), 2, '0'), '|',
         |              lpad(CAST(o.o_custkey % 5 AS STRING), 2, '0')) AS id_sucursal,
         |       CAST(o.o_orderdate AS DATE) AS fecha_almacen,
         |       CAST(CONCAT(CAST(CAST(o.o_orderdate AS DATE) AS STRING), ' 05:00:00') AS TIMESTAMP) AS fecha_creacion,
         |       CAST(CONCAT(CAST(CAST(o.o_orderdate AS DATE) AS STRING), ' 05:45:00') AS TIMESTAMP) AS fecha_modificacion,
         |       'etl' AS usuario_creacion,
         |       'etl' AS usuario_modificacion
         |FROM lineitem
         |JOIN orders o ON l_orderkey = o.o_orderkey""".stripMargin,

    "t_movimiento_inventario_transito" ->
      s"""SELECT ${co("o_custkey")} AS cod_compania,
         |       CASE WHEN o_orderkey % 13 = 0 THEN '002' ELSE 'PLI' END AS estado,
         |       CONCAT(${co("o_custkey")}, '|', ${suc("o_custkey")}, '|',
         |              CAST((o_orderkey + 1) % 6 AS STRING)) AS id_almacen_destino,
         |       ${co("o_custkey")} AS id_compania_destino,
         |       CONCAT('GRA', '|', 'A', CAST(o_orderkey AS STRING)) AS id_documento_almacen,
         |       CONCAT(${co("o_custkey")}, '|', ${suc("o_custkey")}) AS id_sucursal_destino
         |FROM orders
         |WHERE o_orderkey % 3 = 0""".stripMargin,

    // ---- inventory snapshots
    "t_cierre_inventario_cpm" ->
      """SELECT CONCAT(lpad(CAST(n_nationkey AS STRING), 2, '0'), '|',
        |              CAST(p_partkey AS STRING)) AS id_articulo,
        |       CONCAT('19950', CAST(4 + p_partkey % 3 AS STRING)) AS id_periodo,
        |       CONCAT(lpad(CAST(n_nationkey AS STRING), 2, '0'), '|',
        |              lpad(CAST(n_nationkey % 5 AS STRING), 2, '0')) AS id_sucursal,
        |       CAST(p_retailprice * 0.1 AS DECIMAL(18,6)) AS imp_cpm,
        |       CAST(p_retailprice AS DECIMAL(18,6)) AS imp_saldo_inicial,
        |       CAST(p_retailprice * 0.3 AS DECIMAL(18,6)) AS imp_ingreso,
        |       CAST(p_retailprice * 0.2 AS DECIMAL(18,6)) AS imp_salida,
        |       CAST(p_retailprice * 1.1 AS DECIMAL(18,6)) AS imp_saldo_final
        |FROM part JOIN nation ON p_partkey % 1 = n_nationkey % 1""".stripMargin,

    "t_toma_inventario" ->
      s"""SELECT ${co("o_custkey")} AS cod_compania,
         |       ${co("o_custkey")} AS id_compania,
         |       CONCAT(${co("o_custkey")}, '|', ${suc("o_custkey")}) AS id_sucursal,
         |       CAST(o_orderkey % 6 AS STRING) AS cod_almacen_emisor,
         |       CAST((o_custkey % 25) + 25 * (o_orderkey % 4) AS STRING) AS cod_empleado_aprobador,
         |       CASE WHEN o_orderkey % 7 = 0 THEN 'ANU' ELSE 'PLI' END AS estado,
         |       CAST(CONCAT('1995-0', CAST(4 + o_orderkey % 3 AS STRING), '-',
         |            lpad(CAST(1 + o_orderkey % 28 AS STRING), 2, '0')) AS DATE) AS fecha_inventario,
         |       CAST(CONCAT(CAST(CAST(o_orderdate AS DATE) AS STRING), ' 04:00:00') AS TIMESTAMP) AS fecha_creacion,
         |       CAST(CONCAT(CAST(CAST(o_orderdate AS DATE) AS STRING), ' 04:30:00') AS TIMESTAMP) AS fecha_modificacion,
         |       'etl' AS usuario_creacion,
         |       'etl' AS usuario_modificacion
         |FROM orders
         |WHERE o_orderkey % 4 = 0""".stripMargin,

    "t_toma_inventario_detalle" ->
      """SELECT CONCAT(lpad(CAST(o.o_custkey % 25 AS STRING), 2, '0'), '|',
        |              lpad(CAST(o.o_custkey % 5 AS STRING), 2, '0')) AS id_sucursal,
        |       CONCAT(lpad(CAST(o.o_custkey % 25 AS STRING), 2, '0'), '|',
        |              lpad(CAST(o.o_custkey % 5 AS STRING), 2, '0'), '|',
        |              CAST(l_orderkey % 6 AS STRING)) AS id_almacen,
        |       CONCAT(lpad(CAST(o.o_custkey % 25 AS STRING), 2, '0'), '|',
        |              CAST(l_partkey AS STRING)) AS id_articulo,
        |       CAST(l_orderkey % 6 AS STRING) AS cod_almacen_emisor,
        |       CAST(CONCAT('1995-0', CAST(4 + l_orderkey % 3 AS STRING), '-',
        |            lpad(CAST(1 + l_orderkey % 28 AS STRING), 2, '0')) AS DATE) AS fecha_inventario,
        |       CAST(l_quantity * 2 AS DECIMAL(18,6)) AS stock_final
        |FROM lineitem
        |JOIN orders o ON l_orderkey = o.o_orderkey
        |WHERE l_orderkey % 4 = 0""".stripMargin,

    // ---- visits (customer-shaped, dates inside the period window)
    "t_visita" ->
      s"""SELECT CAST(c_custkey AS STRING) AS cod_cliente,
         |       ${co("c_custkey")} AS cod_compania,
         |       ${suc("c_custkey")} AS cod_sucursal,
         |       CAST(c_custkey % 3 AS STRING) AS cod_fuerza_venta,
         |       ${dt("c_custkey")} AS fecha_visita,
         |       ${ts("c_custkey + 2")} AS fecha_modificacion
         |FROM customer""".stripMargin
  )

  val tables: Seq[String] = sql.map(_._1)

  /** Register every stage table as temp view `stage_<name>` (testdata
    * views registered first). Idempotent per session. */
  def register(spark: SparkSession, dir: String): Unit = {
    Tables.registerViews(spark, dir)
    sql.foreach { case (name, s) =>
      spark.sql(s).createOrReplaceTempView(s"stage_$name")
    }
  }

  /** Coverage check: every column the 52 jobs reference on a stage table
    * exists in its synthesized schema. Returns missing (table, column)
    * pairs — spec-asserted empty. */
  def missingColumns(spark: SparkSession, dir: String): Seq[(String, String)] = {
    register(spark, dir)
    ConformanceJobs.stageColumns.toSeq.sortBy(_._1).flatMap {
      case (table, cols) =>
        if (!tables.contains(table)) cols.map(c => (table, c))
        else {
          val have = spark.table(s"stage_$table").columns.map(_.toLowerCase).toSet
          cols.filterNot(c => have.contains(c.toLowerCase) || c == "*")
            .map(c => (table, c))
        }
    }
  }
}
