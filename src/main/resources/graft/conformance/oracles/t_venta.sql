WITH stage_m_pais AS (
  SELECT CAST(r_regionkey AS VARCHAR) AS cod_pais,
         ('PA' || CAST(r_regionkey AS VARCHAR)) AS id_pais,
         r_name AS desc_pais,
         CASE WHEN r_regionkey < 2 THEN 'AMERICA' ELSE 'EMEA' END AS continente
  FROM region
),
stage_m_compania AS (
  SELECT lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS cod_compania,
         lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS id_compania,
         CAST(n_regionkey AS VARCHAR) AS cod_pais,
         n_name AS desc_compania,
         CASE WHEN n_nationkey % 7 = 0 THEN '0' ELSE '1' END AS es_activo,
         CAST(('1995-0' || CAST(4 + (n_nationkey) % 3 AS VARCHAR) || '-' || lpad(CAST(1 + (n_nationkey) % 28 AS VARCHAR), 2, '0')) AS DATE) AS fecha_creacion,
         CAST(('1995-0' || CAST(4 + (n_nationkey + 1) % 3 AS VARCHAR) || '-' || lpad(CAST(1 + (n_nationkey + 1) % 28 AS VARCHAR), 2, '0')) AS DATE) AS fecha_modificacion
  FROM nation
),
stage_m_parametro AS (
  SELECT lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS id_compania,
         'SOL' AS cod_moneda_mn
  FROM nation
),
stage_m_region AS (
  SELECT DISTINCT CAST(n_regionkey AS VARCHAR) AS cod_pais,
         CAST(n_nationkey % 4 AS VARCHAR) AS cod_region,
         ('REGION ' || CAST(n_nationkey % 4 AS VARCHAR)) AS desc_region,
         1 AS es_activo
  FROM nation
),
stage_m_subregion AS (
  SELECT DISTINCT CAST(n_regionkey AS VARCHAR) AS cod_pais,
         CAST(n_nationkey % 4 AS VARCHAR) AS cod_region,
         CAST(n_nationkey % 8 AS VARCHAR) AS cod_subregion,
         ('SUBREGION ' || CAST(n_nationkey % 8 AS VARCHAR)) AS desc_subregion,
         1 AS es_activo
  FROM nation
),
stage_m_zona AS (
  SELECT DISTINCT lpad(CAST((c_custkey) % 25 AS VARCHAR), 2, '0') AS cod_compania,
         lpad(CAST((c_custkey) % 5 AS VARCHAR), 2, '0') AS cod_sucursal,
         CAST(c_custkey % 15 AS VARCHAR) AS cod_zona,
         CAST((c_custkey % 15) % 4 AS VARCHAR) AS cod_region,
         CAST((c_custkey % 15) % 8 AS VARCHAR) AS cod_subregion,
         ('ZONA ' || CAST(c_custkey % 15 AS VARCHAR)) AS desc_zona,
         CAST(c_custkey % 15 AS VARCHAR) AS cod_centro_distribucion,
         CAST((c_custkey % 15) * 5 % 40 AS VARCHAR) AS cod_supervisor,
         1 AS es_activo
  FROM customer
),
stage_m_division AS (
  SELECT DISTINCT lpad(CAST((c_custkey) % 25 AS VARCHAR), 2, '0') AS cod_compania,
         CAST(c_custkey % 15 AS VARCHAR) AS cod_division,
         ('DIVISION ' || CAST(c_custkey % 15 AS VARCHAR)) AS desc_division,
         CAST((c_custkey % 15) * 3 % 40 AS VARCHAR) AS cod_jefe_venta,
         '1' AS es_activo
  FROM customer
),
stage_m_tipo_cambio AS (
  SELECT DISTINCT lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS cod_compania,
         lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS id_compania,
         m.moneda AS cod_moneda,
         CAST(o_orderdate AS DATE) AS fecha,
         CASE WHEN CAST(substring(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 9, 2) AS INT) = 13
              THEN CAST(0 AS DECIMAL(18,6))
              ELSE CAST(CASE CAST(substring(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 9, 2) AS INT) % 4
                   WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 5
                   END AS DECIMAL(18,6)) END AS tc_compra,
         CAST(CASE CAST(substring(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 9, 2) AS INT) % 4
              WHEN 0 THEN 2 WHEN 1 THEN 4 WHEN 2 THEN 5 ELSE 8
              END AS DECIMAL(18,6)) AS tc_venta
  FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS o_orderdate FROM orders) d
       JOIN nation ON year(d.o_orderdate) % 1 = n_nationkey % 1
       JOIN (SELECT CASE WHEN r_regionkey = 0 THEN 'DOL' ELSE 'SOL' END AS moneda
        FROM region WHERE r_regionkey < 2) m
       ON n_nationkey % 1 = length(m.moneda) % 1
),
stage_t_documento_venta AS (
  SELECT CAST(o_custkey AS VARCHAR) AS cod_cliente,
         lpad(CAST((o_custkey) % 25 AS VARCHAR), 2, '0') AS cod_compania,
         lpad(CAST((o_custkey) % 5 AS VARCHAR), 2, '0') AS cod_sucursal,
         CASE o_orderkey % 11 WHEN 0 THEN 'NCC' WHEN 1 THEN 'CMD'
              WHEN 2 THEN 'RMD' WHEN 3 THEN 'BOL' ELSE 'FAC' END AS cod_documento_venta,
         CAST(o_orderkey AS VARCHAR) AS nro_documento_venta,
         ('CPB' || CAST(o_orderkey AS VARCHAR)) AS nro_comprobante,
         CASE WHEN o_orderkey % 13 = 0 THEN '002'
              WHEN o_orderkey % 13 < 7 THEN 'PLI' ELSE 'LIQ' END AS cod_estado_comprobante,
         CASE WHEN o_orderkey % 9 = 0 THEN 'REV' ELSE 'STD' END AS cod_procedimiento,
         CAST(o_orderkey % 6 AS VARCHAR) AS cod_almacen,
         CASE WHEN o_orderkey % 4 = 0 THEN 'GRA' ELSE 'NIN' END AS cod_documento_almacen,
         ('A' || CAST(o_orderkey AS VARCHAR)) AS nro_documento_almacen,
         '200' AS cod_documento_pedido,
         ('P' || CAST(o_orderkey AS VARCHAR)) AS nro_documento_pedido,
         CAST(r.r_regionkey AS VARCHAR) AS cod_forma_pago,
         CAST(o_orderkey % 40 AS VARCHAR) AS cod_vendedor,
         CAST(o_orderkey % 40 AS VARCHAR) AS cod_supervisor,
         CAST(o_custkey % 3 AS VARCHAR) AS cod_fuerza_venta,
         CAST(o_custkey % 9 AS VARCHAR) AS cod_modulo,
         CAST(o_custkey % 4 AS VARCHAR) AS cod_lista_precio,
         CAST(o_custkey % 15 AS VARCHAR) AS cod_zona,
         CAST((o_custkey % 9) % 5 AS VARCHAR) AS cod_ruta,
         CASE WHEN o_orderkey % 17 = 0 THEN 'RCH' ELSE NULL END AS cod_motivo_rechazo,
         CASE WHEN o_orderkey % 5 = 0 THEN 'DOL'
              WHEN o_orderkey % 5 = 1 THEN 'USD' ELSE 'SOL' END AS cod_moneda,
         CASE WHEN o_orderkey % 7 = 0 THEN 'T'
              WHEN o_orderkey % 7 = 1 THEN NULL ELSE 'F' END AS flg_facglob,
         CASE WHEN o_orderkey % 19 = 0 THEN 'T'
              WHEN o_orderkey % 19 = 1 THEN NULL ELSE 'F' END AS flg_refact,
         CAST(CASE o_orderkey % 5 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4
              WHEN 3 THEN 5 ELSE 8 END AS DECIMAL(18,6)) AS tipo_cambio_mn,
         CASE WHEN o_orderkey % 23 = 0 THEN CAST(0 AS DECIMAL(18,6))
              ELSE CAST(CASE o_orderkey % 4 WHEN 0 THEN 2 WHEN 1 THEN 4
                   WHEN 2 THEN 5 ELSE 10 END AS DECIMAL(18,6)) END AS tipo_cambio_me,
         CAST(o_orderdate AS DATE) AS fecha_liquidacion,
         CAST(o_orderdate AS DATE) AS fecha_emision,
         CAST(o_orderdate AS DATE) AS fecha_pedido,
         CAST((CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || ' ' || lpad(CAST(o_orderkey % 24 AS VARCHAR), 2, '0') || ':00:00') AS TIMESTAMP) AS fecha_creacion,
         CAST((CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || ' ' || lpad(CAST(o_orderkey % 24 AS VARCHAR), 2, '0') || ':30:00') AS TIMESTAMP) AS fecha_modificacion
  FROM orders,
       (SELECT r_regionkey FROM region) r
  WHERE r.r_regionkey = o_orderkey % 5
),
step_t_venta_df_t_historico_venta AS (
  SELECT *
  FROM stage_t_documento_venta
  WHERE (strftime(fecha_liquidacion, '%Y%m') IN ('199504', '199505', '199506'))
),
step_t_venta_df_m_compania AS (
  SELECT mp.id_pais AS id_pais,
         mc.cod_compania AS id_compania,
         mc.cod_compania AS cod_compania,
         mc.cod_pais AS cod_pais,
         mpar.cod_moneda_mn AS moneda_mn
  FROM stage_m_compania AS mc
  LEFT JOIN stage_m_parametro AS mpar ON (mpar.id_compania = mc.id_compania)
  JOIN stage_m_pais AS mp ON (mp.cod_pais = mc.cod_pais)
),
step_t_venta_df_t_historico_venta_filter AS (
  SELECT mc.id_pais AS id_pais,
         strftime(tp.fecha_liquidacion, '%Y%m') AS id_periodo,
         concat_ws('|', tp.cod_compania, tp.cod_sucursal, cod_almacen, tp.cod_documento_venta, nro_documento_venta) AS id_venta,
         tp.cod_compania AS id_compania,
         concat_ws('|', tp.cod_compania, tp.cod_sucursal) AS id_sucursal,
         concat_ws('|', tp.cod_compania, tp.cod_sucursal, tp.cod_documento_pedido, tp.nro_documento_pedido, tp.cod_cliente) AS id_pedido,
         concat_ws('|', tp.cod_compania, tp.cod_documento_venta, tp.cod_procedimiento) AS id_tipo_venta,
         concat_ws('|', tp.cod_compania, tp.cod_cliente) AS id_cliente,
         concat_ws('|', tp.cod_compania, tp.cod_sucursal, tp.cod_fuerza_venta) AS id_fuerza_venta,
         concat_ws('|', tp.cod_compania, tp.cod_vendedor) AS id_vendedor,
         concat_ws('|', tp.cod_compania, tp.cod_supervisor) AS id_supervisor,
         NULL AS id_jefe_venta,
         concat_ws('|', tp.cod_compania, tp.cod_lista_precio) AS id_lista_precio,
         concat_ws('|', tp.cod_compania, tp.cod_documento_pedido) AS id_tipo_documento,
         concat_ws('|', tp.cod_compania, tp.cod_forma_pago) AS id_forma_pago,
         concat_ws('|', tp.cod_compania, tp.cod_motivo_rechazo) AS id_motivo_rechazo,
         NULL AS id_motivo_nota_credito,
         tp.cod_documento_venta AS cod_documento_venta,
         nro_comprobante AS nro_venta,
         NULL AS nro_venta_ref,
         coalesce(mr.desc_region, 'REGION DEFAULT') AS desc_region,
         coalesce(msr.desc_subregion, 'SUBREGION DEFAULT') AS desc_subregion,
         mcd.desc_division AS desc_division,
         tp.cod_zona AS cod_zona,
         tp.cod_ruta AS cod_ruta,
         tp.cod_modulo AS cod_modulo,
         tp.fecha_liquidacion AS fecha_liquidacion,
         tp.fecha_emision AS fecha_emision,
         tp.fecha_pedido AS fecha_pedido,
         CASE WHEN (tp.cod_estado_comprobante = '002') THEN 1 ELSE 0 END AS es_anulado,
         coalesce(CASE WHEN (tp.cod_moneda = mc.moneda_mn) THEN 1 ELSE mtc.tc_venta END, tp.tipo_cambio_mn) AS tipo_cambio_mn,
         coalesce(CASE WHEN ((tp.cod_moneda = 'DOL') OR (tp.cod_moneda = 'USD')) THEN 1 ELSE mtc.tc_venta END, CASE WHEN (tp.tipo_cambio_me = 0) THEN 1 ELSE tp.tipo_cambio_me END) AS tipo_cambio_me,
         tp.fecha_creacion AS fecha_creacion,
         tp.fecha_modificacion AS fecha_modificacion,
         CASE WHEN (tp.cod_estado_comprobante = '002') THEN 1 ELSE 0 END AS es_eliminado
  FROM step_t_venta_df_t_historico_venta AS tp
  JOIN step_t_venta_df_m_compania AS mc ON (tp.cod_compania = mc.cod_compania)
  LEFT JOIN stage_m_zona AS mzo ON (((mzo.cod_compania = tp.cod_compania) AND (mzo.cod_sucursal = tp.cod_sucursal)) AND (mzo.cod_zona = tp.cod_zona))
  LEFT JOIN stage_m_division AS mcd ON ((mcd.cod_division = mzo.cod_zona) AND (mcd.cod_compania = mzo.cod_compania))
  LEFT JOIN stage_m_region AS mr ON ((mr.cod_pais = mc.cod_pais) AND (mr.cod_region = mzo.cod_region))
  LEFT JOIN stage_m_subregion AS msr ON (((msr.cod_pais = mc.cod_pais) AND (msr.cod_region = mzo.cod_region)) AND (msr.cod_subregion = mzo.cod_subregion))
  LEFT JOIN stage_m_tipo_cambio AS mtc ON (((mtc.fecha = tp.fecha_emision) AND (mtc.cod_compania = mc.cod_compania)) AND (mtc.cod_moneda = mc.moneda_mn))
  WHERE (((NOT (tp.cod_documento_venta IN ('CMD', 'RMD'))) AND (coalesce(tp.flg_facglob, 'F') = 'F')) AND (coalesce(tp.flg_refact, 'F') = 'F'))
),
step_t_venta_df_dom_t_venta AS (
  SELECT CAST(tv.id_pais AS VARCHAR) AS id_pais,
         CAST(tv.id_periodo AS VARCHAR) AS id_periodo,
         CAST(tv.id_venta AS VARCHAR) AS id_venta,
         CAST(tv.id_compania AS VARCHAR) AS id_compania,
         CAST(tv.id_sucursal AS VARCHAR) AS id_sucursal,
         CAST(tv.id_pedido AS VARCHAR) AS id_pedido,
         CAST(tv.id_tipo_venta AS VARCHAR) AS id_tipo_venta,
         CAST(tv.id_cliente AS VARCHAR) AS id_cliente,
         CAST(tv.id_fuerza_venta AS VARCHAR) AS id_fuerza_venta,
         CAST(tv.id_vendedor AS VARCHAR) AS id_vendedor,
         CAST(tv.id_supervisor AS VARCHAR) AS id_supervisor,
         CAST(tv.id_jefe_venta AS VARCHAR) AS id_jefe_venta,
         CAST(tv.id_lista_precio AS VARCHAR) AS id_lista_precio,
         CAST(tv.id_tipo_documento AS VARCHAR) AS id_tipo_documento,
         CAST(tv.id_forma_pago AS VARCHAR) AS id_forma_pago,
         CAST(tv.id_motivo_rechazo AS VARCHAR) AS id_motivo_rechazo,
         CAST(tv.id_motivo_nota_credito AS VARCHAR) AS id_motivo_nota_credito,
         CAST(tv.cod_documento_venta AS VARCHAR) AS cod_documento_venta,
         CAST(tv.nro_venta AS VARCHAR) AS nro_venta,
         CAST(tv.nro_venta_ref AS VARCHAR) AS nro_venta_ref,
         CAST(tv.desc_region AS VARCHAR) AS desc_region,
         CAST(tv.desc_subregion AS VARCHAR) AS desc_subregion,
         CAST(tv.desc_division AS VARCHAR) AS desc_division,
         CAST(tv.cod_zona AS VARCHAR) AS cod_zona,
         CAST(tv.cod_ruta AS VARCHAR) AS cod_ruta,
         CAST(tv.cod_modulo AS VARCHAR) AS cod_modulo,
         CAST(tv.fecha_liquidacion AS DATE) AS fecha_liquidacion,
         CAST(tv.fecha_emision AS DATE) AS fecha_emision,
         CAST(tv.fecha_pedido AS DATE) AS fecha_pedido,
         CAST(tv.es_anulado AS INT) AS es_anulado,
         CAST(tv.tipo_cambio_mn AS DECIMAL(38,12)) AS tipo_cambio_mn,
         CAST(tv.tipo_cambio_me AS DECIMAL(38,12)) AS tipo_cambio_me,
         CAST(tv.fecha_creacion AS TIMESTAMP) AS fecha_creacion,
         CAST(tv.fecha_modificacion AS TIMESTAMP) AS fecha_modificacion,
         CAST(tv.es_eliminado AS INT) AS es_eliminado
  FROM step_t_venta_df_t_historico_venta_filter AS tv
),
job_t_venta AS (
  SELECT * FROM step_t_venta_df_dom_t_venta
)
 SELECT id_pais,
       id_periodo,
       id_venta,
       id_compania,
       id_sucursal,
       id_pedido,
       id_tipo_venta,
       id_cliente,
       id_fuerza_venta,
       id_vendedor,
       id_supervisor,
       id_jefe_venta,
       id_lista_precio,
       id_tipo_documento,
       id_forma_pago,
       id_motivo_rechazo,
       id_motivo_nota_credito,
       cod_documento_venta,
       nro_venta,
       nro_venta_ref,
       desc_region,
       desc_subregion,
       desc_division,
       cod_zona,
       cod_ruta,
       cod_modulo,
       fecha_liquidacion,
       fecha_emision,
       fecha_pedido,
       es_anulado,
       CAST(CAST(tipo_cambio_mn AS VARCHAR) AS DOUBLE) AS tipo_cambio_mn,
       CAST(CAST(tipo_cambio_me AS VARCHAR) AS DOUBLE) AS tipo_cambio_me,
       fecha_creacion,
       fecha_modificacion,
       es_eliminado FROM job_t_venta