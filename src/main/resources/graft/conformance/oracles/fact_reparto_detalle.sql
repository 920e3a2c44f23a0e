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
stage_m_articulo AS (
  SELECT CAST(p_partkey AS VARCHAR) AS cod_articulo,
         lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS cod_compania,
         CAST(9000000 + p_partkey % 500 AS VARCHAR) AS cod_articulo_corp,
         (lpad(CAST(n_nationkey AS VARCHAR), 2, '0') || '|' || CAST(p_partkey AS VARCHAR)) AS id_articulo,
         p_name AS desc_articulo,
         upper(p_name) AS desc_articulo_corp,
         lpad(CAST(p_partkey % 5 AS VARCHAR), 3, '0') AS cod_familia,
         lpad(CAST(p_partkey % 9 AS VARCHAR), 3, '0') AS cod_subfamilia,
         CAST(10 + p_partkey % 10 AS VARCHAR) AS cod_linea,
         CAST(p_partkey % 8 AS VARCHAR) AS cod_marca,
         CAST(p_partkey % 6 AS VARCHAR) AS cod_categoria,
         CAST(p_partkey % 7 AS VARCHAR) AS cod_formato,
         CAST(p_partkey % 4 AS VARCHAR) AS cod_presentacion,
         CAST(p_partkey % 5 AS VARCHAR) AS cod_sabor,
         CAST(p_partkey % 3 AS VARCHAR) AS cod_tipo_envase,
         CASE p_partkey % 6 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4
              WHEN 3 THEN 5 WHEN 4 THEN 8 ELSE 10 END AS cant_unidad_paquete,
         1 + p_partkey % 6 AS cant_paquete_caja,
         CAST(p_size AS DECIMAL(18,6)) AS cant_unidad_volumen,
         CAST(p_size + 0.5 AS DECIMAL(18,6)) AS cant_unidad_peso,
         1 + p_partkey % 40 AS cant_cajas_por_palet,
         'CAJ' AS unidad_compra,
         'UND' AS unidad_manejo,
         CAST(p_size AS VARCHAR) AS unidad_volumen,
         CASE WHEN p_partkey % 23 = 0 THEN '0' ELSE '1' END AS es_activo,
         CASE WHEN p_partkey % 2 = 0 THEN '1' ELSE '0' END AS es_explosion,
         CASE WHEN p_partkey % 3 = 0 THEN 'T' ELSE 'F' END AS flgskuplan,
         CAST(('1995-0' || CAST(4 + (p_partkey) % 3 AS VARCHAR) || '-' || lpad(CAST(1 + (p_partkey) % 28 AS VARCHAR), 2, '0')) AS DATE) AS fecha_creacion,
         CAST(('1995-0' || CAST(4 + (p_partkey + 2) % 3 AS VARCHAR) || '-' || lpad(CAST(1 + (p_partkey + 2) % 28 AS VARCHAR), 2, '0')) AS DATE) AS fecha_modificacion
  FROM part JOIN nation ON p_partkey % 1 = n_nationkey % 1
),
stage_m_operacion AS (
  SELECT DISTINCT lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS cod_compania,
         t.cod AS cod_operacion,
         t.cod AS cod_documento_transaccion,
         CASE WHEN t.cod IN ('FAC', 'BOL', 'GRA', '200') THEN 'Ven'
              ELSE 'Pro' END AS cod_tipo_operacion,
         CASE WHEN t.cod = 'DCV' THEN 'REV' ELSE 'STD' END AS cod_procedimiento
  FROM nation JOIN
       (SELECT DISTINCT CASE n_nationkey % 8 WHEN 0 THEN 'FAC'
                WHEN 1 THEN 'BOL' WHEN 2 THEN 'NCC' WHEN 3 THEN 'GRA'
                WHEN 4 THEN 'NIN' WHEN 5 THEN '200' WHEN 6 THEN '300'
                ELSE 'DCV' END AS cod FROM nation) t
       ON n_nationkey % 1 = length(t.cod) % 1
),
stage_m_procedimiento AS (
  SELECT DISTINCT cod_compania, cod_procedimiento,
         cod_documento_transaccion, cod_tipo_operacion,
         ('PROC ' || cod_procedimiento) AS desc_procedimiento,
         cod_tipo_operacion AS id_tipo_operacion
  FROM stage_m_operacion
),
stage_i_relacion_proced_venta AS (
  SELECT DISTINCT lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS cod_compania,
         CASE r_regionkey WHEN 0 THEN 'FAC' WHEN 1 THEN 'BOL'
              WHEN 2 THEN 'NCC' WHEN 3 THEN 'CMD' ELSE 'RMD' END AS cod_documento_venta,
         'STD' AS cod_procedimiento_venta,
         'VTA' AS cod_operacion_venta,
         '200' AS cod_documento_pedido,
         'STD' AS cod_procedimiento_pedido,
         CAST(r_regionkey AS VARCHAR) AS cod_tipo_pedido
  FROM nation JOIN region ON n_nationkey % 1 = r_regionkey % 1
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
stage_t_documento_venta_detalle AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS nro_comprobante_venta,
         lpad(CAST(o.o_custkey % 25 AS VARCHAR), 2, '0') AS cod_compania,
         lpad(CAST(o.o_custkey % 5 AS VARCHAR), 2, '0') AS cod_sucursal,
         CAST(l_partkey AS VARCHAR) AS cod_articulo,
         CAST(l_orderkey % 6 AS VARCHAR) AS cod_almacen,
         CASE l_orderkey % 11 WHEN 0 THEN 'NCC' WHEN 1 THEN 'CMD'
              WHEN 2 THEN 'RMD' WHEN 3 THEN 'BOL' ELSE 'FAC' END AS cod_documento_transaccion,
         CASE l_orderkey % 11 WHEN 0 THEN 'NCC' WHEN 1 THEN 'CMD'
              WHEN 2 THEN 'RMD' WHEN 3 THEN 'BOL' ELSE 'FAC' END AS cod_operacion,
         CASE WHEN l_orderkey % 9 = 0 THEN 'REV' ELSE 'STD' END AS cod_procedimiento,
         CAST(l_quantity AS DECIMAL(18,6)) AS cant_paquete,
         CAST(l_quantity * (1 + l_linenumber % 3) AS DECIMAL(18,6)) AS cant_unidad,
         CAST(l_extendedprice AS DECIMAL(18,6)) AS imp_valorizado,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS imp_cobrar,
         CAST(l_extendedprice * l_discount AS DECIMAL(18,6)) AS imp_descuento,
         CAST(l_extendedprice * l_discount * 0.9 AS DECIMAL(18,6)) AS imp_descuento_sinimp,
         CAST(l_extendedprice * l_tax AS DECIMAL(18,6)) AS imp_igv,
         CAST(l_extendedprice * 0.02 AS DECIMAL(18,6)) AS imp_isc,
         CAST(l_extendedprice * 0.002 AS DECIMAL(18,6)) AS imp_im3,
         CAST(l_extendedprice * 0.003 AS DECIMAL(18,6)) AS imp_im4,
         CAST(l_extendedprice * 0.004 AS DECIMAL(18,6)) AS imp_im5,
         CAST(l_extendedprice * 0.005 AS DECIMAL(18,6)) AS imp_im6,
         CAST(l_extendedprice * 0.01 AS DECIMAL(18,6)) AS precio_paquete,
         CAST(o.o_orderdate AS DATE) AS fecha_liquidacion,
         CAST((CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) || ' 08:00:00') AS TIMESTAMP) AS fecha_creacion,
         CAST((CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) || ' 09:00:00') AS TIMESTAMP) AS fecha_modificacion
  FROM lineitem
  JOIN orders o ON l_orderkey = o.o_orderkey
),
stage_t_documento_pedido AS (
  SELECT '200' AS cod_documento_pedido,
         ('P' || CAST(o_orderkey AS VARCHAR)) AS nro_documento_pedido,
         lpad(CAST((o_custkey) % 25 AS VARCHAR), 2, '0') AS cod_compania,
         lpad(CAST((o_custkey) % 5 AS VARCHAR), 2, '0') AS cod_sucursal,
         CAST(o_orderkey % 6 AS VARCHAR) AS cod_almacen,
         CAST(o_custkey % 15 AS VARCHAR) AS cod_zona_distribucion,
         CAST(o_custkey % 15 AS VARCHAR) AS cod_centro_distribucion,
         CAST(o_orderkey % 5 AS VARCHAR) AS cod_tipo_pedido,
         CASE WHEN o_orderkey % 3 = 0 THEN 'CONTADO' ELSE 'CREDITO' END AS cod_condicion_pago,
         CAST(o_orderkey % 40 AS VARCHAR) AS cod_vendedor,
         CAST(o_custkey % 3 AS VARCHAR) AS cod_fuerza_venta,
         CASE WHEN o_orderkey % 8 = 0
              THEN ('P' || CAST(o_orderkey % 500 AS VARCHAR))
              ELSE NULL END AS cod_documento_pedido_origen,
         CAST(o_orderdate AS DATE) AS fecha_pedido,
         CAST(o_orderdate AS DATE) AS fecha_entrega,
         CAST((CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || ' 07:00:00') AS TIMESTAMP) AS fecha_creacion,
         CAST((CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || ' 07:30:00') AS TIMESTAMP) AS fecha_modificacion
  FROM orders
),
stage_t_documento_pedido_detalle AS (
  SELECT '200' AS cod_documento_pedido,
         ('P' || CAST(l_orderkey AS VARCHAR)) AS nro_documento_pedido,
         lpad(CAST(o.o_custkey % 25 AS VARCHAR), 2, '0') AS cod_compania,
         lpad(CAST(o.o_custkey % 5 AS VARCHAR), 2, '0') AS cod_sucursal,
         CAST(o.o_custkey AS VARCHAR) AS cod_cliente,
         CAST(l_partkey AS VARCHAR) AS cod_articulo,
         CAST(l_orderkey % 6 AS VARCHAR) AS cod_almacen,
         CASE WHEN l_orderkey % 4 = 0 THEN 'GRA' ELSE 'NIN' END AS cod_documento_almacen,
         ('A' || CAST(l_orderkey AS VARCHAR)) AS nro_documento_almacen,
         CAST(o.o_custkey % 4 AS VARCHAR) AS cod_lista_precio,
         CAST(o.o_custkey % 9 AS VARCHAR) AS cod_modulo,
         CAST((o.o_custkey % 9) % 5 AS VARCHAR) AS cod_ruta,
         CAST(o.o_custkey % 15 AS VARCHAR) AS cod_zona,
         CASE WHEN l_orderkey % 9 = 0 THEN 'REV' ELSE 'STD' END AS cod_procedimiento,
         ('SF' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)) AS id_salesforce,
         CAST(l_quantity AS DECIMAL(18,6)) AS cant_paquete,
         CAST(CASE WHEN l_linenumber % 4 = 0 THEN l_quantity * 0.5
              ELSE l_quantity END AS DECIMAL(18,6)) AS cant_paquete_asignado,
         CAST(l_quantity * (1 + l_linenumber % 3) AS DECIMAL(18,6)) AS cant_unidad,
         CAST(CASE WHEN l_linenumber % 4 = 0 THEN l_quantity * (1 + l_linenumber % 3) * 0.5
              ELSE l_quantity * (1 + l_linenumber % 3) END AS DECIMAL(18,6)) AS cant_unidad_asignado,
         CAST(o.o_orderdate AS DATE) AS fecha_pedido,
         CAST((CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) || ' 07:00:00') AS TIMESTAMP) AS fecha_creacion,
         CAST((CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) || ' 07:45:00') AS TIMESTAMP) AS fecha_modificacion
  FROM lineitem
  JOIN orders o ON l_orderkey = o.o_orderkey
),
stage_t_documento_pedido_ades AS (
  SELECT CASE o_orderkey % 4 WHEN 0 THEN '200' WHEN 1 THEN '300'
              WHEN 2 THEN 'GRA' ELSE 'NIN' END AS cod_documento_transaccion,
         ('CPB' || CAST(o_orderkey AS VARCHAR)) AS nro_comprobante,
         lpad(CAST((o_custkey) % 25 AS VARCHAR), 2, '0') AS cod_compania,
         lpad(CAST((o_custkey) % 5 AS VARCHAR), 2, '0') AS cod_sucursal,
         CAST(o_orderkey % 6 AS VARCHAR) AS cod_almacen_emisor,
         CAST(o_custkey % 15 AS VARCHAR) AS cod_zona_distribucion,
         CAST(o_custkey % 15 AS VARCHAR) AS cod_centro_distribucion,
         CAST(o_orderkey % 5 AS VARCHAR) AS cod_tipo_pedido,
         '200' AS cod_tipo_documento_origen,
         CASE WHEN o_orderkey % 3 = 0 THEN 'CONTADO' ELSE 'CREDITO' END AS cod_condicion_pago,
         CAST(o_orderkey % 40 AS VARCHAR) AS cod_vendedor,
         CAST(o_custkey % 3 AS VARCHAR) AS cod_fuerza_venta,
         CAST(o_orderdate AS DATE) AS fecha_pedido,
         CAST(o_orderdate AS DATE) AS fecha_entrega,
         CAST((CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || ' 06:00:00') AS TIMESTAMP) AS fecha_creacion,
         CAST((CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || ' 06:30:00') AS TIMESTAMP) AS fecha_modificacion
  FROM orders
  WHERE o_orderkey % 2 = 0
),
stage_t_documento_pedido_ades_detalle AS (
  SELECT CASE l_orderkey % 4 WHEN 0 THEN '200' WHEN 1 THEN '300'
              WHEN 2 THEN 'GRA' ELSE 'NIN' END AS cod_documento_transaccion,
         ('CPB' || CAST(l_orderkey AS VARCHAR)) AS nro_comprobante,
         lpad(CAST(o.o_custkey % 25 AS VARCHAR), 2, '0') AS cod_compania,
         lpad(CAST(o.o_custkey % 5 AS VARCHAR), 2, '0') AS cod_sucursal,
         CAST(o.o_custkey AS VARCHAR) AS cod_cliente,
         CAST(l_partkey AS VARCHAR) AS cod_articulo,
         CAST(l_orderkey % 6 AS VARCHAR) AS cod_almacen_emisor,
         'GRA' AS cod_tipo_documento_almacen,
         ('A' || CAST(l_orderkey AS VARCHAR)) AS nro_documento_almacen,
         CAST(o.o_custkey % 4 AS VARCHAR) AS cod_lista_precios,
         CAST(o.o_custkey % 9 AS VARCHAR) AS cod_modulo,
         CAST((o.o_custkey % 9) % 5 AS VARCHAR) AS cod_ruta_distribucion,
         CAST(o.o_custkey % 15 AS VARCHAR) AS cod_zona_distribucion,
         CASE WHEN l_orderkey % 9 = 0 THEN 'REV' ELSE 'STD' END AS cod_procedimiento,
         ('SF' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)) AS id_salesforce,
         CAST(l_quantity AS DECIMAL(18,6)) AS cantidad_cajas,
         CAST(CASE WHEN l_linenumber % 4 = 0 THEN l_quantity * 0.5
              ELSE l_quantity END AS DECIMAL(18,6)) AS cantidad_cajas_asignada,
         CAST(l_quantity * 12 AS DECIMAL(18,6)) AS cantidad_botellas,
         CAST(CASE WHEN l_linenumber % 4 = 0 THEN l_quantity * 6
              ELSE l_quantity * 12 END AS DECIMAL(18,6)) AS cantidad_botellas_asignada,
         CAST(o.o_orderdate AS DATE) AS fecha_pedido,
         CAST((CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) || ' 06:00:00') AS TIMESTAMP) AS fecha_creacion,
         CAST((CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) || ' 06:45:00') AS TIMESTAMP) AS fecha_modificacion
  FROM lineitem
  JOIN orders o ON l_orderkey = o.o_orderkey
  WHERE l_orderkey % 2 = 0
),
stage_t_movimiento_inventario AS (
  SELECT lpad(CAST((o_custkey) % 25 AS VARCHAR), 2, '0') AS cod_compania,
         lpad(CAST((o_custkey) % 5 AS VARCHAR), 2, '0') AS cod_sucursal,
         CASE o_orderkey % 5 WHEN 0 THEN 'GRA' WHEN 1 THEN 'NIN'
              WHEN 2 THEN '200' WHEN 3 THEN '300' ELSE 'DCV' END AS cod_documento_transaccion,
         CASE o_orderkey % 5 WHEN 0 THEN 'GRA' WHEN 1 THEN 'NIN'
              WHEN 2 THEN '200' WHEN 3 THEN '300' ELSE 'DCV' END AS cod_documento_transaccion1,
         CAST(o_orderkey AS VARCHAR) AS nro_documento_movimiento,
         ('A' || CAST(o_orderkey AS VARCHAR)) AS nro_documento_almacen,
         ('A' || CAST(o_orderkey AS VARCHAR)) AS nro_documento_almacen1,
         CASE WHEN o_orderkey % 6 = 0
              THEN ('A' || CAST(o_orderkey % 700 AS VARCHAR))
              ELSE NULL END AS nro_documento_almacen_referencia2,
         CASE WHEN o_orderkey % 6 = 0 THEN '300' ELSE NULL END AS cod_tipo_documento_referencia2,
         CASE WHEN o_orderkey % 13 = 0 THEN '002'
              WHEN o_orderkey % 13 < 7 THEN 'PLI' ELSE 'LIQ' END AS cod_estado_comprobante,
         CASE o_orderkey % 5 WHEN 0 THEN 'GRA' WHEN 1 THEN 'NIN'
              WHEN 2 THEN '200' WHEN 3 THEN '300' ELSE 'DCV' END AS cod_procedimiento,
         CAST(o_orderkey % 6 AS VARCHAR) AS cod_almacen_emisor_origen,
         CAST(o_orderkey % 100 AS VARCHAR) AS cod_chofer,
         CAST(o_orderkey % 100 AS VARCHAR) AS cod_transportista,
         CAST(o_orderkey % 100 AS VARCHAR) AS cod_vehiculo,
         'FLT' AS cod_tipo_documento_liquidacion,
         ('L' || CAST(o_orderkey AS VARCHAR)) AS nro_documento_liquidacion,
         ('S' || CAST(o_orderkey % 10 AS VARCHAR)) AS nro_serie_alm,
         CAST(o_orderkey % 1000 AS VARCHAR) AS nropricoal,
         (lpad(CAST((o_custkey) % 25 AS VARCHAR), 2, '0') || '|' || lpad(CAST((o_custkey) % 5 AS VARCHAR), 2, '0') || '|' || CAST(o_orderkey % 6 AS VARCHAR)) AS id_almacen,
         CASE WHEN o_orderkey % 6 = 0
              THEN (lpad(CAST((o_custkey) % 25 AS VARCHAR), 2, '0') || '|' || lpad(CAST((o_custkey) % 5 AS VARCHAR), 2, '0') || '|' || CAST((o_orderkey + 1) % 6 AS VARCHAR))
              ELSE NULL END AS id_almacen_referencia,
         lpad(CAST((o_custkey) % 25 AS VARCHAR), 2, '0') AS id_compania_referencia,
         ('GRA' || '|' || 'A' || CAST(o_orderkey AS VARCHAR)) AS id_documento_almacen,
         ('MV' || CAST(o_orderkey AS VARCHAR)) AS id_movimiento_almacen,
         CASE WHEN o_orderkey % 4 = 0
              THEN ('MV' || CAST(o_orderkey % 900 AS VARCHAR))
              ELSE NULL END AS id_movimiento_ingreso,
         (lpad(CAST((o_custkey) % 25 AS VARCHAR), 2, '0') || '|' || CAST(o_orderkey % 100 AS VARCHAR)) AS id_persona,
         (lpad(CAST((o_custkey) % 25 AS VARCHAR), 2, '0') || '|STD') AS id_procedimiento,
         (lpad(CAST((o_custkey) % 25 AS VARCHAR), 2, '0') || '|' || lpad(CAST((o_custkey) % 5 AS VARCHAR), 2, '0') || '|' || CAST(o_orderkey % 6 AS VARCHAR) || '|GRA|A' || CAST(o_orderkey AS VARCHAR)) AS id_reparto,
         (lpad(CAST((o_custkey) % 25 AS VARCHAR), 2, '0') || '|' || lpad(CAST((o_custkey) % 5 AS VARCHAR), 2, '0')) AS id_sucursal,
         (lpad(CAST((o_custkey) % 25 AS VARCHAR), 2, '0') || '|' || lpad(CAST((o_custkey) % 5 AS VARCHAR), 2, '0')) AS id_sucursal_referencia,
         (lpad(CAST((o_custkey) % 25 AS VARCHAR), 2, '0') || '|' || CAST(o_orderkey % 100 AS VARCHAR)) AS id_transportista,
         (lpad(CAST((o_custkey) % 25 AS VARCHAR), 2, '0') || '|' || CAST(o_orderkey % 100 AS VARCHAR)) AS id_vehiculo,
         (lpad(CAST((o_custkey) % 25 AS VARCHAR), 2, '0') || '|' || CAST(o_orderkey % 40 AS VARCHAR)) AS id_vendedor,
         CAST(o_orderdate AS DATE) AS fecha_almacen,
         CAST(o_orderdate AS DATE) AS fecha_emision,
         CAST(o_orderdate AS DATE) AS fecha_liquidacion,
         CAST((CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || ' 05:00:00') AS TIMESTAMP) AS fecha_creacion,
         CAST((CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || ' 05:30:00') AS TIMESTAMP) AS fecha_modificacion,
         'etl' AS usuario_creacion,
         'etl' AS usuario_modificacion
  FROM orders
),
step_t_pedido_df_t_historico_pedido AS (
  SELECT *
  FROM stage_t_documento_pedido
  WHERE (strftime(fecha_pedido, '%Y%m') IN ('199504', '199505', '199506'))
),
step_t_pedido_df_t_historico_pedido_ades_cabecera AS (
  SELECT *
  FROM stage_t_documento_pedido_ades
  WHERE (strftime(fecha_pedido, '%Y%m') IN ('199504', '199505', '199506'))
),
step_t_pedido_df_t_historico_pedido_ades_cabecera__2 AS (
  SELECT *
  FROM step_t_pedido_df_t_historico_pedido_ades_cabecera
  WHERE (strftime(fecha_pedido, '%Y%m') IN ('199504', '199505', '199506'))
),
step_t_pedido_df_t_historico_pedido_detalle AS (
  SELECT *
  FROM stage_t_documento_pedido_detalle
  WHERE (strftime(fecha_pedido, '%Y%m') IN ('199504', '199505', '199506'))
),
step_t_pedido_df_t_historico_pedido_ades_detalle AS (
  SELECT *
  FROM stage_t_documento_pedido_ades_detalle
  WHERE (strftime(fecha_pedido, '%Y%m') IN ('199504', '199505', '199506'))
),
step_t_pedido_df_m_compania AS (
  SELECT mp.id_pais AS id_pais,
         mc.cod_compania AS id_compania,
         mc.cod_compania AS cod_compania,
         mc.cod_pais AS cod_pais,
         mpar.cod_moneda_mn AS moneda_mn
  FROM stage_m_compania AS mc
  LEFT JOIN stage_m_parametro AS mpar ON (mpar.id_compania = mc.id_compania)
  JOIN stage_m_pais AS mp ON (mp.cod_pais = mc.cod_pais)
),
step_t_pedido_df_t_historico_pedido_filter AS (
  SELECT mc.id_pais AS id_pais,
         strftime(fecha_pedido, '%Y%m') AS id_periodo,
         tp.cod_compania AS id_compania,
         concat_ws('|', tp.cod_compania, tp.cod_sucursal) AS id_sucursal,
         concat_ws('|', tp.cod_compania, tp.cod_sucursal, tp.cod_almacen) AS id_almacen,
         tp.cod_documento_pedido AS cod_tipo_documento_pedido,
         concat_ws('|', tp.cod_compania, tp.cod_sucursal, tp.cod_documento_pedido, nro_documento_pedido) AS id_documento_pedido,
         concat_ws('|', tp.cod_compania, tp.cod_documento_pedido_origen) AS id_origen_pedido,
         concat_ws('|', tp.cod_compania, tp.cod_tipo_pedido) AS id_tipo_pedido,
         concat_ws('|', tp.cod_compania, tp.cod_sucursal, tp.cod_fuerza_venta) AS id_fuerza_venta,
         concat_ws('|', tp.cod_compania, tp.cod_vendedor) AS id_vendedor,
         NULL AS id_supervisor,
         NULL AS id_jefe_venta,
         concat_ws('|', tp.cod_compania, tp.cod_condicion_pago) AS id_forma_pago,
         coalesce(mr.desc_region, 'REGION DEFAULT') AS desc_region,
         coalesce(msr.desc_subregion, 'SUBREGION DEFAULT') AS desc_subregion,
         mcd.desc_division AS desc_division,
         tp.cod_centro_distribucion AS cod_division,
         tp.cod_zona_distribucion AS cod_zona,
         tp.fecha_entrega AS fecha_entrega,
         tp.fecha_pedido AS fecha_pedido,
         tp.fecha_pedido AS fecha_visita,
         tp.fecha_creacion AS fecha_creacion,
         tp.fecha_modificacion AS fecha_modificacion,
         0 AS es_eliminado,
         CASE WHEN (mtc.cod_moneda = mc.moneda_mn) THEN 1 ELSE mtc.tc_venta END AS tipo_cambio_mn,
         CASE WHEN ((mtc.cod_moneda = 'DOL') OR (mtc.cod_moneda = 'USD')) THEN 1 ELSE mtc.tc_venta END AS tipo_cambio_me
  FROM step_t_pedido_df_t_historico_pedido AS tp
  JOIN step_t_pedido_df_m_compania AS mc ON (tp.cod_compania = mc.cod_compania)
  LEFT JOIN stage_m_zona AS mzo ON (((mzo.cod_compania = tp.cod_compania) AND (mzo.cod_sucursal = tp.cod_sucursal)) AND (mzo.cod_zona = tp.cod_zona_distribucion))
  LEFT JOIN stage_m_division AS mcd ON ((mcd.cod_division = tp.cod_centro_distribucion) AND (mcd.cod_compania = tp.cod_compania))
  LEFT JOIN stage_m_region AS mr ON ((mr.cod_pais = mc.cod_pais) AND (mr.cod_region = mzo.cod_region))
  LEFT JOIN stage_m_subregion AS msr ON (((msr.cod_pais = mc.cod_pais) AND (msr.cod_region = mzo.cod_region)) AND (msr.cod_subregion = mzo.cod_subregion))
  LEFT JOIN stage_m_tipo_cambio AS mtc ON (((mtc.fecha = tp.fecha_pedido) AND (mtc.cod_compania = mc.cod_compania)) AND (mtc.cod_moneda = mc.moneda_mn))
  WHERE (cod_documento_pedido = '200')
),
step_t_pedido_df_t_historico_pedido_ades_cabecera_filter AS (
  SELECT mc.id_pais AS id_pais,
         strftime(fecha_pedido, '%Y%m') AS id_periodo,
         tp.cod_compania AS id_compania,
         concat_ws('|', tp.cod_compania, tp.cod_sucursal) AS id_sucursal,
         concat_ws('|', tp.cod_compania, tp.cod_sucursal, tp.cod_almacen_emisor) AS id_almacen,
         tp.cod_documento_transaccion AS cod_tipo_documento_pedido,
         concat_ws('|', tp.cod_compania, tp.cod_sucursal, tp.cod_documento_transaccion, tp.nro_comprobante) AS id_documento_pedido,
         concat_ws('|', tp.cod_compania, tp.cod_tipo_documento_origen) AS id_origen_pedido,
         concat_ws('|', tp.cod_compania, tp.cod_tipo_pedido) AS id_tipo_pedido,
         concat_ws('|', tp.cod_compania, tp.cod_sucursal, cod_fuerza_venta) AS id_fuerza_venta,
         concat_ws('|', tp.cod_compania, tp.cod_vendedor) AS id_vendedor,
         NULL AS id_supervisor,
         NULL AS id_jefe_venta,
         concat_ws('|', tp.cod_compania, tp.cod_condicion_pago) AS id_forma_pago,
         coalesce(mr.desc_region, 'REGION DEFAULT') AS desc_region,
         coalesce(msr.desc_subregion, 'SUBREGION DEFAULT') AS desc_subregion,
         mcd.desc_division AS desc_division,
         tp.cod_centro_distribucion AS cod_division,
         tp.cod_zona_distribucion AS cod_zona,
         tp.fecha_entrega AS fecha_entrega,
         tp.fecha_pedido AS fecha_pedido,
         tp.fecha_pedido AS fecha_visita,
         tp.fecha_creacion AS fecha_creacion,
         tp.fecha_modificacion AS fecha_modificacion,
         0 AS es_eliminado,
         CASE WHEN (mtc.cod_moneda = mc.moneda_mn) THEN 1 ELSE mtc.tc_venta END AS tipo_cambio_mn,
         CASE WHEN ((mtc.cod_moneda = 'DOL') OR (mtc.cod_moneda = 'USD')) THEN 1 ELSE mtc.tc_venta END AS tipo_cambio_me
  FROM step_t_pedido_df_t_historico_pedido_ades_cabecera__2 AS tp
  JOIN step_t_pedido_df_m_compania AS mc ON (tp.cod_compania = mc.cod_compania)
  LEFT JOIN stage_m_zona AS mzo ON (((mzo.cod_compania = tp.cod_compania) AND (mzo.cod_sucursal = tp.cod_sucursal)) AND (mzo.cod_zona = tp.cod_zona_distribucion))
  LEFT JOIN stage_m_division AS mcd ON ((mcd.cod_division = tp.cod_centro_distribucion) AND (mcd.cod_compania = tp.cod_compania))
  LEFT JOIN stage_m_region AS mr ON ((mr.cod_pais = mc.cod_pais) AND (mr.cod_region = mzo.cod_region))
  LEFT JOIN stage_m_subregion AS msr ON (((msr.cod_pais = mc.cod_pais) AND (msr.cod_region = mzo.cod_region)) AND (msr.cod_subregion = mzo.cod_subregion))
  LEFT JOIN stage_m_tipo_cambio AS mtc ON (((mtc.fecha = tp.fecha_pedido) AND (mtc.cod_compania = mc.cod_compania)) AND (mtc.cod_moneda = mc.moneda_mn))
  WHERE (tp.cod_documento_transaccion IN ('200', '300'))
),
step_t_pedido_df_t_historico_pedido_detalle_filter AS (
  SELECT id_documento_pedido AS id_documento_pedido,
         id_pedido AS id_pedido,
         id_cliente AS id_cliente,
         nro_pedido AS nro_pedido,
         cod_ruta AS cod_ruta,
         cod_modulo AS cod_modulo,
         id_lista_precio AS id_lista_precio,
         id_pedido_ref AS id_pedido_ref
  FROM (
  SELECT id_documento_pedido,
         id_cliente,
         max(nro_pedido) AS nro_pedido,
         max(cod_ruta) AS cod_ruta,
         max(cod_modulo) AS cod_modulo,
         max(id_lista_precio) AS id_lista_precio,
         max(id_pedido) AS id_pedido,
         max(id_pedido_ref) AS id_pedido_ref
  FROM (
  SELECT concat_ws('|', cod_compania, cod_sucursal, cod_documento_pedido, nro_documento_pedido) AS id_documento_pedido,
         concat_ws('|', cod_compania, cod_sucursal, cod_documento_pedido, nro_documento_pedido, cod_cliente) AS id_pedido,
         concat_ws('|', cod_compania, cod_cliente) AS id_cliente,
         concat_ws('|', cod_compania, cod_lista_precio) AS id_lista_precio,
         NULL AS id_pedido_ref,
         cod_ruta AS cod_ruta,
         cod_modulo AS cod_modulo,
         concat_ws('|', nro_documento_pedido, cod_cliente) AS nro_pedido
  FROM step_t_pedido_df_t_historico_pedido_detalle
  WHERE (cod_documento_pedido = '200')
  )
  GROUP BY id_documento_pedido, id_cliente
  )
),
step_t_pedido_df_t_historico_pedido_ades_detalle_filter AS (
  SELECT id_documento_pedido AS id_documento_pedido,
         id_pedido AS id_pedido,
         id_cliente AS id_cliente,
         nro_pedido AS nro_pedido,
         cod_ruta AS cod_ruta,
         cod_modulo AS cod_modulo,
         id_lista_precio AS id_lista_precio,
         id_pedido_ref AS id_pedido_ref
  FROM (
  SELECT id_documento_pedido,
         id_cliente,
         max(nro_pedido) AS nro_pedido,
         max(cod_ruta) AS cod_ruta,
         max(cod_modulo) AS cod_modulo,
         max(id_lista_precio) AS id_lista_precio,
         max(id_pedido) AS id_pedido,
         max(id_pedido_ref) AS id_pedido_ref
  FROM (
  SELECT concat_ws('|', cod_compania, cod_sucursal, cod_documento_transaccion, nro_comprobante) AS id_documento_pedido,
         concat_ws('|', cod_compania, cod_sucursal, cod_documento_transaccion, nro_comprobante, cod_cliente) AS id_pedido,
         concat_ws('|', cod_compania, cod_cliente) AS id_cliente,
         concat_ws('|', cod_compania, cod_lista_precios) AS id_lista_precio,
         NULL AS id_pedido_ref,
         cod_ruta_distribucion AS cod_ruta,
         cod_modulo AS cod_modulo,
         concat_ws('|', nro_comprobante, cod_cliente) AS nro_pedido
  FROM step_t_pedido_df_t_historico_pedido_ades_detalle
  WHERE (cod_documento_transaccion IN ('200', '300'))
  )
  GROUP BY id_documento_pedido, id_cliente
  )
),
step_t_pedido_df_t_historico_pedido_cliente AS (
  SELECT tp.id_pais AS id_pais,
         tp.id_periodo AS id_periodo,
         tpd.id_pedido AS id_pedido,
         tp.id_compania AS id_compania,
         tp.id_sucursal AS id_sucursal,
         tp.cod_tipo_documento_pedido AS cod_tipo_documento_pedido,
         tp.id_origen_pedido AS id_origen_pedido,
         tp.id_tipo_pedido AS id_tipo_pedido,
         tp.id_fuerza_venta AS id_fuerza_venta,
         tp.id_vendedor AS id_vendedor,
         tp.id_supervisor AS id_supervisor,
         tp.id_jefe_venta AS id_jefe_venta,
         tp.id_forma_pago AS id_forma_pago,
         tp.desc_region AS desc_region,
         tp.desc_subregion AS desc_subregion,
         tp.desc_division AS desc_division,
         tp.cod_zona AS cod_zona,
         tpd.cod_ruta AS cod_ruta,
         tpd.cod_modulo AS cod_modulo,
         tp.fecha_pedido AS fecha_pedido,
         tp.fecha_entrega AS fecha_entrega,
         tp.fecha_visita AS fecha_visita,
         tp.tipo_cambio_mn AS tipo_cambio_mn,
         tp.tipo_cambio_me AS tipo_cambio_me,
         tp.fecha_creacion AS fecha_creacion,
         tp.fecha_modificacion AS fecha_modificacion,
         tp.es_eliminado AS es_eliminado,
         tpd.id_lista_precio AS id_lista_precio,
         tpd.id_pedido_ref AS id_pedido_ref,
         tpd.id_cliente AS id_cliente,
         tpd.nro_pedido AS nro_pedido
  FROM step_t_pedido_df_t_historico_pedido_filter AS tp
  JOIN step_t_pedido_df_t_historico_pedido_detalle_filter AS tpd ON (tpd.id_documento_pedido = tp.id_documento_pedido)
),
step_t_pedido_df_t_historico_pedido_ades_cliente AS (
  SELECT tp.id_pais AS id_pais,
         tp.id_periodo AS id_periodo,
         tpd.id_pedido AS id_pedido,
         tp.id_compania AS id_compania,
         tp.id_sucursal AS id_sucursal,
         tp.cod_tipo_documento_pedido AS cod_tipo_documento_pedido,
         tp.id_origen_pedido AS id_origen_pedido,
         tp.id_tipo_pedido AS id_tipo_pedido,
         tp.id_fuerza_venta AS id_fuerza_venta,
         tp.id_vendedor AS id_vendedor,
         tp.id_supervisor AS id_supervisor,
         tp.id_jefe_venta AS id_jefe_venta,
         tp.id_forma_pago AS id_forma_pago,
         tp.desc_region AS desc_region,
         tp.desc_subregion AS desc_subregion,
         tp.desc_division AS desc_division,
         tp.cod_zona AS cod_zona,
         tpd.cod_ruta AS cod_ruta,
         tpd.cod_modulo AS cod_modulo,
         tp.fecha_pedido AS fecha_pedido,
         tp.fecha_entrega AS fecha_entrega,
         tp.fecha_visita AS fecha_visita,
         tp.tipo_cambio_mn AS tipo_cambio_mn,
         tp.tipo_cambio_me AS tipo_cambio_me,
         tp.fecha_creacion AS fecha_creacion,
         tp.fecha_modificacion AS fecha_modificacion,
         tp.es_eliminado AS es_eliminado,
         tpd.id_lista_precio AS id_lista_precio,
         tpd.id_pedido_ref AS id_pedido_ref,
         tpd.id_cliente AS id_cliente,
         tpd.nro_pedido AS nro_pedido
  FROM step_t_pedido_df_t_historico_pedido_ades_cabecera_filter AS tp
  JOIN step_t_pedido_df_t_historico_pedido_ades_detalle_filter AS tpd ON (tpd.id_documento_pedido = tp.id_documento_pedido)
),
step_t_pedido_df_t_historico_pedido_ades_cliente_left_anti AS (
  SELECT *
  FROM step_t_pedido_df_t_historico_pedido_ades_cliente AS a
  ANTI JOIN step_t_pedido_df_t_historico_pedido_cliente AS b ON (a.id_pedido = b.id_pedido)
),
step_t_pedido_df_t_historico_pedido_cliente_union AS (
  (SELECT *
  FROM step_t_pedido_df_t_historico_pedido_cliente)
  UNION ALL BY NAME
  (SELECT * FROM step_t_pedido_df_t_historico_pedido_ades_cliente_left_anti)
),
step_t_pedido_df_dom_t_pedido AS (
  SELECT CAST(tp.id_pais AS VARCHAR) AS id_pais,
         CAST(tp.id_periodo AS VARCHAR) AS id_periodo,
         CAST(tp.id_pedido AS VARCHAR) AS id_pedido,
         CAST(tp.id_pedido_ref AS VARCHAR) AS id_pedido_ref,
         CAST(tp.id_compania AS VARCHAR) AS id_compania,
         CAST(tp.id_sucursal AS VARCHAR) AS id_sucursal,
         CAST(tp.cod_tipo_documento_pedido AS VARCHAR) AS cod_tipo_documento_pedido,
         CAST(NULL AS VARCHAR) AS id_visita,
         CAST(tp.id_cliente AS VARCHAR) AS id_cliente,
         CAST(NULL AS VARCHAR) AS id_modelo_atencion,
         CAST(tp.id_origen_pedido AS VARCHAR) AS id_origen_pedido,
         CAST(tp.id_tipo_pedido AS VARCHAR) AS id_tipo_pedido,
         CAST(tp.id_fuerza_venta AS VARCHAR) AS id_fuerza_venta,
         CAST(tp.id_vendedor AS VARCHAR) AS id_vendedor,
         CAST(tp.id_supervisor AS VARCHAR) AS id_supervisor,
         CAST(tp.id_jefe_venta AS VARCHAR) AS id_jefe_venta,
         CAST(tp.id_lista_precio AS VARCHAR) AS id_lista_precio,
         CAST(tp.id_forma_pago AS VARCHAR) AS id_forma_pago,
         CAST(tp.desc_region AS VARCHAR) AS desc_region,
         CAST(tp.desc_subregion AS VARCHAR) AS desc_subregion,
         CAST(tp.desc_division AS VARCHAR) AS desc_division,
         CAST(tp.cod_zona AS VARCHAR) AS cod_zona,
         CAST(tp.cod_ruta AS VARCHAR) AS cod_ruta,
         CAST(tp.cod_modulo AS VARCHAR) AS cod_modulo,
         CAST(tp.nro_pedido AS VARCHAR) AS nro_pedido,
         CAST(NULL AS VARCHAR) AS nro_pedido_ref,
         CAST(NULL AS VARCHAR) AS cod_tipo_atencion,
         CAST(tp.fecha_pedido AS DATE) AS fecha_pedido,
         CAST(tp.fecha_entrega AS DATE) AS fecha_entrega,
         CAST(tp.fecha_visita AS DATE) AS fecha_visita,
         CAST(tp.tipo_cambio_mn AS DECIMAL(38,12)) AS tipo_cambio_mn,
         CAST(tp.tipo_cambio_me AS DECIMAL(38,12)) AS tipo_cambio_me,
         CAST(tp.fecha_creacion AS TIMESTAMP) AS fecha_creacion,
         CAST(tp.fecha_modificacion AS TIMESTAMP) AS fecha_modificacion,
         CAST(tp.es_eliminado AS INT) AS es_eliminado
  FROM step_t_pedido_df_t_historico_pedido_cliente_union AS tp
),
job_t_pedido AS (
  SELECT * FROM step_t_pedido_df_dom_t_pedido
),
step_t_pedido_detalle_cumplimiento_df_t_historico_pedido AS (
  SELECT *
  FROM stage_t_documento_pedido
  WHERE (strftime(fecha_pedido, '%Y%m') IN ('199504', '199505', '199506'))
),
step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_detalle AS (
  SELECT *
  FROM stage_t_documento_pedido_detalle
  WHERE (strftime(fecha_pedido, '%Y%m') IN ('199504', '199505', '199506'))
),
step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_ades AS (
  SELECT *
  FROM stage_t_documento_pedido_ades
  WHERE (strftime(fecha_pedido, '%Y%m') IN ('199504', '199505', '199506'))
),
step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_ades_detalle AS (
  SELECT *
  FROM stage_t_documento_pedido_ades_detalle
  WHERE (strftime(fecha_pedido, '%Y%m') IN ('199504', '199505', '199506'))
),
step_t_pedido_detalle_cumplimiento_df_m_compania AS (
  SELECT mp.id_pais AS id_pais,
         mc.cod_compania AS id_compania,
         mc.cod_compania AS cod_compania,
         mc.cod_pais AS cod_pais,
         mpar.cod_moneda_mn AS moneda_mn
  FROM stage_m_compania AS mc
  LEFT JOIN stage_m_parametro AS mpar ON (mpar.id_compania = mc.id_compania)
  JOIN stage_m_pais AS mp ON (mp.cod_pais = mc.cod_pais)
),
step_t_pedido_detalle_cumplimiento_df_i_relacion_proced_venta AS (
  SELECT irpv.cod_compania AS cod_compania,
         irpv.cod_documento_pedido AS cod_documento_pedido,
         irpv.cod_procedimiento_pedido AS cod_procedimiento_pedido,
         irpv.cod_documento_venta AS cod_documento_venta,
         irpv.cod_procedimiento_venta AS cod_procedimiento_venta,
         irpv.cod_operacion_venta AS cod_operacion_venta,
         irpv.cod_tipo_pedido AS cod_tipo_pedido,
         mp.cod_tipo_operacion AS cod_tipo_operacion
  FROM stage_i_relacion_proced_venta AS irpv
  JOIN stage_m_procedimiento AS mp ON (((irpv.cod_compania = mp.cod_compania) AND (irpv.cod_documento_pedido = mp.cod_documento_transaccion)) AND (irpv.cod_procedimiento_pedido = mp.cod_procedimiento))
),
step_t_pedido_detalle_cumplimiento_df_t_historico_almacen AS (
  SELECT *,
         row_number() OVER (PARTITION BY cod_compania, cod_sucursal, cod_almacen_emisor_origen, cod_documento_transaccion, nro_documento_almacen ORDER BY nro_documento_movimiento DESC) AS orden
  FROM stage_t_movimiento_inventario
),
step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_detalle_select AS (
  SELECT mc.id_pais AS id_pais,
         strftime(tdp.fecha_pedido, '%Y%m') AS id_periodo,
         tdpd.cod_compania AS cod_compania,
         tdpd.cod_sucursal AS cod_sucursal,
         tdpd.cod_almacen AS cod_almacen,
         tdpd.cod_documento_pedido AS cod_documento_pedido,
         tdpd.nro_documento_pedido AS nro_documento_pedido,
         tdp.cod_tipo_pedido AS cod_tipo_pedido,
         coalesce(tdp.cod_documento_pedido_origen, '000') AS cod_origen_pedido,
         tdp.cod_vendedor AS cod_vendedor,
         NULL AS cod_supervisor,
         NULL AS cod_jefe_venta,
         tdpd.cod_lista_precio AS cod_lista_precio,
         tdp.cod_condicion_pago AS cod_forma_pago,
         NULL AS desc_region,
         NULL AS desc_subregion,
         NULL AS desc_division,
         tdpd.cod_zona AS cod_zona,
         tdpd.cod_ruta AS cod_ruta,
         tdpd.cod_modulo AS cod_modulo,
         tdp.cod_fuerza_venta AS cod_fuerza_venta,
         tdpd.cod_documento_almacen AS cod_documento_almacen,
         tdpd.nro_documento_almacen AS nro_documento_almacen,
         tdpd.cod_cliente AS cod_cliente,
         tdpd.id_salesforce AS nro_pedido_ref,
         tdpd.cod_articulo AS cod_articulo,
         tdpd.cod_procedimiento AS cod_procedimiento,
         tdp.fecha_pedido AS fecha_pedido,
         tdp.fecha_entrega AS fecha_entrega,
         tdpd.cant_paquete AS cantidad_cajas,
         tdpd.cant_unidad AS cantidad_botellas,
         tdpd.cant_paquete_asignado AS cantidad_cajas_asignada,
         tdpd.cant_unidad_asignado AS cantidad_botellas_asignada,
         tdpd.fecha_creacion AS fecha_creacion,
         tdpd.fecha_modificacion AS fecha_modificacion
  FROM step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_detalle AS tdpd
  JOIN step_t_pedido_detalle_cumplimiento_df_t_historico_pedido AS tdp ON (((((tdpd.cod_compania = tdp.cod_compania) AND (tdpd.cod_sucursal = tdp.cod_sucursal)) AND (tdpd.cod_almacen = tdp.cod_almacen)) AND (tdpd.cod_documento_pedido = tdp.cod_documento_pedido)) AND (tdpd.nro_documento_pedido = tdp.nro_documento_pedido))
  JOIN step_t_pedido_detalle_cumplimiento_df_m_compania AS mc ON (tdpd.cod_compania = mc.cod_compania)
  WHERE (tdpd.cod_documento_pedido = '200')
),
step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_ades_detalle_select AS (
  SELECT mc.id_pais AS id_pais,
         strftime(tdpa.fecha_pedido, '%Y%m') AS id_periodo,
         tdpad.cod_compania AS cod_compania,
         tdpad.cod_sucursal AS cod_sucursal,
         tdpad.cod_almacen_emisor AS cod_almacen,
         tdpad.cod_documento_transaccion AS cod_documento_pedido,
         tdpad.nro_comprobante AS nro_documento_pedido,
         tdpa.cod_tipo_pedido AS cod_tipo_pedido,
         coalesce(tdpa.cod_tipo_documento_origen, '000') AS cod_origen_pedido,
         tdpa.cod_vendedor AS cod_vendedor,
         NULL AS cod_supervisor,
         NULL AS cod_jefe_venta,
         tdpad.cod_lista_precios AS cod_lista_precio,
         tdpa.cod_condicion_pago AS cod_forma_pago,
         NULL AS desc_region,
         NULL AS desc_subregion,
         NULL AS desc_division,
         tdpad.cod_zona_distribucion AS cod_zona,
         tdpad.cod_ruta_distribucion AS cod_ruta,
         tdpad.cod_modulo AS cod_modulo,
         tdpa.cod_fuerza_venta AS cod_fuerza_venta,
         tdpad.nro_documento_almacen AS nro_documento_almacen,
         tdpad.cod_tipo_documento_almacen AS cod_documento_almacen,
         tdpad.cod_cliente AS cod_cliente,
         tdpad.id_salesforce AS nro_pedido_ref,
         tdpad.cod_articulo AS cod_articulo,
         tdpad.cod_procedimiento AS cod_procedimiento,
         tdpa.fecha_pedido AS fecha_pedido,
         tdpa.fecha_entrega AS fecha_entrega,
         tdpad.cantidad_cajas AS cantidad_cajas,
         tdpad.cantidad_botellas AS cantidad_botellas,
         tdpad.cantidad_cajas_asignada AS cantidad_cajas_asignada,
         tdpad.cantidad_botellas_asignada AS cantidad_botellas_asignada,
         tdpad.fecha_creacion AS fecha_creacion,
         tdpad.fecha_modificacion AS fecha_modificacion
  FROM step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_ades_detalle AS tdpad
  JOIN step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_ades AS tdpa ON (((((tdpad.cod_compania = tdpa.cod_compania) AND (tdpad.cod_sucursal = tdpa.cod_sucursal)) AND (tdpad.cod_almacen_emisor = tdpa.cod_almacen_emisor)) AND (tdpad.cod_documento_transaccion = tdpa.cod_documento_transaccion)) AND (tdpad.nro_comprobante = tdpa.nro_comprobante))
  JOIN step_t_pedido_detalle_cumplimiento_df_m_compania AS mc ON (tdpad.cod_compania = mc.cod_compania)
  WHERE (tdpad.cod_documento_transaccion IN ('200', '300'))
),
step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_ades_detalle_left_anti AS (
  SELECT *
  FROM step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_ades_detalle_select AS a
  ANTI JOIN step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_detalle_select AS b ON (((((a.cod_compania = b.cod_compania) AND (a.cod_sucursal = b.cod_sucursal)) AND (a.cod_almacen = b.cod_almacen)) AND (a.cod_documento_pedido = b.cod_documento_pedido)) AND (a.nro_documento_pedido = b.nro_documento_pedido))
),
step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_detalle_union AS (
  (SELECT *
  FROM step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_detalle_select)
  UNION ALL BY NAME
  (SELECT * FROM step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_ades_detalle_left_anti)
),
step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_detalle_almacen AS (
  SELECT id_pais AS id_pais,
         id_periodo AS id_periodo,
         cod_compania AS cod_compania,
         cod_sucursal AS cod_sucursal,
         cod_almacen AS cod_almacen,
         cod_documento_pedido AS cod_documento_pedido,
         nro_documento_pedido AS nro_documento_pedido,
         cod_cliente AS cod_cliente,
         cod_articulo AS cod_articulo,
         cod_documento_almacen AS cod_documento_almacen,
         nro_documento_almacen AS nro_documento_almacen,
         cod_procedimiento AS cod_procedimiento,
         cod_origen_pedido AS cod_origen_pedido,
         cod_tipo_pedido AS cod_tipo_pedido,
         cod_vendedor AS cod_vendedor,
         cod_supervisor AS cod_supervisor,
         cod_jefe_venta AS cod_jefe_venta,
         cod_lista_precio AS cod_lista_precio,
         cod_forma_pago AS cod_forma_pago,
         desc_region AS desc_region,
         desc_subregion AS desc_subregion,
         desc_division AS desc_division,
         cod_zona AS cod_zona,
         cod_ruta AS cod_ruta,
         cod_modulo AS cod_modulo,
         nro_pedido_ref AS nro_pedido_ref,
         cod_fuerza_venta AS cod_fuerza_venta,
         cod_transportista AS cod_transportista,
         cod_chofer AS cod_chofer,
         cod_medio_transporte AS cod_medio_transporte,
         estado_guia AS estado_guia,
         fecha_pedido AS fecha_pedido,
         fecha_entrega AS fecha_entrega,
         fecha_orden_carga AS fecha_orden_carga,
         fecha_movimiento_inventario AS fecha_movimiento_inventario,
         cod_tipo_operacion AS cod_tipo_operacion,
         cod_documento_venta AS cod_documento_venta,
         cod_procedimiento_venta AS cod_procedimiento_venta,
         cod_operacion_venta AS cod_operacion_venta,
         cantidad_cajas AS cantidad_cajas,
         cantidad_botellas AS cantidad_botellas,
         cantidad_cajas_asignada AS cantidad_cajas_asignada,
         cantidad_botellas_asignada AS cantidad_botellas_asignada,
         cantidad_cajas_despechado AS cantidad_cajas_despechado,
         cantidad_botellas_despechado AS cantidad_botellas_despechado,
         fecha_creacion AS fecha_creacion,
         fecha_modificacion AS fecha_modificacion
  FROM (
  SELECT t.id_pais,
         t.cod_compania,
         t.cod_sucursal,
         t.cod_almacen,
         t.cod_documento_pedido,
         t.nro_documento_pedido,
         t.cod_cliente,
         t.cod_articulo,
         t.cod_documento_almacen,
         t.nro_documento_almacen,
         irpv.cod_documento_venta,
         irpv.cod_procedimiento_venta,
         irpv.cod_operacion_venta,
         max(t.id_periodo) AS id_periodo,
         max(t.cod_procedimiento) AS cod_procedimiento,
         max(t.cod_origen_pedido) AS cod_origen_pedido,
         max(t.cod_tipo_pedido) AS cod_tipo_pedido,
         max(t.cod_vendedor) AS cod_vendedor,
         max(t.cod_supervisor) AS cod_supervisor,
         max(t.cod_jefe_venta) AS cod_jefe_venta,
         max(t.cod_lista_precio) AS cod_lista_precio,
         max(t.cod_forma_pago) AS cod_forma_pago,
         max(t.desc_region) AS desc_region,
         max(t.desc_subregion) AS desc_subregion,
         max(t.desc_division) AS desc_division,
         max(t.cod_zona) AS cod_zona,
         max(t.cod_ruta) AS cod_ruta,
         max(t.cod_modulo) AS cod_modulo,
         max(t.nro_pedido_ref) AS nro_pedido_ref,
         max(t.cod_fuerza_venta) AS cod_fuerza_venta,
         max(vtha.cod_transportista) AS cod_transportista,
         max(vtha.cod_chofer) AS cod_chofer,
         max(vtha.cod_vehiculo) AS cod_medio_transporte,
         max(vtha.cod_estado_comprobante) AS estado_guia,
         max(t.fecha_pedido) AS fecha_pedido,
         max(t.fecha_entrega) AS fecha_entrega,
         max(vtha.fecha_emision) AS fecha_orden_carga,
         max(vtha.fecha_almacen) AS fecha_movimiento_inventario,
         max(irpv.cod_tipo_operacion) AS cod_tipo_operacion,
         max(irpv.cod_documento_venta) AS cod_documento_venta,
         max(irpv.cod_procedimiento_venta) AS cod_procedimiento_venta,
         max(irpv.cod_operacion_venta) AS cod_operacion_venta,
         sum(t.cantidad_cajas) AS cantidad_cajas,
         sum(t.cantidad_botellas) AS cantidad_botellas,
         sum(t.cantidad_cajas_asignada) AS cantidad_cajas_asignada,
         sum(t.cantidad_botellas_asignada) AS cantidad_botellas_asignada,
         sum(CASE WHEN (vtha.cod_documento_transaccion IS NULL) THEN 0 ELSE t.cantidad_cajas_asignada END) AS cantidad_cajas_despechado,
         sum(CASE WHEN (vtha.cod_documento_transaccion IS NULL) THEN 0 ELSE t.cantidad_botellas_asignada END) AS cantidad_botellas_despechado,
         max(t.fecha_creacion) AS fecha_creacion,
         max(t.fecha_modificacion) AS fecha_modificacion
  FROM step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_detalle_union AS t
  LEFT JOIN step_t_pedido_detalle_cumplimiento_df_t_historico_almacen AS vtha ON (((((((t.cod_compania = vtha.cod_compania) AND (t.cod_sucursal = vtha.cod_sucursal)) AND (t.cod_almacen = vtha.cod_almacen_emisor_origen)) AND (t.cod_documento_almacen = vtha.cod_documento_transaccion)) AND (t.nro_documento_almacen = vtha.nro_documento_almacen)) AND (vtha.orden = 1)) AND (vtha.cod_estado_comprobante IN ('PLI', 'LIQ')))
  LEFT JOIN step_t_pedido_detalle_cumplimiento_df_i_relacion_proced_venta AS irpv ON ((((t.cod_compania = irpv.cod_compania) AND (t.cod_documento_pedido = irpv.cod_documento_pedido)) AND (t.cod_tipo_pedido = irpv.cod_tipo_pedido)) AND (t.cod_procedimiento = irpv.cod_procedimiento_pedido))
  GROUP BY t.id_pais, t.cod_compania, t.cod_sucursal, t.cod_almacen, t.cod_documento_pedido, t.nro_documento_pedido, t.cod_cliente, t.cod_articulo, t.cod_documento_almacen, t.nro_documento_almacen, irpv.cod_documento_venta, irpv.cod_procedimiento_venta, irpv.cod_operacion_venta
  )
),
step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_detalle_almacen_unico AS (
  SELECT DISTINCT *
  FROM (
  SELECT cod_compania AS cod_compania,
         cod_sucursal AS cod_sucursal,
         cod_almacen AS cod_almacen,
         cod_documento_pedido AS cod_documento_pedido,
         nro_documento_pedido AS nro_documento_pedido,
         cod_documento_almacen AS cod_documento_almacen,
         nro_documento_almacen AS nro_documento_almacen,
         cod_documento_venta AS cod_documento_venta,
         cod_procedimiento_venta AS cod_procedimiento_venta,
         cod_operacion_venta AS cod_operacion_venta
  FROM step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_detalle_almacen
  WHERE (coalesce(cod_documento_almacen, '') <> '')
  )
),
step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_detalle_resumen_almacen_venta AS (
  SELECT cod_compania AS cod_compania,
         cod_sucursal AS cod_sucursal,
         cod_almacen AS cod_almacen,
         cod_documento_almacen AS cod_documento_almacen,
         nro_documento_almacen AS nro_documento_almacen,
         cod_documento_pedido AS cod_documento_pedido,
         nro_documento_pedido AS nro_documento_pedido,
         cod_cliente AS cod_cliente,
         cod_articulo AS cod_articulo,
         cod_documento_venta AS cod_documento_venta,
         cod_procedimiento AS cod_procedimiento,
         cod_operacion AS cod_operacion,
         fecha_liquidacion AS fecha_liquidacion,
         cantidad_cajas AS cantidad_cajas,
         cantidad_botellas AS cantidad_botellas
  FROM (
  SELECT __p0 AS cod_compania,
         __p1 AS cod_sucursal,
         __p2 AS cod_almacen,
         __p3 AS cod_documento_almacen,
         __p4 AS nro_documento_almacen,
         __p5 AS cod_documento_pedido,
         __p6 AS nro_documento_pedido,
         __p7 AS cod_cliente,
         __p8 AS cod_articulo,
         __p9 AS cod_documento_venta,
         __p10 AS cod_procedimiento,
         __p11 AS cod_operacion,
         __agg0 AS fecha_liquidacion,
         CAST((CASE WHEN (CASE WHEN abs(__agg1) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg1 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg1) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg1 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg1) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg1 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cantidad_cajas,
         CAST((CASE WHEN (CASE WHEN abs(__agg2) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg2 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg2) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg2 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg2) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg2 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cantidad_botellas
  FROM (
  SELECT __p0,
         __p1,
         __p2,
         __p3,
         __p4,
         __p5,
         __p6,
         __p7,
         __p8,
         __p9,
         __p10,
         __p11,
         max(__p12) AS __agg0,
         sum(__p17) AS __agg1,
         sum(__p22) AS __agg2
  FROM (
  SELECT vthv.cod_compania AS __p0,
         vthv.cod_sucursal AS __p1,
         vthv.cod_almacen AS __p2,
         t.cod_documento_almacen AS __p3,
         t.nro_documento_almacen AS __p4,
         vthv.cod_documento_pedido AS __p5,
         vthv.nro_documento_pedido AS __p6,
         vthv.cod_cliente AS __p7,
         vthvd.cod_articulo AS __p8,
         vthv.cod_documento_venta AS __p9,
         vthv.cod_procedimiento AS __p10,
         vthvd.cod_operacion AS __p11,
         vthv.fecha_liquidacion AS __p12,
         (CAST((CASE WHEN (__p9 = 'NCC') THEN -1 ELSE 1 END) AS HUGEINT)) AS __p13,
         (CASE WHEN abs(__p13) >= 10000000000::HUGEINT THEN NULL ELSE __p13 END) AS __p14,
         CAST(replace(CAST(vthvd.cant_paquete AS VARCHAR), '.', '') AS HUGEINT) AS __p15,
         (__p14 * __p15) AS __p16,
         (CASE WHEN abs(__p16) >= 100000000000000000000000000000::HUGEINT THEN NULL ELSE __p16 END) AS __p17,
         (CAST((CASE WHEN (__p9 = 'NCC') THEN -1 ELSE 1 END) AS HUGEINT)) AS __p18,
         (CASE WHEN abs(__p18) >= 10000000000::HUGEINT THEN NULL ELSE __p18 END) AS __p19,
         CAST(replace(CAST(vthvd.cant_unidad AS VARCHAR), '.', '') AS HUGEINT) AS __p20,
         (__p19 * __p20) AS __p21,
         (CASE WHEN abs(__p21) >= 100000000000000000000000000000::HUGEINT THEN NULL ELSE __p21 END) AS __p22
  FROM stage_t_documento_venta AS vthv
  JOIN stage_t_documento_venta_detalle AS vthvd ON (((((vthv.cod_compania = vthvd.cod_compania) AND (vthv.cod_sucursal = vthvd.cod_sucursal)) AND (vthv.cod_almacen = vthvd.cod_almacen)) AND (vthv.cod_documento_venta = vthvd.cod_documento_transaccion)) AND (vthv.nro_documento_venta = vthvd.nro_comprobante_venta))
  JOIN step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_detalle_almacen_unico AS t ON ((((((((((vthv.cod_compania = t.cod_compania) AND (vthv.cod_sucursal = t.cod_sucursal)) AND (vthv.cod_almacen = t.cod_almacen)) AND (vthv.cod_documento_pedido = t.cod_documento_pedido)) AND (vthv.nro_documento_pedido = t.nro_documento_pedido)) AND (vthv.cod_documento_almacen = t.cod_documento_almacen)) AND (vthv.nro_documento_almacen = t.nro_documento_almacen)) AND (vthv.cod_documento_venta = t.cod_documento_venta)) AND (vthv.cod_procedimiento = t.cod_procedimiento_venta)) AND (vthvd.cod_operacion = t.cod_operacion_venta))
  WHERE ((NOT (vthv.cod_documento_venta IN ('RMD', 'CMD'))) AND (vthv.cod_estado_comprobante <> '002'))
  )
  GROUP BY __p0, __p1, __p2, __p3, __p4, __p5, __p6, __p7, __p8, __p9, __p10, __p11
  )
  )
),
step_t_pedido_detalle_cumplimiento_df_dom_t_pedido_detalle_cumplimiento AS (
  SELECT __x0 AS id_pais,
         __x1 AS id_periodo,
         __x4 AS id_sucursal,
         __x9 AS id_pedido,
         __x11 AS id_producto,
         __x14 AS id_reparto,
         __x15 AS fecha_liquidacion,
         CAST((CASE WHEN __x17 < 0 THEN '-' ELSE '' END || CAST(abs(__x17) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x17) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_cajafisica_ped,
         CAST((CASE WHEN __x20 < 0 THEN '-' ELSE '' END || CAST(abs(__x20) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x20) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_cajavolumen_ped,
         CAST((CASE WHEN __x22 < 0 THEN '-' ELSE '' END || CAST(abs(__x22) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x22) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_cajafisica_ped_pro,
         CAST((CASE WHEN __x25 < 0 THEN '-' ELSE '' END || CAST(abs(__x25) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x25) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_cajavolumen_ped_pro,
         CAST((CASE WHEN __x27 < 0 THEN '-' ELSE '' END || CAST(abs(__x27) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x27) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_cajafisica_asignado_ped,
         CAST((CASE WHEN __x30 < 0 THEN '-' ELSE '' END || CAST(abs(__x30) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x30) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_cajavolumen_asignado_ped,
         CAST((CASE WHEN __x32 < 0 THEN '-' ELSE '' END || CAST(abs(__x32) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x32) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_cajafisica_asignado_ped_pro,
         CAST((CASE WHEN __x35 < 0 THEN '-' ELSE '' END || CAST(abs(__x35) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x35) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_cajavolumen_asignado_ped_pro,
         CAST((CASE WHEN __x37 < 0 THEN '-' ELSE '' END || CAST(abs(__x37) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x37) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_cajafisica_desp,
         CAST((CASE WHEN __x40 < 0 THEN '-' ELSE '' END || CAST(abs(__x40) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x40) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_cajavolumen_desp,
         CAST((CASE WHEN __x42 < 0 THEN '-' ELSE '' END || CAST(abs(__x42) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x42) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_cajafisica_desp_pro,
         CAST((CASE WHEN __x45 < 0 THEN '-' ELSE '' END || CAST(abs(__x45) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x45) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_cajavolumen_desp_pro,
         CAST((CASE WHEN __x48 < 0 THEN '-' ELSE '' END || CAST(abs(__x48) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x48) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_caja_fisica_ven,
         CAST((CASE WHEN __x51 < 0 THEN '-' ELSE '' END || CAST(abs(__x51) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x51) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_caja_volumen_ven,
         CAST((CASE WHEN __x54 < 0 THEN '-' ELSE '' END || CAST(abs(__x54) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x54) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_caja_fisica_pro,
         CAST((CASE WHEN __x57 < 0 THEN '-' ELSE '' END || CAST(abs(__x57) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x57) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_caja_volumen_pro,
         __x58 AS fecha_creacion,
         __x59 AS fecha_modificacion
  FROM (
  SELECT *,
         (CASE WHEN 1000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__x16 < 0) != (1000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__x16) + abs(1000::HUGEINT)) // (2::HUGEINT * abs(1000::HUGEINT))) END) AS __x17,
         (CASE WHEN 1000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__x21 < 0) != (1000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__x21) + abs(1000::HUGEINT)) // (2::HUGEINT * abs(1000::HUGEINT))) END) AS __x22,
         (CASE WHEN 1000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__x26 < 0) != (1000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__x26) + abs(1000::HUGEINT)) // (2::HUGEINT * abs(1000::HUGEINT))) END) AS __x27,
         (CASE WHEN 1000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__x31 < 0) != (1000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__x31) + abs(1000::HUGEINT)) // (2::HUGEINT * abs(1000::HUGEINT))) END) AS __x32,
         (CASE WHEN 1000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__x36 < 0) != (1000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__x36) + abs(1000::HUGEINT)) // (2::HUGEINT * abs(1000::HUGEINT))) END) AS __x37,
         (CASE WHEN 1000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__x41 < 0) != (1000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__x41) + abs(1000::HUGEINT)) // (2::HUGEINT * abs(1000::HUGEINT))) END) AS __x42
  FROM (
  SELECT id_pais AS __x0,
         id_periodo AS __x1,
         cod_compania AS __x2,
         cod_sucursal AS __x3,
         concat_ws('|', __x2, __x3) AS __x4,
         cod_almacen AS __x5,
         cod_documento_pedido AS __x6,
         nro_documento_pedido AS __x7,
         cod_cliente AS __x8,
         (__x2 || '|' || __x3 || '|' || __x5 || '|' || __x6 || '|' || __x7 || '|' || __x8) AS __x9,
         cod_articulo AS __x10,
         (__x2 || '|' || __x10) AS __x11,
         cod_documento_almacen AS __x12,
         nro_documento_almacen AS __x13,
         (CASE WHEN (NOT (coalesce(__x12, '') = '')) THEN (__x2 || '|' || __x3 || '|' || __x5 || '|' || __x12 || '|' || __x13) ELSE CAST(NULL AS VARCHAR) END) AS __x14,
         fecha_liquidacion AS __x15,
         CAST(replace(CAST(cant_cajafisica_ped AS VARCHAR), '.', '') AS HUGEINT) AS __x16,
         CAST(replace(CAST(cant_cajavolumen_ped AS VARCHAR), '.', '') AS HUGEINT) AS __x18,
         (__x18 * 1000000::HUGEINT) AS __x19,
         (CASE WHEN abs(__x19) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __x19 END) AS __x20,
         CAST(replace(CAST(cant_cajafisica_ped_pro AS VARCHAR), '.', '') AS HUGEINT) AS __x21,
         CAST(replace(CAST(cant_cajavolumen_ped_pro AS VARCHAR), '.', '') AS HUGEINT) AS __x23,
         (__x23 * 1000000::HUGEINT) AS __x24,
         (CASE WHEN abs(__x24) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __x24 END) AS __x25,
         CAST(replace(CAST(cant_cajafisica_asignado_ped AS VARCHAR), '.', '') AS HUGEINT) AS __x26,
         CAST(replace(CAST(cant_cajavolumen_asignado_ped AS VARCHAR), '.', '') AS HUGEINT) AS __x28,
         (__x28 * 1000000::HUGEINT) AS __x29,
         (CASE WHEN abs(__x29) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __x29 END) AS __x30,
         CAST(replace(CAST(cant_cajafisica_asignado_ped_pro AS VARCHAR), '.', '') AS HUGEINT) AS __x31,
         CAST(replace(CAST(cant_cajavolumen_asignado_ped_pro AS VARCHAR), '.', '') AS HUGEINT) AS __x33,
         (__x33 * 1000000::HUGEINT) AS __x34,
         (CASE WHEN abs(__x34) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __x34 END) AS __x35,
         CAST(replace(CAST(cant_cajafisica_desp AS VARCHAR), '.', '') AS HUGEINT) AS __x36,
         CAST(replace(CAST(cant_cajavolumen_desp AS VARCHAR), '.', '') AS HUGEINT) AS __x38,
         (__x38 * 1000000::HUGEINT) AS __x39,
         (CASE WHEN abs(__x39) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __x39 END) AS __x40,
         CAST(replace(CAST(cant_cajafisica_desp_pro AS VARCHAR), '.', '') AS HUGEINT) AS __x41,
         CAST(replace(CAST(cant_cajavolumen_desp_pro AS VARCHAR), '.', '') AS HUGEINT) AS __x43,
         (__x43 * 1000000::HUGEINT) AS __x44,
         (CASE WHEN abs(__x44) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __x44 END) AS __x45,
         CAST(replace(CAST(cant_caja_fisica_ven AS VARCHAR), '.', '') AS HUGEINT) AS __x46,
         (__x46 * 1000000::HUGEINT) AS __x47,
         (CASE WHEN abs(__x47) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __x47 END) AS __x48,
         CAST(replace(CAST(cant_caja_volumen_ven AS VARCHAR), '.', '') AS HUGEINT) AS __x49,
         (__x49 * 1000000::HUGEINT) AS __x50,
         (CASE WHEN abs(__x50) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __x50 END) AS __x51,
         CAST(replace(CAST(cant_caja_fisica_pro AS VARCHAR), '.', '') AS HUGEINT) AS __x52,
         (__x52 * 1000000::HUGEINT) AS __x53,
         (CASE WHEN abs(__x53) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __x53 END) AS __x54,
         CAST(replace(CAST(cant_caja_volumen_pro AS VARCHAR), '.', '') AS HUGEINT) AS __x55,
         (__x55 * 1000000::HUGEINT) AS __x56,
         (CASE WHEN abs(__x56) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __x56 END) AS __x57,
         fecha_creacion AS __x58,
         fecha_modificacion AS __x59
  FROM (
  SELECT __p0 AS cod_compania,
         __p1 AS cod_sucursal,
         __p2 AS cod_almacen,
         __p3 AS cod_documento_pedido,
         __p4 AS nro_documento_pedido,
         __p5 AS cod_cliente,
         __p6 AS cod_articulo,
         __p8 AS cod_documento_almacen,
         __p10 AS nro_documento_almacen,
         __agg0 AS id_pais,
         __agg1 AS id_periodo,
         __agg2 AS fecha_liquidacion,
         CAST((CASE WHEN (CASE WHEN abs(__agg3) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg3 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg3) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg3 END)) // 1000000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg3) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg3 END)) % 1000000000000000::HUGEINT AS VARCHAR), 15, '0')) AS DECIMAL(38,15)) AS cant_cajafisica_ped,
         CAST((CASE WHEN (CASE WHEN abs(__agg4) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg4 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg4) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg4 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg4) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg4 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_cajavolumen_ped,
         CAST((CASE WHEN (CASE WHEN abs(__agg5) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg5 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg5) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg5 END)) // 1000000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg5) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg5 END)) % 1000000000000000::HUGEINT AS VARCHAR), 15, '0')) AS DECIMAL(38,15)) AS cant_cajafisica_ped_pro,
         CAST((CASE WHEN (CASE WHEN abs(__agg6) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg6 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg6) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg6 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg6) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg6 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_cajavolumen_ped_pro,
         CAST((CASE WHEN (CASE WHEN abs(__agg7) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg7 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg7) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg7 END)) // 1000000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg7) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg7 END)) % 1000000000000000::HUGEINT AS VARCHAR), 15, '0')) AS DECIMAL(38,15)) AS cant_cajafisica_asignado_ped,
         CAST((CASE WHEN (CASE WHEN abs(__agg8) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg8 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg8) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg8 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg8) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg8 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_cajavolumen_asignado_ped,
         CAST((CASE WHEN (CASE WHEN abs(__agg9) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg9 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg9) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg9 END)) // 1000000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg9) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg9 END)) % 1000000000000000::HUGEINT AS VARCHAR), 15, '0')) AS DECIMAL(38,15)) AS cant_cajafisica_asignado_ped_pro,
         CAST((CASE WHEN (CASE WHEN abs(__agg10) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg10 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg10) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg10 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg10) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg10 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_cajavolumen_asignado_ped_pro,
         CAST((CASE WHEN (CASE WHEN abs(__agg11) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg11 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg11) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg11 END)) // 1000000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg11) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg11 END)) % 1000000000000000::HUGEINT AS VARCHAR), 15, '0')) AS DECIMAL(38,15)) AS cant_cajafisica_desp,
         CAST((CASE WHEN (CASE WHEN abs(__agg12) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg12 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg12) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg12 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg12) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg12 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_cajavolumen_desp,
         CAST((CASE WHEN (CASE WHEN abs(__agg13) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg13 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg13) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg13 END)) // 1000000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg13) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg13 END)) % 1000000000000000::HUGEINT AS VARCHAR), 15, '0')) AS DECIMAL(38,15)) AS cant_cajafisica_desp_pro,
         CAST((CASE WHEN (CASE WHEN abs(__agg14) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg14 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg14) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg14 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg14) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg14 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_cajavolumen_desp_pro,
         CAST((CASE WHEN (CASE WHEN abs(__agg15) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg15 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg15) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg15 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg15) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg15 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_caja_fisica_ven,
         CAST((CASE WHEN (CASE WHEN abs(__agg16) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg16 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg16) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg16 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg16) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg16 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_caja_volumen_ven,
         CAST((CASE WHEN (CASE WHEN abs(__agg17) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg17 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg17) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg17 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg17) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg17 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_caja_fisica_pro,
         CAST((CASE WHEN (CASE WHEN abs(__agg18) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg18 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg18) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg18 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg18) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg18 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_caja_volumen_pro,
         __agg19 AS fecha_creacion,
         __agg20 AS fecha_modificacion
  FROM (
  SELECT __p0,
         __p1,
         __p2,
         __p3,
         __p4,
         __p5,
         __p6,
         __p8,
         __p10,
         max(__p11) AS __agg0,
         max(__p12) AS __agg1,
         max(__p13) AS __agg2,
         sum(__p26) AS __agg3,
         sum(__p37) AS __agg4,
         sum(__p46) AS __agg5,
         sum(__p56) AS __agg6,
         sum(__p67) AS __agg7,
         sum(__p77) AS __agg8,
         sum(__p86) AS __agg9,
         sum(__p96) AS __agg10,
         sum(__p107) AS __agg11,
         sum(__p117) AS __agg12,
         sum(__p126) AS __agg13,
         sum(__p136) AS __agg14,
         sum(__p146) AS __agg15,
         sum(__p156) AS __agg16,
         sum(__p164) AS __agg17,
         sum(__p174) AS __agg18,
         max(__p175) AS __agg19,
         max(__p176) AS __agg20
  FROM (
  SELECT *,
         (CASE WHEN 10::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p23 < 0) != (10::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p23) + abs(10::HUGEINT)) // (2::HUGEINT * abs(10::HUGEINT))) END) AS __p24,
         (CASE WHEN (__p14 = 'Ven') THEN (CASE WHEN abs(__p24) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p24 END) ELSE (CASE WHEN abs(__p25) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p25 END) END) AS __p26,
         (CASE WHEN 10::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p43 < 0) != (10::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p43) + abs(10::HUGEINT)) // (2::HUGEINT * abs(10::HUGEINT))) END) AS __p44,
         (CASE WHEN (__p14 = 'Pro') THEN (CASE WHEN abs(__p44) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p44 END) ELSE (CASE WHEN abs(__p45) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p45 END) END) AS __p46,
         (CASE WHEN 10::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p64 < 0) != (10::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p64) + abs(10::HUGEINT)) // (2::HUGEINT * abs(10::HUGEINT))) END) AS __p65,
         (CASE WHEN (__p14 = 'Ven') THEN (CASE WHEN abs(__p65) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p65 END) ELSE (CASE WHEN abs(__p66) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p66 END) END) AS __p67,
         (CASE WHEN 10::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p83 < 0) != (10::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p83) + abs(10::HUGEINT)) // (2::HUGEINT * abs(10::HUGEINT))) END) AS __p84,
         (CASE WHEN (__p14 = 'Pro') THEN (CASE WHEN abs(__p84) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p84 END) ELSE (CASE WHEN abs(__p85) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p85 END) END) AS __p86,
         (CASE WHEN 10::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p104 < 0) != (10::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p104) + abs(10::HUGEINT)) // (2::HUGEINT * abs(10::HUGEINT))) END) AS __p105,
         (CASE WHEN (__p14 = 'Ven') THEN (CASE WHEN abs(__p105) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p105 END) ELSE (CASE WHEN abs(__p106) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p106 END) END) AS __p107,
         (CASE WHEN 10::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p123 < 0) != (10::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p123) + abs(10::HUGEINT)) // (2::HUGEINT * abs(10::HUGEINT))) END) AS __p124,
         (CASE WHEN (__p14 = 'Pro') THEN (CASE WHEN abs(__p124) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p124 END) ELSE (CASE WHEN abs(__p125) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p125 END) END) AS __p126
  FROM (
  SELECT *,
         (CASE WHEN __p19 = 0 THEN NULL ELSE (CASE WHEN (__p20 < 0) != (__p19 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p20) + abs(__p19)) // (2::HUGEINT * abs(__p19))) END) AS __p21,
         (CASE WHEN abs(__p21) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p21 END) AS __p22,
         ((__p15 * 10000000000::HUGEINT) + __p22) AS __p23,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p34 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p34) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p35,
         (CASE WHEN (__p14 = 'Ven') THEN (CASE WHEN abs(__p35) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p35 END) ELSE (CASE WHEN abs(__p36) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p36 END) END) AS __p37,
         (CASE WHEN __p39 = 0 THEN NULL ELSE (CASE WHEN (__p40 < 0) != (__p39 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p40) + abs(__p39)) // (2::HUGEINT * abs(__p39))) END) AS __p41,
         (CASE WHEN abs(__p41) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p41 END) AS __p42,
         ((__p15 * 10000000000::HUGEINT) + __p42) AS __p43,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p53 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p53) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p54,
         (CASE WHEN (__p14 = 'Pro') THEN (CASE WHEN abs(__p54) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p54 END) ELSE (CASE WHEN abs(__p55) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p55 END) END) AS __p56,
         (CASE WHEN __p60 = 0 THEN NULL ELSE (CASE WHEN (__p61 < 0) != (__p60 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p61) + abs(__p60)) // (2::HUGEINT * abs(__p60))) END) AS __p62,
         (CASE WHEN abs(__p62) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p62 END) AS __p63,
         ((__p57 * 10000000000::HUGEINT) + __p63) AS __p64,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p74 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p74) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p75,
         (CASE WHEN (__p14 = 'Ven') THEN (CASE WHEN abs(__p75) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p75 END) ELSE (CASE WHEN abs(__p76) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p76 END) END) AS __p77,
         (CASE WHEN __p79 = 0 THEN NULL ELSE (CASE WHEN (__p80 < 0) != (__p79 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p80) + abs(__p79)) // (2::HUGEINT * abs(__p79))) END) AS __p81,
         (CASE WHEN abs(__p81) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p81 END) AS __p82,
         ((__p57 * 10000000000::HUGEINT) + __p82) AS __p83,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p93 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p93) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p94,
         (CASE WHEN (__p14 = 'Pro') THEN (CASE WHEN abs(__p94) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p94 END) ELSE (CASE WHEN abs(__p95) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p95 END) END) AS __p96,
         (CASE WHEN __p100 = 0 THEN NULL ELSE (CASE WHEN (__p101 < 0) != (__p100 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p101) + abs(__p100)) // (2::HUGEINT * abs(__p100))) END) AS __p102,
         (CASE WHEN abs(__p102) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p102 END) AS __p103,
         ((__p97 * 10000000000::HUGEINT) + __p103) AS __p104,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p114 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p114) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p115,
         (CASE WHEN (__p14 = 'Ven') THEN (CASE WHEN abs(__p115) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p115 END) ELSE (CASE WHEN abs(__p116) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p116 END) END) AS __p117,
         (CASE WHEN __p119 = 0 THEN NULL ELSE (CASE WHEN (__p120 < 0) != (__p119 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p120) + abs(__p119)) // (2::HUGEINT * abs(__p119))) END) AS __p121,
         (CASE WHEN abs(__p121) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p121 END) AS __p122,
         ((__p97 * 10000000000::HUGEINT) + __p122) AS __p123,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p133 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p133) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p134,
         (CASE WHEN (__p14 = 'Pro') THEN (CASE WHEN abs(__p134) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p134 END) ELSE (CASE WHEN abs(__p135) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p135 END) END) AS __p136,
         (CASE WHEN __p140 = 0 THEN NULL ELSE (CASE WHEN (__p141 < 0) != (__p140 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p141) + abs(__p140)) // (2::HUGEINT * abs(__p140))) END) AS __p142,
         (CASE WHEN abs(__p142) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p142 END) AS __p143,
         (__p137 + __p143) AS __p144,
         (CASE WHEN (__p14 = 'Ven') THEN (CASE WHEN abs(__p144) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p144 END) ELSE (CASE WHEN abs(__p145) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p145 END) END) AS __p146,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p153 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p153) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p154,
         (CASE WHEN (__p14 = 'Ven') THEN (CASE WHEN abs(__p154) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p154 END) ELSE (CASE WHEN abs(__p155) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p155 END) END) AS __p156,
         (CASE WHEN __p158 = 0 THEN NULL ELSE (CASE WHEN (__p159 < 0) != (__p158 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p159) + abs(__p158)) // (2::HUGEINT * abs(__p158))) END) AS __p160,
         (CASE WHEN abs(__p160) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p160 END) AS __p161,
         (__p137 + __p161) AS __p162,
         (CASE WHEN (__p14 = 'Pro') THEN (CASE WHEN abs(__p162) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p162 END) ELSE (CASE WHEN abs(__p163) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p163 END) END) AS __p164,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p171 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p171) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p172,
         (CASE WHEN (__p14 = 'Pro') THEN (CASE WHEN abs(__p172) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p172 END) ELSE (CASE WHEN abs(__p173) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p173 END) END) AS __p174
  FROM (
  SELECT vthv.cod_compania AS __p0,
         vthv.cod_sucursal AS __p1,
         vthv.cod_almacen AS __p2,
         vthv.cod_documento_pedido AS __p3,
         vthv.nro_documento_pedido AS __p4,
         vthv.cod_cliente AS __p5,
         vthv.cod_articulo AS __p6,
         vthv.cod_documento_almacen AS __p7,
         coalesce(__p7, '') AS __p8,
         vthv.nro_documento_almacen AS __p9,
         coalesce(__p9, '') AS __p10,
         vthv.id_pais AS __p11,
         vthv.id_periodo AS __p12,
         t.fecha_liquidacion AS __p13,
         vthv.cod_tipo_operacion AS __p14,
         CAST(replace(CAST(vthv.cantidad_cajas AS VARCHAR), '.', '') AS HUGEINT) AS __p15,
         CAST(replace(CAST(vthv.cantidad_botellas AS VARCHAR), '.', '') AS HUGEINT) AS __p16,
         m.cant_unidad_paquete AS __p17,
         (CAST(__p17 AS HUGEINT)) AS __p18,
         (CASE WHEN abs(__p18) >= 10000000000::HUGEINT THEN NULL ELSE __p18 END) AS __p19,
         (__p16 * 10000000000::HUGEINT) AS __p20,
         (CAST(0 AS HUGEINT) * 1000000000000000::HUGEINT) AS __p25,
         (CAST(__p17 AS HUGEINT)) AS __p27,
         (CASE WHEN abs(__p27) >= 10000000000::HUGEINT THEN NULL ELSE __p27 END) AS __p28,
         (__p15 * __p28) AS __p29,
         (CASE WHEN abs(__p29) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p29 END) AS __p30,
         (__p30 + __p16) AS __p31,
         (CASE WHEN abs(__p31) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p31 END) AS __p32,
         CAST(replace(CAST(m.cant_unidad_volumen AS VARCHAR), '.', '') AS HUGEINT) AS __p33,
         (__p32 * __p33) AS __p34,
         (CAST(0 AS HUGEINT) * 1000000::HUGEINT) AS __p36,
         (CAST(__p17 AS HUGEINT)) AS __p38,
         (CASE WHEN abs(__p38) >= 10000000000::HUGEINT THEN NULL ELSE __p38 END) AS __p39,
         (__p16 * 10000000000::HUGEINT) AS __p40,
         (CAST(0 AS HUGEINT) * 1000000000000000::HUGEINT) AS __p45,
         (CAST(__p17 AS HUGEINT)) AS __p47,
         (CASE WHEN abs(__p47) >= 10000000000::HUGEINT THEN NULL ELSE __p47 END) AS __p48,
         (__p15 * __p48) AS __p49,
         (CASE WHEN abs(__p49) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p49 END) AS __p50,
         (__p50 + __p16) AS __p51,
         (CASE WHEN abs(__p51) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p51 END) AS __p52,
         (__p52 * __p33) AS __p53,
         (CAST(0 AS HUGEINT) * 1000000::HUGEINT) AS __p55,
         CAST(replace(CAST(vthv.cantidad_cajas_asignada AS VARCHAR), '.', '') AS HUGEINT) AS __p57,
         CAST(replace(CAST(vthv.cantidad_botellas_asignada AS VARCHAR), '.', '') AS HUGEINT) AS __p58,
         (CAST(__p17 AS HUGEINT)) AS __p59,
         (CASE WHEN abs(__p59) >= 10000000000::HUGEINT THEN NULL ELSE __p59 END) AS __p60,
         (__p58 * 10000000000::HUGEINT) AS __p61,
         (CAST(0 AS HUGEINT) * 1000000000000000::HUGEINT) AS __p66,
         (CAST(__p17 AS HUGEINT)) AS __p68,
         (CASE WHEN abs(__p68) >= 10000000000::HUGEINT THEN NULL ELSE __p68 END) AS __p69,
         (__p57 * __p69) AS __p70,
         (CASE WHEN abs(__p70) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p70 END) AS __p71,
         (__p71 + __p58) AS __p72,
         (CASE WHEN abs(__p72) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p72 END) AS __p73,
         (__p73 * __p33) AS __p74,
         (CAST(0 AS HUGEINT) * 1000000::HUGEINT) AS __p76,
         (CAST(__p17 AS HUGEINT)) AS __p78,
         (CASE WHEN abs(__p78) >= 10000000000::HUGEINT THEN NULL ELSE __p78 END) AS __p79,
         (__p58 * 10000000000::HUGEINT) AS __p80,
         (CAST(0 AS HUGEINT) * 1000000000000000::HUGEINT) AS __p85,
         (CAST(__p17 AS HUGEINT)) AS __p87,
         (CASE WHEN abs(__p87) >= 10000000000::HUGEINT THEN NULL ELSE __p87 END) AS __p88,
         (__p57 * __p88) AS __p89,
         (CASE WHEN abs(__p89) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p89 END) AS __p90,
         (__p90 + __p58) AS __p91,
         (CASE WHEN abs(__p91) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p91 END) AS __p92,
         (__p92 * __p33) AS __p93,
         (CAST(0 AS HUGEINT) * 1000000::HUGEINT) AS __p95,
         CAST(replace(CAST(vthv.cantidad_cajas_despechado AS VARCHAR), '.', '') AS HUGEINT) AS __p97,
         CAST(replace(CAST(vthv.cantidad_botellas_despechado AS VARCHAR), '.', '') AS HUGEINT) AS __p98,
         (CAST(__p17 AS HUGEINT)) AS __p99,
         (CASE WHEN abs(__p99) >= 10000000000::HUGEINT THEN NULL ELSE __p99 END) AS __p100,
         (__p98 * 10000000000::HUGEINT) AS __p101,
         (CAST(0 AS HUGEINT) * 1000000000000000::HUGEINT) AS __p106,
         (CAST(__p17 AS HUGEINT)) AS __p108,
         (CASE WHEN abs(__p108) >= 10000000000::HUGEINT THEN NULL ELSE __p108 END) AS __p109,
         (__p97 * __p109) AS __p110,
         (CASE WHEN abs(__p110) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p110 END) AS __p111,
         (__p111 + __p98) AS __p112,
         (CASE WHEN abs(__p112) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p112 END) AS __p113,
         (__p113 * __p33) AS __p114,
         (CAST(0 AS HUGEINT) * 1000000::HUGEINT) AS __p116,
         (CAST(__p17 AS HUGEINT)) AS __p118,
         (CASE WHEN abs(__p118) >= 10000000000::HUGEINT THEN NULL ELSE __p118 END) AS __p119,
         (__p98 * 10000000000::HUGEINT) AS __p120,
         (CAST(0 AS HUGEINT) * 1000000000000000::HUGEINT) AS __p125,
         (CAST(__p17 AS HUGEINT)) AS __p127,
         (CASE WHEN abs(__p127) >= 10000000000::HUGEINT THEN NULL ELSE __p127 END) AS __p128,
         (__p97 * __p128) AS __p129,
         (CASE WHEN abs(__p129) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p129 END) AS __p130,
         (__p130 + __p98) AS __p131,
         (CASE WHEN abs(__p131) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p131 END) AS __p132,
         (__p132 * __p33) AS __p133,
         (CAST(0 AS HUGEINT) * 1000000::HUGEINT) AS __p135,
         CAST(replace(CAST(t.cantidad_cajas AS VARCHAR), '.', '') AS HUGEINT) AS __p137,
         CAST(replace(CAST(t.cantidad_botellas AS VARCHAR), '.', '') AS HUGEINT) AS __p138,
         (CAST(__p17 AS HUGEINT)) AS __p139,
         (CASE WHEN abs(__p139) >= 10000000000::HUGEINT THEN NULL ELSE __p139 END) AS __p140,
         (__p138 * 1::HUGEINT) AS __p141,
         (CAST(0 AS HUGEINT) * 1000000::HUGEINT) AS __p145,
         (CAST(__p17 AS HUGEINT)) AS __p147,
         (CASE WHEN abs(__p147) >= 10000000000::HUGEINT THEN NULL ELSE __p147 END) AS __p148,
         (__p137 * __p148) AS __p149,
         (CASE WHEN abs(__p149) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p149 END) AS __p150,
         (__p150 + __p138) AS __p151,
         (CASE WHEN abs(__p151) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p151 END) AS __p152,
         (__p152 * __p33) AS __p153,
         (CAST(0 AS HUGEINT) * 1000000::HUGEINT) AS __p155,
         (CAST(__p17 AS HUGEINT)) AS __p157,
         (CASE WHEN abs(__p157) >= 10000000000::HUGEINT THEN NULL ELSE __p157 END) AS __p158,
         (__p138 * 1::HUGEINT) AS __p159,
         (CAST(0 AS HUGEINT) * 1000000::HUGEINT) AS __p163,
         (CAST(__p17 AS HUGEINT)) AS __p165,
         (CASE WHEN abs(__p165) >= 10000000000::HUGEINT THEN NULL ELSE __p165 END) AS __p166,
         (__p137 * __p166) AS __p167,
         (CASE WHEN abs(__p167) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p167 END) AS __p168,
         (__p168 + __p138) AS __p169,
         (CASE WHEN abs(__p169) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p169 END) AS __p170,
         (__p170 * __p33) AS __p171,
         (CAST(0 AS HUGEINT) * 1000000::HUGEINT) AS __p173,
         vthv.fecha_creacion AS __p175,
         vthv.fecha_modificacion AS __p176
  FROM step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_detalle_almacen AS vthv
  LEFT JOIN step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_detalle_resumen_almacen_venta AS t ON ((((((((((((vthv.cod_compania = t.cod_compania) AND (vthv.cod_sucursal = t.cod_sucursal)) AND (vthv.cod_almacen = t.cod_almacen)) AND (vthv.cod_documento_pedido = t.cod_documento_pedido)) AND (vthv.nro_documento_pedido = t.nro_documento_pedido)) AND (vthv.cod_cliente = t.cod_cliente)) AND (vthv.cod_articulo = t.cod_articulo)) AND (vthv.cod_documento_almacen = t.cod_documento_almacen)) AND (vthv.nro_documento_almacen = t.nro_documento_almacen)) AND (vthv.cod_documento_venta = t.cod_documento_venta)) AND (vthv.cod_procedimiento_venta = t.cod_procedimiento)) AND (vthv.cod_operacion_venta = t.cod_operacion))
  JOIN stage_m_articulo AS m ON ((vthv.cod_compania = m.cod_compania) AND (vthv.cod_articulo = m.cod_articulo))
  
  )
  )
  )
  GROUP BY __p0, __p1, __p2, __p3, __p4, __p5, __p6, __p8, __p10
  )
  )
  
  )
  )
),
job_t_pedido_detalle_cumplimiento AS (
  SELECT * FROM step_t_pedido_detalle_cumplimiento_df_dom_t_pedido_detalle_cumplimiento
),
step_t_reparto_df_m_compania AS (
  SELECT mp.id_pais AS id_pais,
         mc.cod_compania AS id_compania,
         mc.cod_compania AS cod_compania,
         mc.cod_pais AS cod_pais,
         mpar.cod_moneda_mn AS moneda_mn
  FROM stage_m_compania AS mc
  LEFT JOIN stage_m_parametro AS mpar ON (mpar.id_compania = mc.id_compania)
  JOIN stage_m_pais AS mp ON (mp.cod_pais = mc.cod_pais)
),
step_t_reparto_df_t_movimiento_inventario_filtered AS (
  SELECT *
  FROM stage_t_movimiento_inventario
  WHERE ((strftime(fecha_almacen, '%Y%m') IN ('199504', '199505', '199506')) AND (cod_documento_transaccion IN ('GRA', 'NIN')))
),
step_t_reparto_df_t_movimiento_inventario_filtered__2 AS (
  SELECT * EXCLUDE (id_reparto),
         concat_ws('|', cod_compania, cod_sucursal, cod_almacen_emisor_origen, cod_documento_transaccion, nro_documento_almacen) AS id_reparto
  FROM step_t_reparto_df_t_movimiento_inventario_filtered
),
step_t_reparto_df_t_movimiento_inventario_filtered__3 AS (
  SELECT *,
         row_number() OVER (PARTITION BY id_reparto ORDER BY nro_documento_movimiento DESC) AS orden
  FROM step_t_reparto_df_t_movimiento_inventario_filtered__2
),
step_t_reparto_df_t_movimiento_inventario_filtered__4 AS (
  SELECT *
  FROM step_t_reparto_df_t_movimiento_inventario_filtered__3
  WHERE (orden = 1)
),
step_t_reparto_df_dom_t_reparto AS (
  SELECT mc.id_pais AS id_pais,
         strftime(tmi.fecha_almacen, '%Y%m') AS id_periodo,
         tmi.cod_documento_transaccion AS cod_documento_transaccion,
         tmi.id_reparto AS id_reparto,
         concat_ws('|', tmi.cod_compania, tmi.cod_transportista) AS id_transportista,
         concat_ws('|', tmi.cod_compania, tmi.cod_vehiculo) AS id_medio_transporte,
         concat_ws('|', tmi.cod_compania, tmi.cod_chofer) AS id_chofer,
         tmi.fecha_emision AS fecha_orden_carga,
         tmi.fecha_almacen AS fecha_reparto,
         tmi.fecha_creacion AS fecha_creacion,
         tmi.fecha_modificacion AS fecha_modificacion,
         tmi.cod_estado_comprobante AS estado_guia
  FROM step_t_reparto_df_t_movimiento_inventario_filtered__4 AS tmi
  JOIN step_t_reparto_df_m_compania AS mc USING (cod_compania)
),
step_t_reparto_df_dom_t_reparto__2 AS (
  SELECT CAST(id_pais AS VARCHAR) AS id_pais,
         CAST(id_periodo AS VARCHAR) AS id_periodo,
         CAST(id_reparto AS VARCHAR) AS id_reparto,
         CAST(id_transportista AS VARCHAR) AS id_transportista,
         CAST(id_medio_transporte AS VARCHAR) AS id_medio_transporte,
         CAST(id_chofer AS VARCHAR) AS id_chofer,
         CAST(fecha_orden_carga AS DATE) AS fecha_orden_carga,
         CAST(fecha_reparto AS DATE) AS fecha_reparto,
         CAST(estado_guia AS VARCHAR) AS estado_guia,
         CAST(fecha_creacion AS TIMESTAMP) AS fecha_creacion,
         CAST(fecha_modificacion AS TIMESTAMP) AS fecha_modificacion
  FROM step_t_reparto_df_dom_t_reparto
),
job_t_reparto AS (
  SELECT * FROM step_t_reparto_df_dom_t_reparto__2
),
step_fact_reparto_detalle_tmp_fact_reparto_detalle AS (
  SELECT tpdc.id_pais AS id_pais,
         tpdc.id_periodo AS id_periodo,
         tpdc.id_reparto AS id_reparto,
         tpdc.id_pedido AS id_pedido,
         tpdc.id_producto AS id_producto,
         tpdc.id_sucursal AS id_sucursal,
         tr.id_transportista AS id_transportista,
         tr.id_chofer AS id_chofer,
         tr.id_medio_transporte AS id_medio_transporte,
         tp.id_cliente AS id_cliente,
         tp.id_origen_pedido AS id_origen_pedido,
         tp.id_tipo_pedido AS id_tipo_pedido,
         tp.id_fuerza_venta AS id_fuerza_venta,
         tp.id_vendedor AS id_vendedor,
         tp.id_lista_precio AS id_lista_precio,
         tp.id_forma_pago AS id_forma_pago,
         tp.desc_region AS desc_region,
         tp.desc_subregion AS desc_subregion,
         tp.desc_division AS desc_division,
         tp.cod_zona AS cod_zona,
         tp.cod_ruta AS cod_ruta,
         tp.cod_modulo AS cod_modulo,
         tp.nro_pedido_ref AS nro_pedido_ref,
         tp.fecha_pedido AS fecha_pedido,
         tp.fecha_entrega AS fecha_entrega,
         tr.fecha_orden_carga AS fecha_orden_carga,
         tr.fecha_reparto AS fecha_movimiento_inventario,
         tpdc.fecha_liquidacion AS fecha_liquidacion,
         tr.fecha_reparto AS fecha_almacen,
         tp.nro_pedido AS nro_pedido,
         tr.estado_guia AS estado_guia,
         tpdc.cant_cajafisica_ped AS cant_cajafisica_ped,
         tpdc.cant_cajavolumen_ped AS cant_cajavolumen_ped,
         tpdc.cant_cajafisica_ped_pro AS cant_cajafisica_ped_pro,
         tpdc.cant_cajavolumen_ped_pro AS cant_cajavolumen_ped_pro,
         tpdc.cant_cajafisica_asignado_ped AS cant_cajafisica_asignado_ped,
         tpdc.cant_cajavolumen_asignado_ped AS cant_cajavolumen_asignado_ped,
         tpdc.cant_cajafisica_asignado_ped_pro AS cant_cajafisica_asignado_ped_pro,
         tpdc.cant_cajavolumen_asignado_ped_pro AS cant_cajavolumen_asignado_ped_pro,
         tpdc.cant_cajafisica_desp AS cant_cajafisica_desp,
         tpdc.cant_cajavolumen_desp AS cant_cajavolumen_desp,
         tpdc.cant_cajafisica_desp_pro AS cant_cajafisica_desp_pro,
         tpdc.cant_cajavolumen_desp_pro AS cant_cajavolumen_desp_pro,
         tpdc.cant_caja_fisica_ven AS cant_cajafisica_ven,
         tpdc.cant_caja_volumen_ven AS cant_cajavolumen_ven,
         tpdc.cant_caja_fisica_pro AS cant_cajafisica_pro,
         tpdc.cant_caja_volumen_pro AS cant_cajavolumen_pro,
         tpdc.fecha_creacion AS fecha_creacion,
         tpdc.fecha_modificacion AS fecha_modificacion
  FROM job_t_pedido_detalle_cumplimiento AS tpdc
  LEFT JOIN job_t_pedido AS tp ON (tp.id_pedido = tpdc.id_pedido)
  LEFT JOIN job_t_reparto AS tr ON (tr.id_reparto = tpdc.id_reparto)
  WHERE (tpdc.id_periodo IN ('199504', '199505', '199506'))
),
step_fact_reparto_detalle_df_fact_reparto_detalle AS (
  SELECT CAST(id_pais AS VARCHAR) AS id_pais,
         CAST(id_periodo AS VARCHAR) AS id_periodo,
         CAST(id_reparto AS VARCHAR) AS id_reparto,
         CAST(id_pedido AS VARCHAR) AS id_pedido,
         CAST(id_producto AS VARCHAR) AS id_producto,
         CAST(id_sucursal AS VARCHAR) AS id_sucursal,
         CAST(id_transportista AS VARCHAR) AS id_transportista,
         CAST(id_chofer AS VARCHAR) AS id_chofer,
         CAST(id_medio_transporte AS VARCHAR) AS id_medio_transporte,
         CAST(id_cliente AS VARCHAR) AS id_cliente,
         CAST(id_origen_pedido AS VARCHAR) AS id_origen_pedido,
         CAST(id_tipo_pedido AS VARCHAR) AS id_tipo_pedido,
         CAST(id_fuerza_venta AS VARCHAR) AS id_fuerza_venta,
         CAST(id_vendedor AS VARCHAR) AS id_vendedor,
         CAST(id_lista_precio AS VARCHAR) AS id_lista_precio,
         CAST(id_forma_pago AS VARCHAR) AS id_forma_pago,
         CAST(desc_region AS VARCHAR) AS desc_region,
         CAST(desc_subregion AS VARCHAR) AS desc_subregion,
         CAST(desc_division AS VARCHAR) AS desc_division,
         CAST(cod_zona AS VARCHAR) AS cod_zona,
         CAST(cod_ruta AS VARCHAR) AS cod_ruta,
         CAST(cod_modulo AS VARCHAR) AS cod_modulo,
         CAST(nro_pedido_ref AS VARCHAR) AS nro_pedido_ref,
         CAST(fecha_pedido AS DATE) AS fecha_pedido,
         CAST(fecha_entrega AS DATE) AS fecha_entrega,
         CAST(fecha_orden_carga AS DATE) AS fecha_orden_carga,
         CAST(fecha_movimiento_inventario AS DATE) AS fecha_movimiento_inventario,
         CAST(fecha_liquidacion AS DATE) AS fecha_liquidacion,
         CAST(fecha_almacen AS DATE) AS fecha_almacen,
         CAST(nro_pedido AS VARCHAR) AS nro_pedido,
         CAST(estado_guia AS VARCHAR) AS estado_guia,
         CAST(cant_cajafisica_ped AS DECIMAL(38,12)) AS cant_cajafisica_ped,
         CAST(cant_cajavolumen_ped AS DECIMAL(38,12)) AS cant_cajavolumen_ped,
         CAST(cant_cajafisica_ped_pro AS DECIMAL(38,12)) AS cant_cajafisica_ped_pro,
         CAST(cant_cajavolumen_ped_pro AS DECIMAL(38,12)) AS cant_cajavolumen_ped_pro,
         CAST(cant_cajafisica_asignado_ped AS DECIMAL(38,12)) AS cant_cajafisica_asignado_ped,
         CAST(cant_cajavolumen_asignado_ped AS DECIMAL(38,12)) AS cant_cajavolumen_asignado_ped,
         CAST(cant_cajafisica_asignado_ped_pro AS DECIMAL(38,12)) AS cant_cajafisica_asignado_ped_pro,
         CAST(cant_cajavolumen_asignado_ped_pro AS DECIMAL(38,12)) AS cant_cajavolumen_asignado_ped_pro,
         CAST(cant_cajafisica_desp AS DECIMAL(38,12)) AS cant_cajafisica_desp,
         CAST(cant_cajavolumen_desp AS DECIMAL(38,12)) AS cant_cajavolumen_desp,
         CAST(cant_cajafisica_desp_pro AS DECIMAL(38,12)) AS cant_cajafisica_desp_pro,
         CAST(cant_cajavolumen_desp_pro AS DECIMAL(38,12)) AS cant_cajavolumen_desp_pro,
         CAST(cant_cajafisica_ven AS DECIMAL(38,12)) AS cant_cajafisica_ven,
         CAST(cant_cajavolumen_ven AS DECIMAL(38,12)) AS cant_cajavolumen_ven,
         CAST(cant_cajafisica_pro AS DECIMAL(38,12)) AS cant_cajafisica_pro,
         CAST(cant_cajavolumen_pro AS DECIMAL(38,12)) AS cant_cajavolumen_pro,
         CAST(fecha_creacion AS TIMESTAMP) AS fecha_creacion,
         CAST(fecha_modificacion AS TIMESTAMP) AS fecha_modificacion
  FROM step_fact_reparto_detalle_tmp_fact_reparto_detalle
),
job_fact_reparto_detalle AS (
  SELECT * FROM step_fact_reparto_detalle_df_fact_reparto_detalle
)
 SELECT id_pais,
       id_periodo,
       id_reparto,
       id_pedido,
       id_producto,
       id_sucursal,
       id_transportista,
       id_chofer,
       id_medio_transporte,
       id_cliente,
       id_origen_pedido,
       id_tipo_pedido,
       id_fuerza_venta,
       id_vendedor,
       id_lista_precio,
       id_forma_pago,
       desc_region,
       desc_subregion,
       desc_division,
       cod_zona,
       cod_ruta,
       cod_modulo,
       nro_pedido_ref,
       fecha_pedido,
       fecha_entrega,
       fecha_orden_carga,
       fecha_movimiento_inventario,
       fecha_liquidacion,
       fecha_almacen,
       nro_pedido,
       estado_guia,
       CAST(CAST(cant_cajafisica_ped AS VARCHAR) AS DOUBLE) AS cant_cajafisica_ped,
       CAST(CAST(cant_cajavolumen_ped AS VARCHAR) AS DOUBLE) AS cant_cajavolumen_ped,
       CAST(CAST(cant_cajafisica_ped_pro AS VARCHAR) AS DOUBLE) AS cant_cajafisica_ped_pro,
       CAST(CAST(cant_cajavolumen_ped_pro AS VARCHAR) AS DOUBLE) AS cant_cajavolumen_ped_pro,
       CAST(CAST(cant_cajafisica_asignado_ped AS VARCHAR) AS DOUBLE) AS cant_cajafisica_asignado_ped,
       CAST(CAST(cant_cajavolumen_asignado_ped AS VARCHAR) AS DOUBLE) AS cant_cajavolumen_asignado_ped,
       CAST(CAST(cant_cajafisica_asignado_ped_pro AS VARCHAR) AS DOUBLE) AS cant_cajafisica_asignado_ped_pro,
       CAST(CAST(cant_cajavolumen_asignado_ped_pro AS VARCHAR) AS DOUBLE) AS cant_cajavolumen_asignado_ped_pro,
       CAST(CAST(cant_cajafisica_desp AS VARCHAR) AS DOUBLE) AS cant_cajafisica_desp,
       CAST(CAST(cant_cajavolumen_desp AS VARCHAR) AS DOUBLE) AS cant_cajavolumen_desp,
       CAST(CAST(cant_cajafisica_desp_pro AS VARCHAR) AS DOUBLE) AS cant_cajafisica_desp_pro,
       CAST(CAST(cant_cajavolumen_desp_pro AS VARCHAR) AS DOUBLE) AS cant_cajavolumen_desp_pro,
       CAST(CAST(cant_cajafisica_ven AS VARCHAR) AS DOUBLE) AS cant_cajafisica_ven,
       CAST(CAST(cant_cajavolumen_ven AS VARCHAR) AS DOUBLE) AS cant_cajavolumen_ven,
       CAST(CAST(cant_cajafisica_pro AS VARCHAR) AS DOUBLE) AS cant_cajafisica_pro,
       CAST(CAST(cant_cajavolumen_pro AS VARCHAR) AS DOUBLE) AS cant_cajavolumen_pro,
       fecha_creacion,
       fecha_modificacion FROM job_fact_reparto_detalle