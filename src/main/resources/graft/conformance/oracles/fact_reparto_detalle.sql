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
  SELECT vthv.cod_compania,
         vthv.cod_sucursal,
         vthv.cod_almacen,
         t.cod_documento_almacen,
         t.nro_documento_almacen,
         vthv.cod_documento_pedido,
         vthv.nro_documento_pedido,
         vthv.cod_cliente,
         vthvd.cod_articulo,
         vthv.cod_documento_venta,
         vthv.cod_procedimiento,
         vthvd.cod_operacion,
         max(vthv.fecha_liquidacion) AS fecha_liquidacion,
         sum((CASE WHEN (vthv.cod_documento_venta = 'NCC') THEN (- 1) ELSE 1 END * vthvd.cant_paquete)) AS cantidad_cajas,
         sum((CASE WHEN (vthv.cod_documento_venta = 'NCC') THEN (- 1) ELSE 1 END * vthvd.cant_unidad)) AS cantidad_botellas
  FROM stage_t_documento_venta AS vthv
  JOIN stage_t_documento_venta_detalle AS vthvd ON (((((vthv.cod_compania = vthvd.cod_compania) AND (vthv.cod_sucursal = vthvd.cod_sucursal)) AND (vthv.cod_almacen = vthvd.cod_almacen)) AND (vthv.cod_documento_venta = vthvd.cod_documento_transaccion)) AND (vthv.nro_documento_venta = vthvd.nro_comprobante_venta))
  JOIN step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_detalle_almacen_unico AS t ON ((((((((((vthv.cod_compania = t.cod_compania) AND (vthv.cod_sucursal = t.cod_sucursal)) AND (vthv.cod_almacen = t.cod_almacen)) AND (vthv.cod_documento_pedido = t.cod_documento_pedido)) AND (vthv.nro_documento_pedido = t.nro_documento_pedido)) AND (vthv.cod_documento_almacen = t.cod_documento_almacen)) AND (vthv.nro_documento_almacen = t.nro_documento_almacen)) AND (vthv.cod_documento_venta = t.cod_documento_venta)) AND (vthv.cod_procedimiento = t.cod_procedimiento_venta)) AND (vthvd.cod_operacion = t.cod_operacion_venta))
  WHERE ((NOT (vthv.cod_documento_venta IN ('RMD', 'CMD'))) AND (vthv.cod_estado_comprobante <> '002'))
  GROUP BY vthv.cod_compania, vthv.cod_sucursal, vthv.cod_almacen, t.cod_documento_almacen, t.nro_documento_almacen, vthv.cod_documento_pedido, vthv.nro_documento_pedido, vthv.cod_cliente, vthvd.cod_articulo, vthv.cod_documento_venta, vthv.cod_procedimiento, vthvd.cod_operacion
  )
),
step_t_pedido_detalle_cumplimiento_df_dom_t_pedido_detalle_cumplimiento AS (
  SELECT id_pais AS id_pais,
         id_periodo AS id_periodo,
         concat_ws('|', cod_compania, cod_sucursal) AS id_sucursal,
         (cod_compania || '|' || cod_sucursal || '|' || cod_almacen || '|' || cod_documento_pedido || '|' || nro_documento_pedido || '|' || cod_cliente) AS id_pedido,
         (cod_compania || '|' || cod_articulo) AS id_producto,
         CASE WHEN (coalesce(cod_documento_almacen, '') <> '') THEN (cod_compania || '|' || cod_sucursal || '|' || cod_almacen || '|' || cod_documento_almacen || '|' || nro_documento_almacen) ELSE NULL END AS id_reparto,
         CAST(fecha_liquidacion AS DATE) AS fecha_liquidacion,
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
         CAST(cant_caja_fisica_ven AS DECIMAL(38,12)) AS cant_caja_fisica_ven,
         CAST(cant_caja_volumen_ven AS DECIMAL(38,12)) AS cant_caja_volumen_ven,
         CAST(cant_caja_fisica_pro AS DECIMAL(38,12)) AS cant_caja_fisica_pro,
         CAST(cant_caja_volumen_pro AS DECIMAL(38,12)) AS cant_caja_volumen_pro,
         CAST(fecha_creacion AS TIMESTAMP) AS fecha_creacion,
         CAST(fecha_modificacion AS TIMESTAMP) AS fecha_modificacion
  FROM (
  SELECT vthv.cod_compania,
         vthv.cod_sucursal,
         vthv.cod_almacen,
         vthv.cod_documento_pedido,
         vthv.nro_documento_pedido,
         vthv.cod_cliente,
         vthv.cod_articulo,
         coalesce(vthv.cod_documento_almacen, '') AS cod_documento_almacen,
         coalesce(vthv.nro_documento_almacen, '') AS nro_documento_almacen,
         max(vthv.id_pais) AS id_pais,
         max(vthv.id_periodo) AS id_periodo,
         max(t.fecha_liquidacion) AS fecha_liquidacion,
         sum(CASE WHEN (vthv.cod_tipo_operacion = 'Ven') THEN (vthv.cantidad_cajas + (vthv.cantidad_botellas / m.cant_unidad_paquete)) ELSE 0 END) AS cant_cajafisica_ped,
         sum(CASE WHEN (vthv.cod_tipo_operacion = 'Ven') THEN (((vthv.cantidad_cajas * m.cant_unidad_paquete) + vthv.cantidad_botellas) * m.cant_unidad_volumen) ELSE 0 END) AS cant_cajavolumen_ped,
         sum(CASE WHEN (vthv.cod_tipo_operacion = 'Pro') THEN (vthv.cantidad_cajas + (vthv.cantidad_botellas / m.cant_unidad_paquete)) ELSE 0 END) AS cant_cajafisica_ped_pro,
         sum(CASE WHEN (vthv.cod_tipo_operacion = 'Pro') THEN (((vthv.cantidad_cajas * m.cant_unidad_paquete) + vthv.cantidad_botellas) * m.cant_unidad_volumen) ELSE 0 END) AS cant_cajavolumen_ped_pro,
         sum(CASE WHEN (vthv.cod_tipo_operacion = 'Ven') THEN (vthv.cantidad_cajas_asignada + (vthv.cantidad_botellas_asignada / m.cant_unidad_paquete)) ELSE 0 END) AS cant_cajafisica_asignado_ped,
         sum(CASE WHEN (vthv.cod_tipo_operacion = 'Ven') THEN (((vthv.cantidad_cajas_asignada * m.cant_unidad_paquete) + vthv.cantidad_botellas_asignada) * m.cant_unidad_volumen) ELSE 0 END) AS cant_cajavolumen_asignado_ped,
         sum(CASE WHEN (vthv.cod_tipo_operacion = 'Pro') THEN (vthv.cantidad_cajas_asignada + (vthv.cantidad_botellas_asignada / m.cant_unidad_paquete)) ELSE 0 END) AS cant_cajafisica_asignado_ped_pro,
         sum(CASE WHEN (vthv.cod_tipo_operacion = 'Pro') THEN (((vthv.cantidad_cajas_asignada * m.cant_unidad_paquete) + vthv.cantidad_botellas_asignada) * m.cant_unidad_volumen) ELSE 0 END) AS cant_cajavolumen_asignado_ped_pro,
         sum(CASE WHEN (vthv.cod_tipo_operacion = 'Ven') THEN (vthv.cantidad_cajas_despechado + (vthv.cantidad_botellas_despechado / m.cant_unidad_paquete)) ELSE 0 END) AS cant_cajafisica_desp,
         sum(CASE WHEN (vthv.cod_tipo_operacion = 'Ven') THEN (((vthv.cantidad_cajas_despechado * m.cant_unidad_paquete) + vthv.cantidad_botellas_despechado) * m.cant_unidad_volumen) ELSE 0 END) AS cant_cajavolumen_desp,
         sum(CASE WHEN (vthv.cod_tipo_operacion = 'Pro') THEN (vthv.cantidad_cajas_despechado + (vthv.cantidad_botellas_despechado / m.cant_unidad_paquete)) ELSE 0 END) AS cant_cajafisica_desp_pro,
         sum(CASE WHEN (vthv.cod_tipo_operacion = 'Pro') THEN (((vthv.cantidad_cajas_despechado * m.cant_unidad_paquete) + vthv.cantidad_botellas_despechado) * m.cant_unidad_volumen) ELSE 0 END) AS cant_cajavolumen_desp_pro,
         sum(CASE WHEN (vthv.cod_tipo_operacion = 'Ven') THEN (t.cantidad_cajas + (t.cantidad_botellas / m.cant_unidad_paquete)) ELSE 0 END) AS cant_caja_fisica_ven,
         sum(CASE WHEN (vthv.cod_tipo_operacion = 'Ven') THEN (((t.cantidad_cajas * m.cant_unidad_paquete) + t.cantidad_botellas) * m.cant_unidad_volumen) ELSE 0 END) AS cant_caja_volumen_ven,
         sum(CASE WHEN (vthv.cod_tipo_operacion = 'Pro') THEN (t.cantidad_cajas + (t.cantidad_botellas / m.cant_unidad_paquete)) ELSE 0 END) AS cant_caja_fisica_pro,
         sum(CASE WHEN (vthv.cod_tipo_operacion = 'Pro') THEN (((t.cantidad_cajas * m.cant_unidad_paquete) + t.cantidad_botellas) * m.cant_unidad_volumen) ELSE 0 END) AS cant_caja_volumen_pro,
         max(vthv.fecha_creacion) AS fecha_creacion,
         max(vthv.fecha_modificacion) AS fecha_modificacion
  FROM step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_detalle_almacen AS vthv
  LEFT JOIN step_t_pedido_detalle_cumplimiento_df_t_historico_pedido_detalle_resumen_almacen_venta AS t ON ((((((((((((vthv.cod_compania = t.cod_compania) AND (vthv.cod_sucursal = t.cod_sucursal)) AND (vthv.cod_almacen = t.cod_almacen)) AND (vthv.cod_documento_pedido = t.cod_documento_pedido)) AND (vthv.nro_documento_pedido = t.nro_documento_pedido)) AND (vthv.cod_cliente = t.cod_cliente)) AND (vthv.cod_articulo = t.cod_articulo)) AND (vthv.cod_documento_almacen = t.cod_documento_almacen)) AND (vthv.nro_documento_almacen = t.nro_documento_almacen)) AND (vthv.cod_documento_venta = t.cod_documento_venta)) AND (vthv.cod_procedimiento_venta = t.cod_procedimiento)) AND (vthv.cod_operacion_venta = t.cod_operacion))
  JOIN stage_m_articulo AS m ON ((vthv.cod_compania = m.cod_compania) AND (vthv.cod_articulo = m.cod_articulo))
  GROUP BY vthv.cod_compania, vthv.cod_sucursal, vthv.cod_almacen, vthv.cod_documento_pedido, vthv.nro_documento_pedido, vthv.cod_cliente, vthv.cod_articulo, coalesce(vthv.cod_documento_almacen, ''), coalesce(vthv.nro_documento_almacen, '')
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
       CAST(cant_cajafisica_ped AS DOUBLE) AS cant_cajafisica_ped,
       CAST(cant_cajavolumen_ped AS DOUBLE) AS cant_cajavolumen_ped,
       CAST(cant_cajafisica_ped_pro AS DOUBLE) AS cant_cajafisica_ped_pro,
       CAST(cant_cajavolumen_ped_pro AS DOUBLE) AS cant_cajavolumen_ped_pro,
       CAST(cant_cajafisica_asignado_ped AS DOUBLE) AS cant_cajafisica_asignado_ped,
       CAST(cant_cajavolumen_asignado_ped AS DOUBLE) AS cant_cajavolumen_asignado_ped,
       CAST(cant_cajafisica_asignado_ped_pro AS DOUBLE) AS cant_cajafisica_asignado_ped_pro,
       CAST(cant_cajavolumen_asignado_ped_pro AS DOUBLE) AS cant_cajavolumen_asignado_ped_pro,
       CAST(cant_cajafisica_desp AS DOUBLE) AS cant_cajafisica_desp,
       CAST(cant_cajavolumen_desp AS DOUBLE) AS cant_cajavolumen_desp,
       CAST(cant_cajafisica_desp_pro AS DOUBLE) AS cant_cajafisica_desp_pro,
       CAST(cant_cajavolumen_desp_pro AS DOUBLE) AS cant_cajavolumen_desp_pro,
       CAST(cant_cajafisica_ven AS DOUBLE) AS cant_cajafisica_ven,
       CAST(cant_cajavolumen_ven AS DOUBLE) AS cant_cajavolumen_ven,
       CAST(cant_cajafisica_pro AS DOUBLE) AS cant_cajafisica_pro,
       CAST(cant_cajavolumen_pro AS DOUBLE) AS cant_cajavolumen_pro,
       fecha_creacion,
       fecha_modificacion FROM job_fact_reparto_detalle