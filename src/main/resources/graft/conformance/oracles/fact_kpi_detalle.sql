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
stage_m_linea AS (
  SELECT DISTINCT cod_compania, cod_linea,
         ('LINEA ' || cod_linea) AS desc_linea,
         CASE WHEN cod_linea = '12' THEN 'TE'
              WHEN cod_linea = '17' THEN 'T' ELSE 'F' END AS flg_linea
  FROM stage_m_articulo
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
stage_m_documento_transaccion AS (
  SELECT DISTINCT lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS cod_compania,
         t.cod AS cod_documento_transaccion,
         ('DOC TRANS ' || t.cod) AS desc_documento_transaccion
  FROM nation JOIN
       (SELECT DISTINCT CASE n_nationkey % 8 WHEN 0 THEN 'FAC'
                WHEN 1 THEN 'BOL' WHEN 2 THEN 'NCC' WHEN 3 THEN 'GRA'
                WHEN 4 THEN 'NIN' WHEN 5 THEN '200' WHEN 6 THEN '300'
                ELSE 'DCV' END AS cod FROM nation) t
       ON n_nationkey % 1 = length(t.cod) % 1
),
stage_m_tipo_documento AS (
  SELECT DISTINCT d.cod_compania,
         d.cod_documento_transaccion AS cod_tipo_documento
  FROM stage_m_documento_transaccion d
),
stage_m_tipo_transaccion AS (
  SELECT DISTINCT cod_compania, cod_documento_transaccion,
         CASE WHEN cod_documento_transaccion IN ('FAC', 'BOL', 'DCV', '200', '300')
              THEN 'DCV' ELSE 'STD' END AS cod_tipo_transaccion
  FROM stage_m_documento_transaccion
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
stage_t_visita AS (
  SELECT CAST(c_custkey AS VARCHAR) AS cod_cliente,
         lpad(CAST((c_custkey) % 25 AS VARCHAR), 2, '0') AS cod_compania,
         lpad(CAST((c_custkey) % 5 AS VARCHAR), 2, '0') AS cod_sucursal,
         CAST(c_custkey % 3 AS VARCHAR) AS cod_fuerza_venta,
         CAST(('1995-0' || CAST(4 + (c_custkey) % 3 AS VARCHAR) || '-' || lpad(CAST(1 + (c_custkey) % 28 AS VARCHAR), 2, '0')) AS DATE) AS fecha_visita,
         CAST((CAST(CAST(('1995-0' || CAST(4 + (c_custkey + 2) % 3 AS VARCHAR) || '-' || lpad(CAST(1 + (c_custkey + 2) % 28 AS VARCHAR), 2, '0')) AS DATE) AS VARCHAR) || ' ' || lpad(CAST((c_custkey + 2) % 24 AS VARCHAR), 2, '0') || ':00:00') AS TIMESTAMP) AS fecha_modificacion
  FROM customer
),
step_m_tipo_venta_st_tipo_transaccion AS (
  SELECT cod_compania AS cod_compania,
         cod_documento_transaccion AS cod_documento_transaccion
  FROM stage_m_tipo_transaccion
  WHERE (cod_tipo_transaccion = 'DCV')
),
step_m_tipo_venta_df_m_tipo_venta AS (
  SELECT CAST((trim(d.cod_compania) || '|' || trim(d.cod_documento_transaccion) || '|' || trim(d.cod_procedimiento)) AS VARCHAR) AS id_tipo_venta,
         CAST(mp.id_pais AS VARCHAR) AS id_pais,
         CAST(d.cod_procedimiento AS VARCHAR) AS cod_tipo_venta,
         CAST(coalesce(d.desc_procedimiento, 'ninguno') AS VARCHAR) AS nomb_tipo_venta,
         CAST(d.cod_tipo_operacion AS VARCHAR) AS cod_tipo_operacion,
         CAST(DATE '1995-07-01' AS DATE) AS fecha_creacion,
         CAST(DATE '1995-07-01' AS DATE) AS fecha_modificacion
  FROM stage_m_procedimiento AS d
  JOIN stage_m_tipo_documento AS c ON ((d.cod_compania = c.cod_compania) AND (d.cod_documento_transaccion = c.cod_tipo_documento))
  JOIN stage_m_compania AS e ON (d.cod_compania = e.cod_compania)
  JOIN stage_m_pais AS mp ON (mp.cod_pais = e.cod_pais)
  JOIN step_m_tipo_venta_st_tipo_transaccion AS tt ON ((c.cod_compania = tt.cod_compania) AND (c.cod_tipo_documento = tt.cod_documento_transaccion))
),
job_m_tipo_venta AS (
  SELECT * FROM step_m_tipo_venta_df_m_tipo_venta
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
step_t_pedido_detalle_df_t_historico_pedido_detalle AS (
  SELECT *
  FROM stage_t_documento_pedido_detalle
  WHERE (strftime(fecha_pedido, '%Y%m') IN ('199504', '199505', '199506'))
),
step_t_pedido_detalle_df_t_historico_pedido_ades_detalle AS (
  SELECT *
  FROM stage_t_documento_pedido_ades_detalle
  WHERE (strftime(fecha_pedido, '%Y%m') IN ('199504', '199505', '199506'))
),
step_t_pedido_detalle_df_m_compania AS (
  SELECT mc.cod_compania AS cod_compania,
         trim(mp.id_pais) AS id_pais,
         trim(mc.cod_pais) AS cod_pais,
         trim(mpar.cod_moneda_mn) AS moneda_mn
  FROM stage_m_compania AS mc
  LEFT JOIN stage_m_parametro AS mpar ON (mpar.id_compania = mc.id_compania)
  JOIN stage_m_pais AS mp ON (mp.cod_pais = mc.cod_pais)
),
step_t_pedido_detalle_df_t_historico_pedido_detalle_filter AS (
  SELECT mc.id_pais AS id_pais,
         strftime(thvd.fecha_pedido, '%Y%m') AS id_periodo,
         thvd.cod_compania AS cod_compania,
         thvd.cod_sucursal AS cod_sucursal,
         thvd.cod_almacen AS cod_almacen_emisor,
         thvd.cod_documento_pedido AS cod_documento_transaccion,
         thvd.nro_documento_pedido AS nro_comprobante,
         thvd.cod_cliente AS cod_cliente,
         thvd.cod_articulo AS cod_articulo,
         thvd.cod_procedimiento AS cod_procedimiento,
         thvd.id_salesforce AS id_salesforce,
         thvd.fecha_pedido AS fecha_pedido,
         thvd.cant_paquete AS cantidad_cajas,
         thvd.cant_unidad AS cantidad_botellas,
         thvd.cant_paquete_asignado AS cantidad_cajas_asignada,
         thvd.cant_unidad_asignado AS cantidad_botellas_asignada,
         thvd.fecha_creacion AS fecha_creacion,
         thvd.fecha_modificacion AS fecha_modificacion,
         0 AS es_eliminado
  FROM step_t_pedido_detalle_df_t_historico_pedido_detalle AS thvd
  JOIN step_t_pedido_detalle_df_m_compania AS mc ON (thvd.cod_compania = mc.cod_compania)
  WHERE (cod_documento_pedido = '200')
),
step_t_pedido_detalle_df_t_historico_pedido_ades_detalle_filter AS (
  SELECT mc.id_pais AS id_pais,
         strftime(thvd.fecha_pedido, '%Y%m') AS id_periodo,
         thvd.cod_compania AS cod_compania,
         thvd.cod_sucursal AS cod_sucursal,
         thvd.cod_almacen_emisor AS cod_almacen_emisor,
         thvd.cod_documento_transaccion AS cod_documento_transaccion,
         thvd.nro_comprobante AS nro_comprobante,
         thvd.cod_cliente AS cod_cliente,
         thvd.cod_articulo AS cod_articulo,
         thvd.cod_procedimiento AS cod_procedimiento,
         thvd.id_salesforce AS id_salesforce,
         thvd.fecha_pedido AS fecha_pedido,
         thvd.cantidad_cajas AS cantidad_cajas,
         thvd.cantidad_botellas AS cantidad_botellas,
         thvd.cantidad_cajas_asignada AS cantidad_cajas_asignada,
         thvd.cantidad_botellas_asignada AS cantidad_botellas_asignada,
         thvd.fecha_creacion AS fecha_creacion,
         thvd.fecha_modificacion AS fecha_modificacion,
         0 AS es_eliminado
  FROM step_t_pedido_detalle_df_t_historico_pedido_ades_detalle AS thvd
  JOIN step_t_pedido_detalle_df_m_compania AS mc ON (thvd.cod_compania = mc.cod_compania)
  WHERE (cod_documento_transaccion IN ('200', '300'))
),
step_t_pedido_detalle_df_t_historico_pedido_detalle_group AS (
  SELECT id_pais AS id_pais,
         id_periodo AS id_periodo,
         cod_compania AS cod_compania,
         cod_sucursal AS cod_sucursal,
         cod_almacen_emisor AS cod_almacen_emisor,
         cod_documento_transaccion AS cod_documento_transaccion,
         nro_comprobante AS nro_comprobante,
         cod_cliente AS cod_cliente,
         cod_articulo AS cod_articulo,
         cod_procedimiento AS cod_procedimiento,
         id_salesforce AS id_salesforce,
         fecha_pedido AS fecha_pedido,
         cantidad_cajas AS cantidad_cajas,
         cantidad_botellas AS cantidad_botellas,
         cantidad_cajas_asignada AS cantidad_cajas_asignada,
         cantidad_botellas_asignada AS cantidad_botellas_asignada,
         fecha_creacion AS fecha_creacion,
         fecha_modificacion AS fecha_modificacion,
         es_eliminado AS es_eliminado
  FROM (
  SELECT thvd.cod_compania,
         thvd.cod_sucursal,
         thvd.cod_almacen_emisor,
         thvd.cod_documento_transaccion,
         thvd.nro_comprobante,
         thvd.cod_cliente,
         thvd.cod_articulo,
         thvd.cod_procedimiento,
         max(thvd.id_pais) AS id_pais,
         max(thvd.id_periodo) AS id_periodo,
         max(thvd.id_salesforce) AS id_salesforce,
         max(thvd.fecha_pedido) AS fecha_pedido,
         sum(thvd.cantidad_cajas) AS cantidad_cajas,
         sum(thvd.cantidad_botellas) AS cantidad_botellas,
         sum(thvd.cantidad_cajas_asignada) AS cantidad_cajas_asignada,
         sum(thvd.cantidad_botellas_asignada) AS cantidad_botellas_asignada,
         max(thvd.fecha_creacion) AS fecha_creacion,
         max(thvd.fecha_modificacion) AS fecha_modificacion,
         max(thvd.es_eliminado) AS es_eliminado
  FROM step_t_pedido_detalle_df_t_historico_pedido_detalle_filter AS thvd
  GROUP BY thvd.cod_compania, thvd.cod_sucursal, thvd.cod_almacen_emisor, thvd.cod_documento_transaccion, thvd.nro_comprobante, thvd.cod_cliente, thvd.cod_articulo, thvd.cod_procedimiento
  )
),
step_t_pedido_detalle_df_t_historico_pedido_ades_detalle_group AS (
  SELECT id_pais AS id_pais,
         id_periodo AS id_periodo,
         cod_compania AS cod_compania,
         cod_sucursal AS cod_sucursal,
         cod_almacen_emisor AS cod_almacen_emisor,
         cod_documento_transaccion AS cod_documento_transaccion,
         nro_comprobante AS nro_comprobante,
         cod_cliente AS cod_cliente,
         cod_articulo AS cod_articulo,
         cod_procedimiento AS cod_procedimiento,
         id_salesforce AS id_salesforce,
         fecha_pedido AS fecha_pedido,
         cantidad_cajas AS cantidad_cajas,
         cantidad_botellas AS cantidad_botellas,
         cantidad_cajas_asignada AS cantidad_cajas_asignada,
         cantidad_botellas_asignada AS cantidad_botellas_asignada,
         fecha_creacion AS fecha_creacion,
         fecha_modificacion AS fecha_modificacion,
         es_eliminado AS es_eliminado
  FROM (
  SELECT thvd.cod_compania,
         thvd.cod_sucursal,
         thvd.cod_almacen_emisor,
         thvd.cod_documento_transaccion,
         thvd.nro_comprobante,
         thvd.cod_cliente,
         thvd.cod_articulo,
         thvd.cod_procedimiento,
         max(thvd.id_pais) AS id_pais,
         max(thvd.id_periodo) AS id_periodo,
         max(thvd.id_salesforce) AS id_salesforce,
         max(thvd.fecha_pedido) AS fecha_pedido,
         sum(thvd.cantidad_cajas) AS cantidad_cajas,
         sum(thvd.cantidad_botellas) AS cantidad_botellas,
         sum(thvd.cantidad_cajas_asignada) AS cantidad_cajas_asignada,
         sum(thvd.cantidad_botellas_asignada) AS cantidad_botellas_asignada,
         max(thvd.fecha_creacion) AS fecha_creacion,
         max(thvd.fecha_modificacion) AS fecha_modificacion,
         max(thvd.es_eliminado) AS es_eliminado
  FROM step_t_pedido_detalle_df_t_historico_pedido_ades_detalle_filter AS thvd
  GROUP BY thvd.cod_compania, thvd.cod_sucursal, thvd.cod_almacen_emisor, thvd.cod_documento_transaccion, thvd.nro_comprobante, thvd.cod_cliente, thvd.cod_articulo, thvd.cod_procedimiento
  )
),
step_t_pedido_detalle_df_t_historico_pedido_ades_detalle_left_anti AS (
  SELECT *
  FROM step_t_pedido_detalle_df_t_historico_pedido_ades_detalle_group AS a
  ANTI JOIN step_t_pedido_detalle_df_t_historico_pedido_detalle_group AS b ON (((((((a.cod_compania = b.cod_compania) AND (a.cod_sucursal = b.cod_sucursal)) AND (a.cod_almacen_emisor = b.cod_almacen_emisor)) AND (a.cod_documento_transaccion = b.cod_documento_transaccion)) AND (a.nro_comprobante = b.nro_comprobante)) AND (a.cod_articulo = b.cod_articulo)) AND (a.cod_procedimiento = b.cod_procedimiento))
),
step_t_pedido_detalle_df_t_historico_pedido_detalle_union AS (
  (SELECT *
  FROM step_t_pedido_detalle_df_t_historico_pedido_detalle_group)
  UNION ALL BY NAME
  (SELECT * FROM step_t_pedido_detalle_df_t_historico_pedido_ades_detalle_left_anti)
),
step_t_pedido_detalle_df_t_historico_pedido_detalle_articulo AS (
  SELECT id_pais AS id_pais,
         id_periodo AS id_periodo,
         cod_compania AS cod_compania,
         cod_sucursal AS cod_sucursal,
         cod_almacen_emisor AS cod_almacen_emisor,
         cod_documento_transaccion AS cod_documento_transaccion,
         nro_comprobante AS nro_comprobante,
         cod_cliente AS cod_cliente,
         cod_articulo AS cod_articulo,
         fecha_pedido AS fecha_pedido,
         cant_contenido AS cant_contenido,
         cantidad_total AS cantidad_total,
         cant_cajafisica_ped AS cant_cajafisica_ped,
         cant_cajavolumen_ped AS cant_cajavolumen_ped,
         cant_cajafisica_ped_pro AS cant_cajafisica_ped_pro,
         cant_cajavolumen_ped_pro AS cant_cajavolumen_ped_pro,
         cant_cajafisica_asignado_ped AS cant_cajafisica_asignado_ped,
         cant_cajavolumen_asignado_ped AS cant_cajavolumen_asignado_ped,
         cant_cajafisica_asignado_ped_pro AS cant_cajafisica_asignado_ped_pro,
         cant_cajavolumen_asignado_ped_pro AS cant_cajavolumen_asignado_ped_pro,
         fecha_creacion AS fecha_creacion,
         fecha_modificacion AS fecha_modificacion,
         es_eliminado AS es_eliminado
  FROM (
  SELECT __p0 AS cod_compania,
         __p1 AS cod_sucursal,
         __p2 AS cod_almacen_emisor,
         __p3 AS cod_documento_transaccion,
         __p4 AS nro_comprobante,
         __p5 AS cod_cliente,
         __p6 AS cod_articulo,
         __agg0 AS id_pais,
         __agg1 AS id_periodo,
         __agg2 AS fecha_pedido,
         __agg3 AS cant_contenido,
         CAST((CASE WHEN __agg4 < 0 THEN '-' ELSE '' END || CAST(abs(__agg4) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__agg4) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(18,6)) AS cantidad_total,
         CAST((CASE WHEN (CASE WHEN abs(__agg5) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg5 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg5) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg5 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg5) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg5 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_cajafisica_ped,
         CAST((CASE WHEN (CASE WHEN abs(__agg6) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg6 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg6) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg6 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg6) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg6 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_cajavolumen_ped,
         CAST((CASE WHEN (CASE WHEN abs(__agg7) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg7 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg7) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg7 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg7) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg7 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_cajafisica_ped_pro,
         CAST((CASE WHEN (CASE WHEN abs(__agg8) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg8 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg8) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg8 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg8) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg8 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_cajavolumen_ped_pro,
         CAST((CASE WHEN (CASE WHEN abs(__agg9) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg9 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg9) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg9 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg9) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg9 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_cajafisica_asignado_ped,
         CAST((CASE WHEN (CASE WHEN abs(__agg10) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg10 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg10) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg10 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg10) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg10 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_cajavolumen_asignado_ped,
         CAST((CASE WHEN (CASE WHEN abs(__agg11) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg11 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg11) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg11 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg11) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg11 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_cajafisica_asignado_ped_pro,
         CAST((CASE WHEN (CASE WHEN abs(__agg12) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg12 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg12) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg12 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg12) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg12 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_cajavolumen_asignado_ped_pro,
         __agg13 AS fecha_creacion,
         __agg14 AS fecha_modificacion,
         __agg15 AS es_eliminado
  FROM (
  SELECT __p0,
         __p1,
         __p2,
         __p3,
         __p4,
         __p5,
         __p6,
         max(__p7) AS __agg0,
         max(__p8) AS __agg1,
         max(__p9) AS __agg2,
         max(__p10) AS __agg3,
         max(__p11) AS __agg4,
         sum(__p32) AS __agg5,
         sum(__p45) AS __agg6,
         sum(__p62) AS __agg7,
         sum(__p75) AS __agg8,
         sum(__p94) AS __agg9,
         sum(__p107) AS __agg10,
         sum(__p124) AS __agg11,
         sum(__p137) AS __agg12,
         max(__p138) AS __agg13,
         max(__p139) AS __agg14,
         max(__p140) AS __agg15
  FROM (
  SELECT *,
         (CASE WHEN 1000000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p25 < 0) != (1000000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p25) + abs(1000000000::HUGEINT)) // (2::HUGEINT * abs(1000000000::HUGEINT))) END) AS __p26,
         (CASE WHEN abs(__p26) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p26 END) AS __p27,
         (__p27 * __p30) AS __p31,
         (CASE WHEN abs(__p31) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p31 END) AS __p32,
         (CASE WHEN 1000000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p56 < 0) != (1000000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p56) + abs(1000000000::HUGEINT)) // (2::HUGEINT * abs(1000000000::HUGEINT))) END) AS __p57,
         (CASE WHEN abs(__p57) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p57 END) AS __p58,
         (__p58 * __p60) AS __p61,
         (CASE WHEN abs(__p61) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p61 END) AS __p62,
         (CASE WHEN 1000000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p88 < 0) != (1000000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p88) + abs(1000000000::HUGEINT)) // (2::HUGEINT * abs(1000000000::HUGEINT))) END) AS __p89,
         (CASE WHEN abs(__p89) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p89 END) AS __p90,
         (__p90 * __p92) AS __p93,
         (CASE WHEN abs(__p93) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p93 END) AS __p94,
         (CASE WHEN 1000000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p118 < 0) != (1000000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p118) + abs(1000000000::HUGEINT)) // (2::HUGEINT * abs(1000000000::HUGEINT))) END) AS __p119,
         (CASE WHEN abs(__p119) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p119 END) AS __p120,
         (__p120 * __p122) AS __p123,
         (CASE WHEN abs(__p123) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p123 END) AS __p124
  FROM (
  SELECT *,
         (CASE WHEN 10::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p22 < 0) != (10::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p22) + abs(10::HUGEINT)) // (2::HUGEINT * abs(10::HUGEINT))) END) AS __p23,
         (CASE WHEN abs(__p23) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p23 END) AS __p24,
         (__p14 * __p24) AS __p25,
         (CASE WHEN 10::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p53 < 0) != (10::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p53) + abs(10::HUGEINT)) // (2::HUGEINT * abs(10::HUGEINT))) END) AS __p54,
         (CASE WHEN abs(__p54) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p54 END) AS __p55,
         (__p47 * __p55) AS __p56,
         (CASE WHEN 10::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p85 < 0) != (10::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p85) + abs(10::HUGEINT)) // (2::HUGEINT * abs(10::HUGEINT))) END) AS __p86,
         (CASE WHEN abs(__p86) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p86 END) AS __p87,
         (__p77 * __p87) AS __p88,
         (CASE WHEN 10::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p115 < 0) != (10::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p115) + abs(10::HUGEINT)) // (2::HUGEINT * abs(10::HUGEINT))) END) AS __p116,
         (CASE WHEN abs(__p116) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p116 END) AS __p117,
         (__p109 * __p117) AS __p118
  FROM (
  SELECT *,
         (CASE WHEN __p18 = 0 THEN NULL ELSE (CASE WHEN (__p19 < 0) != (__p18 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p19) + abs(__p18)) // (2::HUGEINT * abs(__p18))) END) AS __p20,
         (CASE WHEN abs(__p20) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p20 END) AS __p21,
         ((__p15 * 10000000000::HUGEINT) + __p21) AS __p22,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p43 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p43) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p44,
         (CASE WHEN abs(__p44) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p44 END) AS __p45,
         (CASE WHEN __p49 = 0 THEN NULL ELSE (CASE WHEN (__p50 < 0) != (__p49 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p50) + abs(__p49)) // (2::HUGEINT * abs(__p49))) END) AS __p51,
         (CASE WHEN abs(__p51) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p51 END) AS __p52,
         ((__p15 * 10000000000::HUGEINT) + __p52) AS __p53,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p73 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p73) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p74,
         (CASE WHEN abs(__p74) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p74 END) AS __p75,
         (CASE WHEN __p81 = 0 THEN NULL ELSE (CASE WHEN (__p82 < 0) != (__p81 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p82) + abs(__p81)) // (2::HUGEINT * abs(__p81))) END) AS __p83,
         (CASE WHEN abs(__p83) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p83 END) AS __p84,
         ((__p78 * 10000000000::HUGEINT) + __p84) AS __p85,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p105 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p105) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p106,
         (CASE WHEN abs(__p106) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p106 END) AS __p107,
         (CASE WHEN __p111 = 0 THEN NULL ELSE (CASE WHEN (__p112 < 0) != (__p111 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p112) + abs(__p111)) // (2::HUGEINT * abs(__p111))) END) AS __p113,
         (CASE WHEN abs(__p113) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p113 END) AS __p114,
         ((__p78 * 10000000000::HUGEINT) + __p114) AS __p115,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p135 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p135) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p136,
         (CASE WHEN abs(__p136) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p136 END) AS __p137
  FROM (
  SELECT dpd.cod_compania AS __p0,
         dpd.cod_sucursal AS __p1,
         dpd.cod_almacen_emisor AS __p2,
         dpd.cod_documento_transaccion AS __p3,
         dpd.nro_comprobante AS __p4,
         dpd.cod_cliente AS __p5,
         dpd.cod_articulo AS __p6,
         dpd.id_pais AS __p7,
         dpd.id_periodo AS __p8,
         dpd.fecha_pedido AS __p9,
         ma.cant_unidad_paquete AS __p10,
         CAST(replace(CAST(ma.cant_unidad_volumen AS VARCHAR), '.', '') AS HUGEINT) AS __p11,
         mp.id_tipo_operacion AS __p12,
         (CAST(((CASE WHEN (NOT (upper(__p12) = 'PRO')) THEN 1 ELSE 0 END) * (CASE WHEN (upper(__p3) = 'NCC') THEN -1 ELSE 1 END)) AS HUGEINT)) AS __p13,
         (CASE WHEN abs(__p13) >= 10000000000::HUGEINT THEN NULL ELSE __p13 END) AS __p14,
         CAST(replace(CAST(dpd.cantidad_cajas AS VARCHAR), '.', '') AS HUGEINT) AS __p15,
         CAST(replace(CAST(dpd.cantidad_botellas AS VARCHAR), '.', '') AS HUGEINT) AS __p16,
         (CAST(__p10 AS HUGEINT)) AS __p17,
         (CASE WHEN abs(__p17) >= 10000000000::HUGEINT THEN NULL ELSE __p17 END) AS __p18,
         (__p16 * 10000000000::HUGEINT) AS __p19,
         ma.cant_paquete_caja AS __p28,
         (CAST(__p28 AS HUGEINT)) AS __p29,
         (CASE WHEN abs(__p29) >= 100000000000000000000::HUGEINT THEN NULL ELSE __p29 END) AS __p30,
         (CAST(((CASE WHEN (NOT (upper(__p12) = 'PRO')) THEN 1 ELSE 0 END) * (CASE WHEN (upper(__p3) = 'NCC') THEN -1 ELSE 1 END)) AS HUGEINT)) AS __p33,
         (CASE WHEN abs(__p33) >= 10000000000::HUGEINT THEN NULL ELSE __p33 END) AS __p34,
         (CAST(__p10 AS HUGEINT)) AS __p35,
         (CASE WHEN abs(__p35) >= 10000000000::HUGEINT THEN NULL ELSE __p35 END) AS __p36,
         (__p15 * __p36) AS __p37,
         (CASE WHEN abs(__p37) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p37 END) AS __p38,
         (__p38 + __p16) AS __p39,
         (CASE WHEN abs(__p39) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p39 END) AS __p40,
         (__p34 * __p40) AS __p41,
         (CASE WHEN abs(__p41) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p41 END) AS __p42,
         (__p42 * __p11) AS __p43,
         (CAST(((CASE WHEN (upper(__p12) = 'PRO') THEN 1 ELSE 0 END) * (CASE WHEN (upper(__p3) = 'NCC') THEN -1 ELSE 1 END)) AS HUGEINT)) AS __p46,
         (CASE WHEN abs(__p46) >= 10000000000::HUGEINT THEN NULL ELSE __p46 END) AS __p47,
         (CAST(__p10 AS HUGEINT)) AS __p48,
         (CASE WHEN abs(__p48) >= 10000000000::HUGEINT THEN NULL ELSE __p48 END) AS __p49,
         (__p16 * 10000000000::HUGEINT) AS __p50,
         (CAST(__p28 AS HUGEINT)) AS __p59,
         (CASE WHEN abs(__p59) >= 100000000000000000000::HUGEINT THEN NULL ELSE __p59 END) AS __p60,
         (CAST(((CASE WHEN (upper(__p12) = 'PRO') THEN 1 ELSE 0 END) * (CASE WHEN (upper(__p3) = 'NCC') THEN -1 ELSE 1 END)) AS HUGEINT)) AS __p63,
         (CASE WHEN abs(__p63) >= 10000000000::HUGEINT THEN NULL ELSE __p63 END) AS __p64,
         (CAST(__p10 AS HUGEINT)) AS __p65,
         (CASE WHEN abs(__p65) >= 10000000000::HUGEINT THEN NULL ELSE __p65 END) AS __p66,
         (__p15 * __p66) AS __p67,
         (CASE WHEN abs(__p67) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p67 END) AS __p68,
         (__p68 + __p16) AS __p69,
         (CASE WHEN abs(__p69) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p69 END) AS __p70,
         (__p64 * __p70) AS __p71,
         (CASE WHEN abs(__p71) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p71 END) AS __p72,
         (__p72 * __p11) AS __p73,
         (CAST(((CASE WHEN (NOT (upper(__p12) = 'PRO')) THEN 1 ELSE 0 END) * (CASE WHEN (upper(__p3) = 'NCC') THEN -1 ELSE 1 END)) AS HUGEINT)) AS __p76,
         (CASE WHEN abs(__p76) >= 10000000000::HUGEINT THEN NULL ELSE __p76 END) AS __p77,
         CAST(replace(CAST(dpd.cantidad_cajas_asignada AS VARCHAR), '.', '') AS HUGEINT) AS __p78,
         CAST(replace(CAST(dpd.cantidad_botellas_asignada AS VARCHAR), '.', '') AS HUGEINT) AS __p79,
         (CAST(__p10 AS HUGEINT)) AS __p80,
         (CASE WHEN abs(__p80) >= 10000000000::HUGEINT THEN NULL ELSE __p80 END) AS __p81,
         (__p79 * 10000000000::HUGEINT) AS __p82,
         (CAST(__p28 AS HUGEINT)) AS __p91,
         (CASE WHEN abs(__p91) >= 100000000000000000000::HUGEINT THEN NULL ELSE __p91 END) AS __p92,
         (CAST(((CASE WHEN (NOT (upper(__p12) = 'PRO')) THEN 1 ELSE 0 END) * (CASE WHEN (upper(__p3) = 'NCC') THEN -1 ELSE 1 END)) AS HUGEINT)) AS __p95,
         (CASE WHEN abs(__p95) >= 10000000000::HUGEINT THEN NULL ELSE __p95 END) AS __p96,
         (CAST(__p10 AS HUGEINT)) AS __p97,
         (CASE WHEN abs(__p97) >= 10000000000::HUGEINT THEN NULL ELSE __p97 END) AS __p98,
         (__p78 * __p98) AS __p99,
         (CASE WHEN abs(__p99) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p99 END) AS __p100,
         (__p100 + __p79) AS __p101,
         (CASE WHEN abs(__p101) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p101 END) AS __p102,
         (__p96 * __p102) AS __p103,
         (CASE WHEN abs(__p103) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p103 END) AS __p104,
         (__p104 * __p11) AS __p105,
         (CAST(((CASE WHEN (upper(__p12) = 'PRO') THEN 1 ELSE 0 END) * (CASE WHEN (upper(__p3) = 'NCC') THEN -1 ELSE 1 END)) AS HUGEINT)) AS __p108,
         (CASE WHEN abs(__p108) >= 10000000000::HUGEINT THEN NULL ELSE __p108 END) AS __p109,
         (CAST(__p10 AS HUGEINT)) AS __p110,
         (CASE WHEN abs(__p110) >= 10000000000::HUGEINT THEN NULL ELSE __p110 END) AS __p111,
         (__p79 * 10000000000::HUGEINT) AS __p112,
         (CAST(__p28 AS HUGEINT)) AS __p121,
         (CASE WHEN abs(__p121) >= 100000000000000000000::HUGEINT THEN NULL ELSE __p121 END) AS __p122,
         (CAST(((CASE WHEN (upper(__p12) = 'PRO') THEN 1 ELSE 0 END) * (CASE WHEN (upper(__p3) = 'NCC') THEN -1 ELSE 1 END)) AS HUGEINT)) AS __p125,
         (CASE WHEN abs(__p125) >= 10000000000::HUGEINT THEN NULL ELSE __p125 END) AS __p126,
         (CAST(__p10 AS HUGEINT)) AS __p127,
         (CASE WHEN abs(__p127) >= 10000000000::HUGEINT THEN NULL ELSE __p127 END) AS __p128,
         (__p78 * __p128) AS __p129,
         (CASE WHEN abs(__p129) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p129 END) AS __p130,
         (__p130 + __p79) AS __p131,
         (CASE WHEN abs(__p131) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p131 END) AS __p132,
         (__p126 * __p132) AS __p133,
         (CASE WHEN abs(__p133) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p133 END) AS __p134,
         (__p134 * __p11) AS __p135,
         dpd.fecha_creacion AS __p138,
         dpd.fecha_modificacion AS __p139,
         dpd.es_eliminado AS __p140
  FROM step_t_pedido_detalle_df_t_historico_pedido_detalle_union AS dpd
  JOIN stage_m_articulo AS ma ON ((dpd.cod_compania = ma.cod_compania) AND (dpd.cod_articulo = ma.cod_articulo))
  JOIN stage_m_procedimiento AS mp ON (((dpd.cod_compania = mp.cod_compania) AND (dpd.cod_documento_transaccion = mp.cod_documento_transaccion)) AND (dpd.cod_procedimiento = mp.cod_procedimiento))
  WHERE (upper(mp.id_tipo_operacion) IN ('VEN', 'PRO', 'EXP', 'OBS'))
  )
  )
  )
  )
  GROUP BY __p0, __p1, __p2, __p3, __p4, __p5, __p6
  )
  )
),
step_t_pedido_detalle_df_dom_t_pedido_detalle AS (
  SELECT CAST(dcja.id_pais AS VARCHAR) AS id_pais,
         strftime(dcja.fecha_pedido, '%Y%m') AS id_periodo,
         (trim(dcja.cod_compania) || '|' || trim(dcja.cod_sucursal) || '|' || trim(dcja.cod_documento_transaccion) || '|' || trim(dcja.nro_comprobante) || '|' || trim(dcja.cod_cliente)) AS id_pedido,
         (trim(dcja.cod_compania) || '|' || trim(dcja.cod_articulo)) AS id_articulo,
         CAST(dcja.cant_cajafisica_ped AS DECIMAL(38,12)) AS cant_cajafisica_ped,
         CAST(dcja.cant_cajavolumen_ped AS DECIMAL(38,12)) AS cant_cajavolumen_ped,
         CAST(dcja.cant_cajafisica_ped_pro AS DECIMAL(38,12)) AS cant_cajafisica_ped_pro,
         CAST(dcja.cant_cajavolumen_ped_pro AS DECIMAL(38,12)) AS cant_cajavolumen_ped_pro,
         CAST(dcja.cant_cajafisica_asignado_ped AS DECIMAL(38,12)) AS cant_cajafisica_asignado_ped,
         CAST(dcja.cant_cajavolumen_asignado_ped AS DECIMAL(38,12)) AS cant_cajavolumen_asignado_ped,
         CAST(dcja.cant_cajafisica_asignado_ped_pro AS DECIMAL(38,12)) AS cant_cajafisica_asignado_ped_pro,
         CAST(dcja.cant_cajavolumen_asignado_ped_pro AS DECIMAL(38,12)) AS cant_cajavolumen_asignado_ped_pro,
         CAST(try_strptime(CAST(dcja.fecha_creacion AS VARCHAR), '%Y-%m-%d %H:%M:%S') AS DATE) AS fecha_creacion,
         CAST(try_strptime(CAST(dcja.fecha_modificacion AS VARCHAR), '%Y-%m-%d %H:%M:%S') AS DATE) AS fecha_modificacion,
         CAST(dcja.es_eliminado AS INT) AS es_eliminado
  FROM step_t_pedido_detalle_df_t_historico_pedido_detalle_articulo AS dcja
),
job_t_pedido_detalle AS (
  SELECT * FROM step_t_pedido_detalle_df_dom_t_pedido_detalle
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
),
step_t_venta_detalle_df_t_historico_venta AS (
  SELECT *
  FROM stage_t_documento_venta
  WHERE (strftime(fecha_liquidacion, '%Y%m') IN ('199504', '199505', '199506'))
),
step_t_venta_detalle_df_t_historico_venta_detalle AS (
  SELECT *
  FROM stage_t_documento_venta_detalle
  WHERE (strftime(fecha_liquidacion, '%Y%m') IN ('199504', '199505', '199506'))
),
step_t_venta_detalle_df_m_compania AS (
  SELECT mp.id_pais AS id_pais,
         mc.cod_compania AS id_compania,
         mc.cod_compania AS cod_compania,
         mc.cod_pais AS cod_pais,
         mpar.cod_moneda_mn AS moneda_mn
  FROM stage_m_compania AS mc
  LEFT JOIN stage_m_parametro AS mpar ON (mpar.id_compania = mc.id_compania)
  JOIN stage_m_pais AS mp ON (mp.cod_pais = mc.cod_pais)
),
step_t_venta_detalle_df_m_articulo_filter AS (
  SELECT concat_ws('|', ma.cod_compania, ma.cod_articulo) AS id_producto,
         ma.cant_unidad_volumen AS cant_unidad_volumen,
         ma.cant_unidad_paquete AS cant_unidad_paquete,
         ma.cant_paquete_caja AS cant_paquete_caja
  FROM stage_m_articulo AS ma
  JOIN stage_m_linea AS ml ON ((ma.cod_compania = ml.cod_compania) AND (ma.cod_linea = ml.cod_linea))
  WHERE ((upper(ml.flg_linea) = 'TE') OR ((ma.cod_linea = '17') AND (ma.cod_familia IN ('001', '002', '003'))))
),
step_t_venta_detalle_df_m_operacion_filter AS (
  SELECT concat_ws('|', mo.cod_compania, mo.cod_documento_transaccion, mo.cod_procedimiento, mo.cod_operacion) AS id_operacion,
         upper(mo.cod_tipo_operacion) AS cod_tipo_operacion
  FROM stage_m_operacion AS mo
),
step_t_venta_detalle_df_t_historico_venta_filter AS (
  SELECT mc.id_pais AS id_pais,
         strftime(tp.fecha_liquidacion, '%Y%m') AS id_periodo,
         concat_ws('|', tp.cod_compania, tp.cod_sucursal, cod_almacen, tp.cod_documento_venta, nro_documento_venta) AS id_venta,
         tp.cod_compania AS cod_compania,
         tp.cod_documento_venta AS cod_documento_venta,
         tp.cod_procedimiento AS cod_procedimiento,
         coalesce(CASE WHEN (tp.cod_moneda = mc.moneda_mn) THEN 1 ELSE mtc.tc_venta END, tp.tipo_cambio_mn) AS tipo_cambio_mn,
         coalesce(CASE WHEN ((tp.cod_moneda = 'DOL') OR (tp.cod_moneda = 'USD')) THEN 1 ELSE mtc.tc_venta END, CASE WHEN (tp.tipo_cambio_me = 0) THEN 1 ELSE tp.tipo_cambio_me END) AS tipo_cambio_me
  FROM step_t_venta_detalle_df_t_historico_venta AS tp
  JOIN step_t_venta_detalle_df_m_compania AS mc ON (tp.cod_compania = mc.cod_compania)
  LEFT JOIN stage_m_tipo_cambio AS mtc ON (((mtc.fecha = tp.fecha_emision) AND (mtc.cod_compania = mc.cod_compania)) AND (mtc.cod_moneda = mc.moneda_mn))
  WHERE (((NOT (tp.cod_documento_venta IN ('CMD', 'RMD'))) AND (coalesce(tp.flg_facglob, 'F') = 'F')) AND (coalesce(tp.flg_refact, 'F') = 'F'))
),
step_t_venta_detalle_df_t_historico_venta_detalle_filter AS (
  SELECT concat_ws('|', cod_compania, cod_sucursal, cod_almacen, cod_documento_transaccion, nro_comprobante_venta) AS id_venta,
         concat_ws('|', cod_compania, cod_articulo) AS id_producto,
         concat_ws('|', cod_compania, cod_documento_transaccion, cod_procedimiento, cod_operacion) AS id_operacion,
         cod_compania AS cod_compania,
         cod_operacion AS cod_operacion,
         cant_paquete AS cant_paquete,
         cant_unidad AS cant_unidad,
         imp_valorizado AS imp_valorizado,
         imp_cobrar AS imp_cobrar,
         imp_descuento AS imp_descuento,
         imp_descuento_sinimp AS imp_descuento_sinimp,
         precio_paquete AS precio_paquete,
         imp_isc AS imp_isc,
         imp_igv AS imp_igv,
         imp_im3 AS imp_im3,
         imp_im4 AS imp_im4,
         imp_im5 AS imp_im5,
         imp_im6 AS imp_im6,
         fecha_creacion AS fecha_creacion,
         fecha_modificacion AS fecha_modificacion,
         0 AS es_eliminado
  FROM step_t_venta_detalle_df_t_historico_venta_detalle
),
step_t_venta_detalle_df_t_historico_venta_detalle_select AS (
  SELECT tv.id_pais AS id_pais,
         tv.id_periodo AS id_periodo,
         tv.id_venta AS id_venta,
         tvd.id_producto AS id_producto,
         CASE WHEN (tv.cod_documento_venta = 'NCC') THEN (- 1) ELSE 1 END AS factor,
         mo.cod_tipo_operacion AS cod_tipo_operacion,
         tv.tipo_cambio_mn AS tipo_cambio_mn,
         tv.tipo_cambio_me AS tipo_cambio_me,
         tvd.cant_paquete AS cant_paquete,
         tvd.cant_unidad AS cant_unidad,
         ma.cant_unidad_paquete AS cant_unidad_paquete,
         ma.cant_paquete_caja AS cant_paquete_caja,
         ma.cant_unidad_volumen AS cant_unidad_volumen,
         tvd.imp_valorizado AS imp_valorizado,
         tvd.imp_cobrar AS imp_cobrar,
         tvd.imp_descuento AS imp_descuento,
         tvd.imp_descuento_sinimp AS imp_descuento_sinimp,
         tvd.precio_paquete AS precio_paquete,
         0 AS imp_sugerido,
         0 AS imp_ventafull,
         tvd.imp_isc AS imp_isc,
         tvd.imp_igv AS imp_igv,
         tvd.imp_im3 AS imp_im3,
         tvd.imp_im4 AS imp_im4,
         tvd.imp_im5 AS imp_im5,
         tvd.imp_im6 AS imp_im6,
         tvd.fecha_creacion AS fecha_creacion,
         tvd.fecha_modificacion AS fecha_modificacion,
         tvd.es_eliminado AS es_eliminado
  FROM step_t_venta_detalle_df_t_historico_venta_detalle_filter AS tvd
  JOIN step_t_venta_detalle_df_t_historico_venta_filter AS tv ON (tv.id_venta = tvd.id_venta)
  JOIN step_t_venta_detalle_df_m_articulo_filter AS ma ON (tvd.id_producto = ma.id_producto)
  JOIN step_t_venta_detalle_df_m_operacion_filter AS mo ON (tvd.id_operacion = mo.id_operacion)
),
step_t_venta_detalle_df_dom_t_venta_detalle AS (
  SELECT CAST(id_pais AS VARCHAR) AS id_pais,
         CAST(id_periodo AS VARCHAR) AS id_periodo,
         CAST(id_venta AS VARCHAR) AS id_venta,
         CAST(id_producto AS VARCHAR) AS id_producto,
         CAST(cant_caja_fisica_ven AS DECIMAL(38,12)) AS cant_caja_fisica_ven,
         CAST(cant_caja_fisica_pro AS DECIMAL(38,12)) AS cant_caja_fisica_pro,
         CAST(cant_caja_volumen_ven AS DECIMAL(38,12)) AS cant_caja_volumen_ven,
         CAST(cant_caja_volumen_pro AS DECIMAL(38,12)) AS cant_caja_volumen_pro,
         CAST(imp_neto_vta_mn AS DECIMAL(38,12)) AS imp_neto_vta_mn,
         CAST(imp_neto_vta_me AS DECIMAL(38,12)) AS imp_neto_vta_me,
         CAST(imp_bruto_vta_mn AS DECIMAL(38,12)) AS imp_bruto_vta_mn,
         CAST(imp_bruto_vta_me AS DECIMAL(38,12)) AS imp_bruto_vta_me,
         CAST(imp_dscto_mn AS DECIMAL(38,12)) AS imp_dscto_mn,
         CAST(imp_dscto_me AS DECIMAL(38,12)) AS imp_dscto_me,
         CAST(imp_desnimp_mn AS DECIMAL(38,12)) AS imp_desnimp_mn,
         CAST(imp_desnimp_me AS DECIMAL(38,12)) AS imp_desnimp_me,
         CAST(imp_cobrar_vta_mn AS DECIMAL(38,12)) AS imp_cobrar_vta_mn,
         CAST(imp_cobrar_vta_me AS DECIMAL(38,12)) AS imp_cobrar_vta_me,
         CAST(imp_paquete_vta_mn AS DECIMAL(38,12)) AS imp_paquete_vta_mn,
         CAST(imp_paquete_vta_me AS DECIMAL(38,12)) AS imp_paquete_vta_me,
         CAST(imp_sugerido_mn AS DECIMAL(38,12)) AS imp_sugerido_mn,
         CAST(imp_sugerido_me AS DECIMAL(38,12)) AS imp_sugerido_me,
         CAST(imp_full_vta_mn AS DECIMAL(38,12)) AS imp_full_vta_mn,
         CAST(imp_full_vta_me AS DECIMAL(38,12)) AS imp_full_vta_me,
         CAST(imp_valorizado_pro_mn AS DECIMAL(38,12)) AS imp_valorizado_pro_mn,
         CAST(imp_valorizado_pro_me AS DECIMAL(38,12)) AS imp_valorizado_pro_me,
         CAST(imp_impuesto1_mn AS DECIMAL(38,12)) AS imp_impuesto1_mn,
         CAST(imp_impuesto1_me AS DECIMAL(38,12)) AS imp_impuesto1_me,
         CAST(imp_impuesto2_mn AS DECIMAL(38,12)) AS imp_impuesto2_mn,
         CAST(imp_impuesto2_me AS DECIMAL(38,12)) AS imp_impuesto2_me,
         CAST(imp_impuesto3_mn AS DECIMAL(38,12)) AS imp_impuesto3_mn,
         CAST(imp_impuesto3_me AS DECIMAL(38,12)) AS imp_impuesto3_me,
         CAST(imp_impuesto4_mn AS DECIMAL(38,12)) AS imp_impuesto4_mn,
         CAST(imp_impuesto4_me AS DECIMAL(38,12)) AS imp_impuesto4_me,
         CAST(imp_impuesto5_mn AS DECIMAL(38,12)) AS imp_impuesto5_mn,
         CAST(imp_impuesto5_me AS DECIMAL(38,12)) AS imp_impuesto5_me,
         CAST(imp_impuesto6_mn AS DECIMAL(38,12)) AS imp_impuesto6_mn,
         CAST(imp_impuesto6_me AS DECIMAL(38,12)) AS imp_impuesto6_me,
         CAST(fecha_creacion AS TIMESTAMP) AS fecha_creacion,
         CAST(fecha_modificacion AS TIMESTAMP) AS fecha_modificacion,
         CAST(es_eliminado AS INT) AS es_eliminado
  FROM (
  SELECT __p0 AS id_venta,
         __p1 AS id_producto,
         __agg0 AS id_pais,
         __agg1 AS id_periodo,
         CAST((CASE WHEN (CASE WHEN abs(__agg2) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg2 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg2) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg2 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg2) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg2 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_caja_fisica_ven,
         CAST((CASE WHEN (CASE WHEN abs(__agg3) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg3 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg3) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg3 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg3) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg3 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_caja_fisica_pro,
         CAST((CASE WHEN (CASE WHEN abs(__agg4) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg4 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg4) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg4 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg4) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg4 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_caja_volumen_ven,
         CAST((CASE WHEN (CASE WHEN abs(__agg5) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg5 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg5) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg5 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg5) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg5 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS cant_caja_volumen_pro,
         CAST((CASE WHEN (CASE WHEN abs(__agg6) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg6 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg6) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg6 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg6) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg6 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS imp_neto_vta_mn,
         CAST((CASE WHEN (CASE WHEN abs(__agg7) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg7 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg7) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg7 END)) // 1000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg7) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg7 END)) % 1000000000::HUGEINT AS VARCHAR), 9, '0')) AS DECIMAL(38,9)) AS imp_neto_vta_me,
         CAST((CASE WHEN (CASE WHEN abs(__agg8) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg8 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg8) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg8 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg8) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg8 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS imp_bruto_vta_mn,
         CAST((CASE WHEN (CASE WHEN abs(__agg9) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg9 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg9) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg9 END)) // 1000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg9) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg9 END)) % 1000000000::HUGEINT AS VARCHAR), 9, '0')) AS DECIMAL(38,9)) AS imp_bruto_vta_me,
         CAST((CASE WHEN (CASE WHEN abs(__agg10) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg10 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg10) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg10 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg10) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg10 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS imp_dscto_mn,
         CAST((CASE WHEN (CASE WHEN abs(__agg11) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg11 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg11) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg11 END)) // 1000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg11) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg11 END)) % 1000000000::HUGEINT AS VARCHAR), 9, '0')) AS DECIMAL(38,9)) AS imp_dscto_me,
         CAST((CASE WHEN (CASE WHEN abs(__agg12) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg12 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg12) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg12 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg12) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg12 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS imp_desnimp_mn,
         CAST((CASE WHEN (CASE WHEN abs(__agg13) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg13 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg13) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg13 END)) // 1000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg13) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg13 END)) % 1000000000::HUGEINT AS VARCHAR), 9, '0')) AS DECIMAL(38,9)) AS imp_desnimp_me,
         CAST((CASE WHEN (CASE WHEN abs(__agg14) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg14 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg14) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg14 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg14) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg14 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS imp_cobrar_vta_mn,
         CAST((CASE WHEN (CASE WHEN abs(__agg15) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg15 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg15) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg15 END)) // 1000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg15) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg15 END)) % 1000000000::HUGEINT AS VARCHAR), 9, '0')) AS DECIMAL(38,9)) AS imp_cobrar_vta_me,
         CAST((CASE WHEN (CASE WHEN abs(__agg16) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg16 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg16) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg16 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg16) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg16 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS imp_paquete_vta_mn,
         CAST((CASE WHEN (CASE WHEN abs(__agg17) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg17 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg17) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg17 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg17) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg17 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS imp_paquete_vta_me,
         CAST((CASE WHEN (CASE WHEN abs(__agg18) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg18 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg18) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg18 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg18) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg18 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS imp_sugerido_mn,
         CAST((CASE WHEN (CASE WHEN abs(__agg19) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg19 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg19) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg19 END)) // 100000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg19) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg19 END)) % 100000000000::HUGEINT AS VARCHAR), 11, '0')) AS DECIMAL(38,11)) AS imp_sugerido_me,
         CAST((CASE WHEN (CASE WHEN abs(__agg20) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg20 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg20) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg20 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg20) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg20 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS imp_full_vta_mn,
         CAST((CASE WHEN (CASE WHEN abs(__agg21) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg21 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg21) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg21 END)) // 100000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg21) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg21 END)) % 100000000000::HUGEINT AS VARCHAR), 11, '0')) AS DECIMAL(38,11)) AS imp_full_vta_me,
         CAST((CASE WHEN (CASE WHEN abs(__agg22) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg22 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg22) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg22 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg22) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg22 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS imp_valorizado_pro_mn,
         CAST((CASE WHEN (CASE WHEN abs(__agg23) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg23 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg23) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg23 END)) // 1000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg23) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg23 END)) % 1000000000::HUGEINT AS VARCHAR), 9, '0')) AS DECIMAL(38,9)) AS imp_valorizado_pro_me,
         CAST((CASE WHEN (CASE WHEN abs(__agg24) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg24 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg24) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg24 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg24) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg24 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS imp_impuesto1_mn,
         CAST((CASE WHEN (CASE WHEN abs(__agg25) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg25 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg25) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg25 END)) // 1000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg25) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg25 END)) % 1000000000::HUGEINT AS VARCHAR), 9, '0')) AS DECIMAL(38,9)) AS imp_impuesto1_me,
         CAST((CASE WHEN (CASE WHEN abs(__agg26) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg26 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg26) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg26 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg26) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg26 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS imp_impuesto2_mn,
         CAST((CASE WHEN (CASE WHEN abs(__agg27) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg27 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg27) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg27 END)) // 1000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg27) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg27 END)) % 1000000000::HUGEINT AS VARCHAR), 9, '0')) AS DECIMAL(38,9)) AS imp_impuesto2_me,
         CAST((CASE WHEN (CASE WHEN abs(__agg28) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg28 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg28) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg28 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg28) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg28 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS imp_impuesto3_mn,
         CAST((CASE WHEN (CASE WHEN abs(__agg29) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg29 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg29) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg29 END)) // 1000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg29) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg29 END)) % 1000000000::HUGEINT AS VARCHAR), 9, '0')) AS DECIMAL(38,9)) AS imp_impuesto3_me,
         CAST((CASE WHEN (CASE WHEN abs(__agg30) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg30 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg30) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg30 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg30) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg30 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS imp_impuesto4_mn,
         CAST((CASE WHEN (CASE WHEN abs(__agg31) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg31 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg31) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg31 END)) // 1000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg31) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg31 END)) % 1000000000::HUGEINT AS VARCHAR), 9, '0')) AS DECIMAL(38,9)) AS imp_impuesto4_me,
         CAST((CASE WHEN (CASE WHEN abs(__agg32) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg32 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg32) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg32 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg32) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg32 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS imp_impuesto5_mn,
         CAST((CASE WHEN (CASE WHEN abs(__agg33) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg33 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg33) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg33 END)) // 1000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg33) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg33 END)) % 1000000000::HUGEINT AS VARCHAR), 9, '0')) AS DECIMAL(38,9)) AS imp_impuesto5_me,
         CAST((CASE WHEN (CASE WHEN abs(__agg34) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg34 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg34) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg34 END)) // 1000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg34) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg34 END)) % 1000000::HUGEINT AS VARCHAR), 6, '0')) AS DECIMAL(38,6)) AS imp_impuesto6_mn,
         CAST((CASE WHEN (CASE WHEN abs(__agg35) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg35 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg35) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg35 END)) // 1000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg35) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg35 END)) % 1000000000::HUGEINT AS VARCHAR), 9, '0')) AS DECIMAL(38,9)) AS imp_impuesto6_me,
         __agg36 AS fecha_creacion,
         __agg37 AS fecha_modificacion,
         __agg38 AS es_eliminado
  FROM (
  SELECT __p0,
         __p1,
         max(__p2) AS __agg0,
         max(__p3) AS __agg1,
         sum(__p26) AS __agg2,
         sum(__p43) AS __agg3,
         sum(__p57) AS __agg4,
         sum(__p70) AS __agg5,
         sum(__p79) AS __agg6,
         sum(__p88) AS __agg7,
         sum(__p96) AS __agg8,
         sum(__p104) AS __agg9,
         sum(__p112) AS __agg10,
         sum(__p120) AS __agg11,
         sum(__p128) AS __agg12,
         sum(__p136) AS __agg13,
         sum(__p143) AS __agg14,
         sum(__p151) AS __agg15,
         sum(__p174) AS __agg16,
         sum(__p196) AS __agg17,
         sum(__p205) AS __agg18,
         sum(__p215) AS __agg19,
         sum(__p224) AS __agg20,
         sum(__p234) AS __agg21,
         sum(__p241) AS __agg22,
         sum(__p249) AS __agg23,
         sum(__p257) AS __agg24,
         sum(__p265) AS __agg25,
         sum(__p273) AS __agg26,
         sum(__p281) AS __agg27,
         sum(__p289) AS __agg28,
         sum(__p297) AS __agg29,
         sum(__p305) AS __agg30,
         sum(__p313) AS __agg31,
         sum(__p321) AS __agg32,
         sum(__p329) AS __agg33,
         sum(__p337) AS __agg34,
         sum(__p345) AS __agg35,
         max(__p346) AS __agg36,
         max(__p347) AS __agg37,
         max(__p348) AS __agg38
  FROM (
  SELECT *,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p168 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p168) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p169,
         (CASE WHEN abs(__p169) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p169 END) AS __p170,
         (__p8 + __p170) AS __p171,
         (CASE WHEN abs(__p171) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p171 END) AS __p172,
         (__p153 * __p172) AS __p173,
         (CASE WHEN abs(__p173) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p173 END) AS __p174,
         (CASE WHEN __p82 = 0 THEN NULL ELSE (CASE WHEN (__p190 < 0) != (__p82 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p190) + abs(__p82)) // (2::HUGEINT * abs(__p82))) END) AS __p191,
         (CASE WHEN abs(__p191) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p191 END) AS __p192,
         (__p8 + __p192) AS __p193,
         (CASE WHEN abs(__p193) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p193 END) AS __p194,
         (__p176 * __p194) AS __p195,
         (CASE WHEN abs(__p195) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p195 END) AS __p196
  FROM (
  SELECT *,
         (CASE WHEN 100000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p24 < 0) != (100000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p24) + abs(100000000::HUGEINT)) // (2::HUGEINT * abs(100000000::HUGEINT))) END) AS __p25,
         (CASE WHEN abs(__p25) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p25 END) AS __p26,
         (CASE WHEN 100000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p41 < 0) != (100000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p41) + abs(100000000::HUGEINT)) // (2::HUGEINT * abs(100000000::HUGEINT))) END) AS __p42,
         (CASE WHEN abs(__p42) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p42 END) AS __p43,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p165 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p165) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p166,
         (CASE WHEN abs(__p166) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p166 END) AS __p167,
         (__p167 * __p74) AS __p168,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p187 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p187) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p188,
         (CASE WHEN abs(__p188) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p188 END) AS __p189,
         (__p189 * 1000000::HUGEINT) AS __p190
  FROM (
  SELECT *,
         (CASE WHEN 1000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p18 < 0) != (1000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p18) + abs(1000::HUGEINT)) // (2::HUGEINT * abs(1000::HUGEINT))) END) AS __p19,
         (CASE WHEN abs(__p19) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p19 END) AS __p20,
         (__p20 * __p23) AS __p24,
         (CASE WHEN 1000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p36 < 0) != (1000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p36) + abs(1000::HUGEINT)) // (2::HUGEINT * abs(1000::HUGEINT))) END) AS __p37,
         (CASE WHEN abs(__p37) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p37 END) AS __p38,
         (__p38 * __p40) AS __p41,
         (CASE WHEN 100000000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p86 < 0) != (100000000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p86) + abs(100000000000::HUGEINT)) // (2::HUGEINT * abs(100000000000::HUGEINT))) END) AS __p87,
         (CASE WHEN abs(__p87) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p87 END) AS __p88,
         (CASE WHEN 100000000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p102 < 0) != (100000000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p102) + abs(100000000000::HUGEINT)) // (2::HUGEINT * abs(100000000000::HUGEINT))) END) AS __p103,
         (CASE WHEN abs(__p103) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p103 END) AS __p104,
         (CASE WHEN 100000000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p118 < 0) != (100000000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p118) + abs(100000000000::HUGEINT)) // (2::HUGEINT * abs(100000000000::HUGEINT))) END) AS __p119,
         (CASE WHEN abs(__p119) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p119 END) AS __p120,
         (CASE WHEN 100000000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p134 < 0) != (100000000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p134) + abs(100000000000::HUGEINT)) // (2::HUGEINT * abs(100000000000::HUGEINT))) END) AS __p135,
         (CASE WHEN abs(__p135) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p135 END) AS __p136,
         (CASE WHEN 100000000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p149 < 0) != (100000000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p149) + abs(100000000000::HUGEINT)) // (2::HUGEINT * abs(100000000000::HUGEINT))) END) AS __p150,
         (CASE WHEN abs(__p150) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p150 END) AS __p151,
         (CASE WHEN 100000000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p161 < 0) != (100000000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p161) + abs(100000000000::HUGEINT)) // (2::HUGEINT * abs(100000000000::HUGEINT))) END) AS __p162,
         (CASE WHEN abs(__p162) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p162 END) AS __p163,
         (__p163 * __p164) AS __p165,
         (CASE WHEN 100000000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p184 < 0) != (100000000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p184) + abs(100000000000::HUGEINT)) // (2::HUGEINT * abs(100000000000::HUGEINT))) END) AS __p185,
         (CASE WHEN abs(__p185) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p185 END) AS __p186,
         (__p186 * __p164) AS __p187,
         (CASE WHEN 100000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p213 < 0) != (100000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p213) + abs(100000000::HUGEINT)) // (2::HUGEINT * abs(100000000::HUGEINT))) END) AS __p214,
         (CASE WHEN abs(__p214) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p214 END) AS __p215,
         (CASE WHEN 100000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p232 < 0) != (100000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p232) + abs(100000000::HUGEINT)) // (2::HUGEINT * abs(100000000::HUGEINT))) END) AS __p233,
         (CASE WHEN abs(__p233) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p233 END) AS __p234,
         (CASE WHEN 100000000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p247 < 0) != (100000000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p247) + abs(100000000000::HUGEINT)) // (2::HUGEINT * abs(100000000000::HUGEINT))) END) AS __p248,
         (CASE WHEN abs(__p248) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p248 END) AS __p249,
         (CASE WHEN 100000000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p263 < 0) != (100000000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p263) + abs(100000000000::HUGEINT)) // (2::HUGEINT * abs(100000000000::HUGEINT))) END) AS __p264,
         (CASE WHEN abs(__p264) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p264 END) AS __p265,
         (CASE WHEN 100000000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p279 < 0) != (100000000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p279) + abs(100000000000::HUGEINT)) // (2::HUGEINT * abs(100000000000::HUGEINT))) END) AS __p280,
         (CASE WHEN abs(__p280) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p280 END) AS __p281,
         (CASE WHEN 100000000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p295 < 0) != (100000000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p295) + abs(100000000000::HUGEINT)) // (2::HUGEINT * abs(100000000000::HUGEINT))) END) AS __p296,
         (CASE WHEN abs(__p296) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p296 END) AS __p297,
         (CASE WHEN 100000000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p311 < 0) != (100000000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p311) + abs(100000000000::HUGEINT)) // (2::HUGEINT * abs(100000000000::HUGEINT))) END) AS __p312,
         (CASE WHEN abs(__p312) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p312 END) AS __p313,
         (CASE WHEN 100000000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p327 < 0) != (100000000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p327) + abs(100000000000::HUGEINT)) // (2::HUGEINT * abs(100000000000::HUGEINT))) END) AS __p328,
         (CASE WHEN abs(__p328) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p328 END) AS __p329,
         (CASE WHEN 100000000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p343 < 0) != (100000000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p343) + abs(100000000000::HUGEINT)) // (2::HUGEINT * abs(100000000000::HUGEINT))) END) AS __p344,
         (CASE WHEN abs(__p344) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p344 END) AS __p345
  FROM (
  SELECT *,
         (CASE WHEN __p12 = 0 THEN NULL ELSE (CASE WHEN (__p13 < 0) != (__p12 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p13) + abs(__p12)) // (2::HUGEINT * abs(__p12))) END) AS __p14,
         (CASE WHEN abs(__p14) >= 100000000000000000000000000000::HUGEINT THEN NULL ELSE __p14 END) AS __p15,
         ((__p8 * 100000000000::HUGEINT) + __p15) AS __p16,
         (CASE WHEN abs(__p16) >= 1000000000000000000000000000000::HUGEINT THEN NULL ELSE __p16 END) AS __p17,
         (__p7 * __p17) AS __p18,
         (CASE WHEN __p30 = 0 THEN NULL ELSE (CASE WHEN (__p31 < 0) != (__p30 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p31) + abs(__p30)) // (2::HUGEINT * abs(__p30))) END) AS __p32,
         (CASE WHEN abs(__p32) >= 100000000000000000000000000000::HUGEINT THEN NULL ELSE __p32 END) AS __p33,
         ((__p8 * 100000000000::HUGEINT) + __p33) AS __p34,
         (CASE WHEN abs(__p34) >= 1000000000000000000000000000000::HUGEINT THEN NULL ELSE __p34 END) AS __p35,
         (__p28 * __p35) AS __p36,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p55 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p55) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p56,
         (CASE WHEN abs(__p56) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p56 END) AS __p57,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p68 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p68) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p69,
         (CASE WHEN abs(__p69) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p69 END) AS __p70,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p77 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p77) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p78,
         (CASE WHEN abs(__p78) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p78 END) AS __p79,
         (CASE WHEN __p82 = 0 THEN NULL ELSE (CASE WHEN (__p83 < 0) != (__p82 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p83) + abs(__p82)) // (2::HUGEINT * abs(__p82))) END) AS __p84,
         (CASE WHEN abs(__p84) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p84 END) AS __p85,
         (__p81 * __p85) AS __p86,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p94 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p94) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p95,
         (CASE WHEN abs(__p95) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p95 END) AS __p96,
         (CASE WHEN __p82 = 0 THEN NULL ELSE (CASE WHEN (__p99 < 0) != (__p82 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p99) + abs(__p82)) // (2::HUGEINT * abs(__p82))) END) AS __p100,
         (CASE WHEN abs(__p100) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p100 END) AS __p101,
         (__p98 * __p101) AS __p102,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p110 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p110) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p111,
         (CASE WHEN abs(__p111) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p111 END) AS __p112,
         (CASE WHEN __p82 = 0 THEN NULL ELSE (CASE WHEN (__p115 < 0) != (__p82 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p115) + abs(__p82)) // (2::HUGEINT * abs(__p82))) END) AS __p116,
         (CASE WHEN abs(__p116) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p116 END) AS __p117,
         (__p114 * __p117) AS __p118,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p126 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p126) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p127,
         (CASE WHEN abs(__p127) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p127 END) AS __p128,
         (CASE WHEN __p82 = 0 THEN NULL ELSE (CASE WHEN (__p131 < 0) != (__p82 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p131) + abs(__p82)) // (2::HUGEINT * abs(__p82))) END) AS __p132,
         (CASE WHEN abs(__p132) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p132 END) AS __p133,
         (__p130 * __p133) AS __p134,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p141 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p141) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p142,
         (CASE WHEN abs(__p142) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p142 END) AS __p143,
         (CASE WHEN __p82 = 0 THEN NULL ELSE (CASE WHEN (__p146 < 0) != (__p82 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p146) + abs(__p82)) // (2::HUGEINT * abs(__p82))) END) AS __p147,
         (CASE WHEN abs(__p147) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p147 END) AS __p148,
         (__p145 * __p148) AS __p149,
         (CASE WHEN __p155 = 0 THEN NULL ELSE (CASE WHEN (__p156 < 0) != (__p155 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p156) + abs(__p155)) // (2::HUGEINT * abs(__p155))) END) AS __p157,
         (CASE WHEN abs(__p157) >= 100000000000000000000000000000::HUGEINT THEN NULL ELSE __p157 END) AS __p158,
         (__p158 * __p160) AS __p161,
         (CASE WHEN __p178 = 0 THEN NULL ELSE (CASE WHEN (__p179 < 0) != (__p178 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p179) + abs(__p178)) // (2::HUGEINT * abs(__p178))) END) AS __p180,
         (CASE WHEN abs(__p180) >= 100000000000000000000000000000::HUGEINT THEN NULL ELSE __p180 END) AS __p181,
         (__p181 * __p183) AS __p184,
         (CASE WHEN __p82 = 0 THEN NULL ELSE (CASE WHEN (__p210 < 0) != (__p82 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p210) + abs(__p82)) // (2::HUGEINT * abs(__p82))) END) AS __p211,
         (CASE WHEN abs(__p211) >= 100000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p211 END) AS __p212,
         (__p207 * __p212) AS __p213,
         (CASE WHEN __p82 = 0 THEN NULL ELSE (CASE WHEN (__p229 < 0) != (__p82 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p229) + abs(__p82)) // (2::HUGEINT * abs(__p82))) END) AS __p230,
         (CASE WHEN abs(__p230) >= 100000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p230 END) AS __p231,
         (__p226 * __p231) AS __p232,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p239 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p239) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p240,
         (CASE WHEN abs(__p240) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p240 END) AS __p241,
         (CASE WHEN __p82 = 0 THEN NULL ELSE (CASE WHEN (__p244 < 0) != (__p82 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p244) + abs(__p82)) // (2::HUGEINT * abs(__p82))) END) AS __p245,
         (CASE WHEN abs(__p245) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p245 END) AS __p246,
         (__p243 * __p246) AS __p247,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p255 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p255) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p256,
         (CASE WHEN abs(__p256) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p256 END) AS __p257,
         (CASE WHEN __p82 = 0 THEN NULL ELSE (CASE WHEN (__p260 < 0) != (__p82 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p260) + abs(__p82)) // (2::HUGEINT * abs(__p82))) END) AS __p261,
         (CASE WHEN abs(__p261) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p261 END) AS __p262,
         (__p259 * __p262) AS __p263,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p271 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p271) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p272,
         (CASE WHEN abs(__p272) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p272 END) AS __p273,
         (CASE WHEN __p82 = 0 THEN NULL ELSE (CASE WHEN (__p276 < 0) != (__p82 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p276) + abs(__p82)) // (2::HUGEINT * abs(__p82))) END) AS __p277,
         (CASE WHEN abs(__p277) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p277 END) AS __p278,
         (__p275 * __p278) AS __p279,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p287 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p287) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p288,
         (CASE WHEN abs(__p288) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p288 END) AS __p289,
         (CASE WHEN __p82 = 0 THEN NULL ELSE (CASE WHEN (__p292 < 0) != (__p82 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p292) + abs(__p82)) // (2::HUGEINT * abs(__p82))) END) AS __p293,
         (CASE WHEN abs(__p293) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p293 END) AS __p294,
         (__p291 * __p294) AS __p295,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p303 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p303) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p304,
         (CASE WHEN abs(__p304) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p304 END) AS __p305,
         (CASE WHEN __p82 = 0 THEN NULL ELSE (CASE WHEN (__p308 < 0) != (__p82 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p308) + abs(__p82)) // (2::HUGEINT * abs(__p82))) END) AS __p309,
         (CASE WHEN abs(__p309) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p309 END) AS __p310,
         (__p307 * __p310) AS __p311,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p319 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p319) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p320,
         (CASE WHEN abs(__p320) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p320 END) AS __p321,
         (CASE WHEN __p82 = 0 THEN NULL ELSE (CASE WHEN (__p324 < 0) != (__p82 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p324) + abs(__p82)) // (2::HUGEINT * abs(__p82))) END) AS __p325,
         (CASE WHEN abs(__p325) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p325 END) AS __p326,
         (__p323 * __p326) AS __p327,
         (CASE WHEN 1000000::HUGEINT = 0 THEN NULL ELSE (CASE WHEN (__p335 < 0) != (1000000::HUGEINT < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p335) + abs(1000000::HUGEINT)) // (2::HUGEINT * abs(1000000::HUGEINT))) END) AS __p336,
         (CASE WHEN abs(__p336) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p336 END) AS __p337,
         (CASE WHEN __p82 = 0 THEN NULL ELSE (CASE WHEN (__p340 < 0) != (__p82 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p340) + abs(__p82)) // (2::HUGEINT * abs(__p82))) END) AS __p341,
         (CASE WHEN abs(__p341) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p341 END) AS __p342,
         (__p339 * __p342) AS __p343
  FROM (
  SELECT id_venta AS __p0,
         id_producto AS __p1,
         id_pais AS __p2,
         id_periodo AS __p3,
         cod_tipo_operacion AS __p4,
         factor AS __p5,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p6,
         (CASE WHEN abs(__p6) >= 10000000000::HUGEINT THEN NULL ELSE __p6 END) AS __p7,
         CAST(replace(CAST(cant_paquete AS VARCHAR), '.', '') AS HUGEINT) AS __p8,
         CAST(replace(CAST(cant_unidad AS VARCHAR), '.', '') AS HUGEINT) AS __p9,
         cant_unidad_paquete AS __p10,
         (CAST(__p10 AS HUGEINT)) AS __p11,
         (CASE WHEN abs(__p11) >= 10000000000::HUGEINT THEN NULL ELSE __p11 END) AS __p12,
         (__p9 * 100000000000::HUGEINT) AS __p13,
         cant_paquete_caja AS __p21,
         (CAST(__p21 AS HUGEINT)) AS __p22,
         (CASE WHEN abs(__p22) >= 100000000000000000000::HUGEINT THEN NULL ELSE __p22 END) AS __p23,
         (CAST(((CASE WHEN (upper(__p4) = 'PRO') THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p27,
         (CASE WHEN abs(__p27) >= 10000000000::HUGEINT THEN NULL ELSE __p27 END) AS __p28,
         (CAST(__p10 AS HUGEINT)) AS __p29,
         (CASE WHEN abs(__p29) >= 10000000000::HUGEINT THEN NULL ELSE __p29 END) AS __p30,
         (__p9 * 100000000000::HUGEINT) AS __p31,
         (CAST(__p21 AS HUGEINT)) AS __p39,
         (CASE WHEN abs(__p39) >= 100000000000000000000::HUGEINT THEN NULL ELSE __p39 END) AS __p40,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p44,
         (CASE WHEN abs(__p44) >= 10000000000::HUGEINT THEN NULL ELSE __p44 END) AS __p45,
         (CAST(__p10 AS HUGEINT)) AS __p46,
         (CASE WHEN abs(__p46) >= 10000000000::HUGEINT THEN NULL ELSE __p46 END) AS __p47,
         (__p8 * __p47) AS __p48,
         (CASE WHEN abs(__p48) >= 100000000000000000000000000000::HUGEINT THEN NULL ELSE __p48 END) AS __p49,
         (__p49 + __p9) AS __p50,
         (CASE WHEN abs(__p50) >= 1000000000000000000000000000000::HUGEINT THEN NULL ELSE __p50 END) AS __p51,
         (__p45 * __p51) AS __p52,
         (CASE WHEN abs(__p52) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p52 END) AS __p53,
         CAST(replace(CAST(cant_unidad_volumen AS VARCHAR), '.', '') AS HUGEINT) AS __p54,
         (__p53 * __p54) AS __p55,
         (CAST(((CASE WHEN (upper(__p4) = 'PRO') THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p58,
         (CASE WHEN abs(__p58) >= 10000000000::HUGEINT THEN NULL ELSE __p58 END) AS __p59,
         (CAST(__p10 AS HUGEINT)) AS __p60,
         (CASE WHEN abs(__p60) >= 10000000000::HUGEINT THEN NULL ELSE __p60 END) AS __p61,
         (__p8 * __p61) AS __p62,
         (CASE WHEN abs(__p62) >= 100000000000000000000000000000::HUGEINT THEN NULL ELSE __p62 END) AS __p63,
         (__p63 + __p9) AS __p64,
         (CASE WHEN abs(__p64) >= 1000000000000000000000000000000::HUGEINT THEN NULL ELSE __p64 END) AS __p65,
         (__p59 * __p65) AS __p66,
         (CASE WHEN abs(__p66) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p66 END) AS __p67,
         (__p67 * __p54) AS __p68,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p71,
         (CASE WHEN abs(__p71) >= 10000000000::HUGEINT THEN NULL ELSE __p71 END) AS __p72,
         CAST(replace(CAST(imp_valorizado AS VARCHAR), '.', '') AS HUGEINT) AS __p73,
         CAST(replace(CAST(tipo_cambio_mn AS VARCHAR), '.', '') AS HUGEINT) AS __p74,
         (__p73 * __p74) AS __p75,
         (CASE WHEN abs(__p75) >= 10000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p75 END) AS __p76,
         (__p72 * __p76) AS __p77,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p80,
         (CASE WHEN abs(__p80) >= 10000000000::HUGEINT THEN NULL ELSE __p80 END) AS __p81,
         CAST(replace(CAST(tipo_cambio_me AS VARCHAR), '.', '') AS HUGEINT) AS __p82,
         (__p73 * 100000000000000000000::HUGEINT) AS __p83,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p89,
         (CASE WHEN abs(__p89) >= 10000000000::HUGEINT THEN NULL ELSE __p89 END) AS __p90,
         CAST(replace(CAST(imp_cobrar AS VARCHAR), '.', '') AS HUGEINT) AS __p91,
         (__p91 * __p74) AS __p92,
         (CASE WHEN abs(__p92) >= 10000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p92 END) AS __p93,
         (__p90 * __p93) AS __p94,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p97,
         (CASE WHEN abs(__p97) >= 10000000000::HUGEINT THEN NULL ELSE __p97 END) AS __p98,
         (__p91 * 100000000000000000000::HUGEINT) AS __p99,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p105,
         (CASE WHEN abs(__p105) >= 10000000000::HUGEINT THEN NULL ELSE __p105 END) AS __p106,
         CAST(replace(CAST(imp_descuento AS VARCHAR), '.', '') AS HUGEINT) AS __p107,
         (__p107 * __p74) AS __p108,
         (CASE WHEN abs(__p108) >= 10000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p108 END) AS __p109,
         (__p106 * __p109) AS __p110,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p113,
         (CASE WHEN abs(__p113) >= 10000000000::HUGEINT THEN NULL ELSE __p113 END) AS __p114,
         (__p107 * 100000000000000000000::HUGEINT) AS __p115,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p121,
         (CASE WHEN abs(__p121) >= 10000000000::HUGEINT THEN NULL ELSE __p121 END) AS __p122,
         CAST(replace(CAST(imp_descuento_sinimp AS VARCHAR), '.', '') AS HUGEINT) AS __p123,
         (__p123 * __p74) AS __p124,
         (CASE WHEN abs(__p124) >= 10000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p124 END) AS __p125,
         (__p122 * __p125) AS __p126,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p129,
         (CASE WHEN abs(__p129) >= 10000000000::HUGEINT THEN NULL ELSE __p129 END) AS __p130,
         (__p123 * 100000000000000000000::HUGEINT) AS __p131,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p137,
         (CASE WHEN abs(__p137) >= 10000000000::HUGEINT THEN NULL ELSE __p137 END) AS __p138,
         (__p91 * __p74) AS __p139,
         (CASE WHEN abs(__p139) >= 10000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p139 END) AS __p140,
         (__p138 * __p140) AS __p141,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p144,
         (CASE WHEN abs(__p144) >= 10000000000::HUGEINT THEN NULL ELSE __p144 END) AS __p145,
         (__p91 * 100000000000000000000::HUGEINT) AS __p146,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p152,
         (CASE WHEN abs(__p152) >= 10000000000::HUGEINT THEN NULL ELSE __p152 END) AS __p153,
         (CAST(__p10 AS HUGEINT)) AS __p154,
         (CASE WHEN abs(__p154) >= 10000000000::HUGEINT THEN NULL ELSE __p154 END) AS __p155,
         (__p9 * 100000000000::HUGEINT) AS __p156,
         (CAST(__p21 AS HUGEINT)) AS __p159,
         (CASE WHEN abs(__p159) >= 100000000000000000000::HUGEINT THEN NULL ELSE __p159 END) AS __p160,
         CAST(replace(CAST(precio_paquete AS VARCHAR), '.', '') AS HUGEINT) AS __p164,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p175,
         (CASE WHEN abs(__p175) >= 10000000000::HUGEINT THEN NULL ELSE __p175 END) AS __p176,
         (CAST(__p10 AS HUGEINT)) AS __p177,
         (CASE WHEN abs(__p177) >= 10000000000::HUGEINT THEN NULL ELSE __p177 END) AS __p178,
         (__p9 * 100000000000::HUGEINT) AS __p179,
         (CAST(__p21 AS HUGEINT)) AS __p182,
         (CASE WHEN abs(__p182) >= 100000000000000000000::HUGEINT THEN NULL ELSE __p182 END) AS __p183,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p197,
         (CASE WHEN abs(__p197) >= 10000000000::HUGEINT THEN NULL ELSE __p197 END) AS __p198,
         imp_sugerido AS __p199,
         (CAST(__p199 AS HUGEINT)) AS __p200,
         (CASE WHEN abs(__p200) >= 10000000000::HUGEINT THEN NULL ELSE __p200 END) AS __p201,
         (__p201 * __p74) AS __p202,
         (CASE WHEN abs(__p202) >= 100000000000000000000000000000::HUGEINT THEN NULL ELSE __p202 END) AS __p203,
         (__p198 * __p203) AS __p204,
         (CASE WHEN abs(__p204) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p204 END) AS __p205,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p206,
         (CASE WHEN abs(__p206) >= 10000000000::HUGEINT THEN NULL ELSE __p206 END) AS __p207,
         (CAST(__p199 AS HUGEINT)) AS __p208,
         (CASE WHEN abs(__p208) >= 10000000000::HUGEINT THEN NULL ELSE __p208 END) AS __p209,
         (__p209 * 10000000000000000000000000::HUGEINT) AS __p210,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p216,
         (CASE WHEN abs(__p216) >= 10000000000::HUGEINT THEN NULL ELSE __p216 END) AS __p217,
         imp_ventafull AS __p218,
         (CAST(__p218 AS HUGEINT)) AS __p219,
         (CASE WHEN abs(__p219) >= 10000000000::HUGEINT THEN NULL ELSE __p219 END) AS __p220,
         (__p220 * __p74) AS __p221,
         (CASE WHEN abs(__p221) >= 100000000000000000000000000000::HUGEINT THEN NULL ELSE __p221 END) AS __p222,
         (__p217 * __p222) AS __p223,
         (CASE WHEN abs(__p223) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p223 END) AS __p224,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p225,
         (CASE WHEN abs(__p225) >= 10000000000::HUGEINT THEN NULL ELSE __p225 END) AS __p226,
         (CAST(__p218 AS HUGEINT)) AS __p227,
         (CASE WHEN abs(__p227) >= 10000000000::HUGEINT THEN NULL ELSE __p227 END) AS __p228,
         (__p228 * 10000000000000000000000000::HUGEINT) AS __p229,
         (CAST(((CASE WHEN (upper(__p4) = 'PRO') THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p235,
         (CASE WHEN abs(__p235) >= 10000000000::HUGEINT THEN NULL ELSE __p235 END) AS __p236,
         (__p73 * __p74) AS __p237,
         (CASE WHEN abs(__p237) >= 10000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p237 END) AS __p238,
         (__p236 * __p238) AS __p239,
         (CAST(((CASE WHEN (upper(__p4) = 'PRO') THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p242,
         (CASE WHEN abs(__p242) >= 10000000000::HUGEINT THEN NULL ELSE __p242 END) AS __p243,
         (__p73 * 100000000000000000000::HUGEINT) AS __p244,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p250,
         (CASE WHEN abs(__p250) >= 10000000000::HUGEINT THEN NULL ELSE __p250 END) AS __p251,
         CAST(replace(CAST(imp_isc AS VARCHAR), '.', '') AS HUGEINT) AS __p252,
         (__p252 * __p74) AS __p253,
         (CASE WHEN abs(__p253) >= 10000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p253 END) AS __p254,
         (__p251 * __p254) AS __p255,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p258,
         (CASE WHEN abs(__p258) >= 10000000000::HUGEINT THEN NULL ELSE __p258 END) AS __p259,
         (__p252 * 100000000000000000000::HUGEINT) AS __p260,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p266,
         (CASE WHEN abs(__p266) >= 10000000000::HUGEINT THEN NULL ELSE __p266 END) AS __p267,
         CAST(replace(CAST(imp_igv AS VARCHAR), '.', '') AS HUGEINT) AS __p268,
         (__p268 * __p74) AS __p269,
         (CASE WHEN abs(__p269) >= 10000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p269 END) AS __p270,
         (__p267 * __p270) AS __p271,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p274,
         (CASE WHEN abs(__p274) >= 10000000000::HUGEINT THEN NULL ELSE __p274 END) AS __p275,
         (__p268 * 100000000000000000000::HUGEINT) AS __p276,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p282,
         (CASE WHEN abs(__p282) >= 10000000000::HUGEINT THEN NULL ELSE __p282 END) AS __p283,
         CAST(replace(CAST(imp_im3 AS VARCHAR), '.', '') AS HUGEINT) AS __p284,
         (__p284 * __p74) AS __p285,
         (CASE WHEN abs(__p285) >= 10000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p285 END) AS __p286,
         (__p283 * __p286) AS __p287,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p290,
         (CASE WHEN abs(__p290) >= 10000000000::HUGEINT THEN NULL ELSE __p290 END) AS __p291,
         (__p284 * 100000000000000000000::HUGEINT) AS __p292,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p298,
         (CASE WHEN abs(__p298) >= 10000000000::HUGEINT THEN NULL ELSE __p298 END) AS __p299,
         CAST(replace(CAST(imp_im4 AS VARCHAR), '.', '') AS HUGEINT) AS __p300,
         (__p300 * __p74) AS __p301,
         (CASE WHEN abs(__p301) >= 10000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p301 END) AS __p302,
         (__p299 * __p302) AS __p303,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p306,
         (CASE WHEN abs(__p306) >= 10000000000::HUGEINT THEN NULL ELSE __p306 END) AS __p307,
         (__p300 * 100000000000000000000::HUGEINT) AS __p308,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p314,
         (CASE WHEN abs(__p314) >= 10000000000::HUGEINT THEN NULL ELSE __p314 END) AS __p315,
         CAST(replace(CAST(imp_im5 AS VARCHAR), '.', '') AS HUGEINT) AS __p316,
         (__p316 * __p74) AS __p317,
         (CASE WHEN abs(__p317) >= 10000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p317 END) AS __p318,
         (__p315 * __p318) AS __p319,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p322,
         (CASE WHEN abs(__p322) >= 10000000000::HUGEINT THEN NULL ELSE __p322 END) AS __p323,
         (__p316 * 100000000000000000000::HUGEINT) AS __p324,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p330,
         (CASE WHEN abs(__p330) >= 10000000000::HUGEINT THEN NULL ELSE __p330 END) AS __p331,
         CAST(replace(CAST(imp_im6 AS VARCHAR), '.', '') AS HUGEINT) AS __p332,
         (__p332 * __p74) AS __p333,
         (CASE WHEN abs(__p333) >= 10000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p333 END) AS __p334,
         (__p331 * __p334) AS __p335,
         (CAST(((CASE WHEN (NOT (upper(__p4) = 'PRO')) THEN 1 ELSE 0 END) * __p5) AS HUGEINT)) AS __p338,
         (CASE WHEN abs(__p338) >= 10000000000::HUGEINT THEN NULL ELSE __p338 END) AS __p339,
         (__p332 * 100000000000000000000::HUGEINT) AS __p340,
         fecha_creacion AS __p346,
         fecha_modificacion AS __p347,
         es_eliminado AS __p348
  FROM step_t_venta_detalle_df_t_historico_venta_detalle_select
  
  )
  )
  )
  )
  )
  GROUP BY __p0, __p1
  )
  )
),
job_t_venta_detalle AS (
  SELECT * FROM step_t_venta_detalle_df_dom_t_venta_detalle
),
step_t_visita_df_t_historico_visita AS (
  SELECT *
  FROM stage_t_visita
  WHERE (strftime(fecha_visita, '%Y%m') IN ('199504', '199505', '199506'))
),
step_t_visita_df_m_compania AS (
  SELECT mp.id_pais AS id_pais,
         mc.cod_pais AS cod_pais,
         mc.cod_compania AS cod_compania
  FROM stage_m_compania AS mc
  JOIN stage_m_pais AS mp ON (mp.cod_pais = mc.cod_pais)
),
step_t_visita_df_t_historico_visita_select AS (
  SELECT trim(mc.id_pais) AS id_pais,
         strftime(tvi.fecha_visita, '%Y%m') AS id_periodo,
         concat_ws('|', strftime(tvi.fecha_visita, '%Y%m%d'), tvi.cod_compania, tvi.cod_cliente, tvi.cod_sucursal, tvi.cod_fuerza_venta) AS id_visita,
         concat_ws('|', tvi.cod_compania, tvi.cod_sucursal) AS id_sucursal,
         concat_ws('|', tvi.cod_compania, tvi.cod_cliente) AS id_cliente,
         concat_ws('|', tvi.cod_compania, tvi.cod_sucursal, tvi.cod_fuerza_venta) AS id_fuerza_venta,
         NULL AS cod_visita,
         tvi.fecha_visita AS fecha_visita,
         1 AS es_activo,
         tvi.fecha_visita AS fecha_creacion,
         tvi.fecha_modificacion AS fecha_modificacion,
         0 AS es_eliminado
  FROM step_t_visita_df_t_historico_visita AS tvi
  JOIN step_t_visita_df_m_compania AS mc ON (tvi.cod_compania = mc.cod_compania)
),
step_t_visita_df_dom_t_visita AS (
  SELECT CAST(id_pais AS VARCHAR) AS id_pais,
         CAST(id_periodo AS VARCHAR) AS id_periodo,
         CAST(id_visita AS VARCHAR) AS id_visita,
         CAST(id_sucursal AS VARCHAR) AS id_sucursal,
         CAST(id_cliente AS VARCHAR) AS id_cliente,
         CAST(id_fuerza_venta AS VARCHAR) AS id_fuerza_venta,
         CAST(cod_visita AS VARCHAR) AS cod_visita,
         CAST(fecha_visita AS DATE) AS fecha_visita,
         CAST(es_activo AS INT) AS es_activo,
         CAST(fecha_creacion AS TIMESTAMP) AS fecha_creacion,
         CAST(fecha_modificacion AS TIMESTAMP) AS fecha_modificacion,
         CAST(es_eliminado AS INT) AS es_eliminado
  FROM step_t_visita_df_t_historico_visita_select
),
job_t_visita AS (
  SELECT * FROM step_t_visita_df_dom_t_visita
),
step_fact_kpi_detalle_df_t_pedido AS (
  SELECT *
  FROM job_t_pedido
  WHERE (id_periodo IN ('199504', '199505', '199506'))
),
step_fact_kpi_detalle_df_t_pedido_detalle AS (
  SELECT *
  FROM job_t_pedido_detalle
  WHERE (id_periodo IN ('199504', '199505', '199506'))
),
step_fact_kpi_detalle_df_fact_kpi_detalle_pedido AS (
  SELECT tp.id_pais AS id_pais,
         tp.id_pedido AS id_pedido,
         tp.id_periodo AS id_periodo,
         tp.id_sucursal AS id_sucursal,
         tp.id_cliente AS id_cliente,
         tpd.id_articulo AS id_articulo,
         tp.id_vendedor AS id_vendedor,
         tp.id_supervisor AS id_supervisor,
         tp.id_fuerza_venta AS id_fuerza_venta,
         tp.id_modelo_atencion AS id_modelo_atencion,
         tp.id_origen_pedido AS id_origen_pedido,
         tp.fecha_pedido AS fecha_pedido,
         tp.cod_tipo_atencion AS cod_tipo_atencion,
         tp.id_visita AS id_visita_pedido,
         tp.id_cliente AS id_cliente_pedido
  FROM step_fact_kpi_detalle_df_t_pedido AS tp
  JOIN step_fact_kpi_detalle_df_t_pedido_detalle AS tpd ON (tp.id_pedido = tpd.id_pedido)
  WHERE (tp.cod_tipo_documento_pedido = '200')
),
step_fact_kpi_detalle_df_fact_kpi_detalle_venta AS (
  SELECT __x0 AS id_pais,
         __x1 AS id_sucursal,
         __x2 AS id_periodo,
         __x3 AS id_pedido,
         __x4 AS id_cliente,
         __x5 AS id_producto,
         CAST((CASE WHEN __x6 < 0 THEN '-' ELSE '' END || CAST(abs(__x6) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x6) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_cajafisica_vta,
         CAST((CASE WHEN __x12 < 0 THEN '-' ELSE '' END || CAST(abs(__x12) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x12) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_cajaunitaria_vta,
         CAST((CASE WHEN __x13 < 0 THEN '-' ELSE '' END || CAST(abs(__x13) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x13) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_cajafisica_pro,
         CAST((CASE WHEN __x19 < 0 THEN '-' ELSE '' END || CAST(abs(__x19) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x19) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_cajaunitaria_pro,
         CAST((CASE WHEN __x20 < 0 THEN '-' ELSE '' END || CAST(abs(__x20) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x20) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS imp_neto_vta_mn,
         CAST((CASE WHEN __x21 < 0 THEN '-' ELSE '' END || CAST(abs(__x21) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x21) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS imp_neto_vta_me,
         CAST((CASE WHEN __x22 < 0 THEN '-' ELSE '' END || CAST(abs(__x22) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x22) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS imp_bruto_vta_mn,
         CAST((CASE WHEN __x23 < 0 THEN '-' ELSE '' END || CAST(abs(__x23) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs(__x23) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS imp_bruto_vta_me,
         __x4 AS id_cliente_venta
  FROM (
  SELECT *,
         (CASE WHEN __x9 = 0 THEN NULL ELSE (CASE WHEN (__x10 < 0) != (__x9 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__x10) + abs(__x9)) // (2::HUGEINT * abs(__x9))) END) AS __x11,
         (CASE WHEN abs(__x11) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __x11 END) AS __x12,
         (CASE WHEN __x16 = 0 THEN NULL ELSE (CASE WHEN (__x17 < 0) != (__x16 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__x17) + abs(__x16)) // (2::HUGEINT * abs(__x16))) END) AS __x18,
         (CASE WHEN abs(__x18) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __x18 END) AS __x19
  FROM (
  SELECT tv.id_pais AS __x0,
         tv.id_sucursal AS __x1,
         tp.id_periodo AS __x2,
         tv.id_pedido AS __x3,
         tv.id_cliente AS __x4,
         tvd.id_producto AS __x5,
         CAST(replace(CAST(tvd.cant_caja_fisica_ven AS VARCHAR), '.', '') AS HUGEINT) AS __x6,
         CAST(replace(CAST(tvd.cant_caja_volumen_ven AS VARCHAR), '.', '') AS HUGEINT) AS __x7,
         (CAST(30 AS HUGEINT)) AS __x8,
         (CASE WHEN abs(__x8) >= 100::HUGEINT THEN NULL ELSE __x8 END) AS __x9,
         (__x7 * 1::HUGEINT) AS __x10,
         CAST(replace(CAST(tvd.cant_caja_fisica_pro AS VARCHAR), '.', '') AS HUGEINT) AS __x13,
         CAST(replace(CAST(tvd.cant_caja_volumen_pro AS VARCHAR), '.', '') AS HUGEINT) AS __x14,
         (CAST(30 AS HUGEINT)) AS __x15,
         (CASE WHEN abs(__x15) >= 100::HUGEINT THEN NULL ELSE __x15 END) AS __x16,
         (__x14 * 1::HUGEINT) AS __x17,
         CAST(replace(CAST(tvd.imp_neto_vta_mn AS VARCHAR), '.', '') AS HUGEINT) AS __x20,
         CAST(replace(CAST(tvd.imp_neto_vta_me AS VARCHAR), '.', '') AS HUGEINT) AS __x21,
         CAST(replace(CAST(tvd.imp_bruto_vta_mn AS VARCHAR), '.', '') AS HUGEINT) AS __x22,
         CAST(replace(CAST(tvd.imp_bruto_vta_me AS VARCHAR), '.', '') AS HUGEINT) AS __x23
  FROM step_fact_kpi_detalle_df_t_pedido AS tp
  JOIN job_t_venta AS tv ON (tp.id_pedido = tv.id_pedido)
  JOIN job_t_venta_detalle AS tvd ON (tv.id_venta = tvd.id_venta)
  JOIN job_m_tipo_venta AS mtv ON ((tv.id_tipo_venta = mtv.id_tipo_venta) AND (upper(mtv.cod_tipo_operacion) IN ('VEN', 'PRO')))
  WHERE (((tp.cod_tipo_documento_pedido = '200') AND (tv.es_eliminado = 0)) AND (NOT (tv.cod_documento_venta IN ('CMD', 'RMD'))))
  )
  )
),
step_fact_kpi_detalle_df_venta_pedido_resumen AS (
  SELECT coalesce(tp.id_pais, tv.id_pais) AS id_pais,
         coalesce(tp.id_periodo, tv.id_periodo) AS id_periodo,
         coalesce(tp.id_pedido, tv.id_pedido) AS id_pedido,
         coalesce(tp.id_sucursal, tv.id_sucursal) AS id_sucursal,
         coalesce(tp.id_cliente, tv.id_cliente) AS id_cliente,
         coalesce(tp.id_articulo, tv.id_producto) AS id_articulo,
         tp.id_vendedor AS id_vendedor,
         tp.id_supervisor AS id_supervisor,
         tp.id_fuerza_venta AS id_fuerza_venta,
         tp.id_modelo_atencion AS id_modelo_atencion,
         tp.id_origen_pedido AS id_origen_pedido,
         tp.fecha_pedido AS fecha_pedido,
         tp.id_visita_pedido AS id_visita,
         tp.id_visita_pedido AS id_visita_pedido,
         tp.id_cliente_pedido AS id_cliente_pedido,
         tp.cod_tipo_atencion AS cod_tipo_atencion,
         tp.id_visita_pedido AS id_visita_venta,
         tv.id_cliente_venta AS id_cliente_venta,
         tv.cant_cajafisica_vta AS cant_cajafisica_vta,
         tv.cant_cajaunitaria_vta AS cant_cajaunitaria_vta,
         tv.cant_cajafisica_pro AS cant_cajafisica_pro,
         tv.cant_cajaunitaria_pro AS cant_cajaunitaria_pro,
         tv.imp_neto_vta_mn AS imp_neto_vta_mn,
         tv.imp_neto_vta_me AS imp_neto_vta_me,
         tv.imp_bruto_vta_mn AS imp_bruto_vta_mn,
         tv.imp_bruto_vta_me AS imp_bruto_vta_me
  FROM step_fact_kpi_detalle_df_fact_kpi_detalle_pedido AS tp
  FULL JOIN step_fact_kpi_detalle_df_fact_kpi_detalle_venta AS tv ON ((tp.id_pedido = tv.id_pedido) AND (tp.id_articulo = tv.id_producto))
),
step_fact_kpi_detalle_df_fact_kpi_detalle AS (
  SELECT CAST(coalesce(tv.id_pais, tvpr.id_pais) AS VARCHAR) AS id_pais,
         CAST(coalesce(tv.id_periodo, tvpr.id_periodo) AS VARCHAR) AS id_periodo,
         CAST(coalesce(tv.id_sucursal, tvpr.id_sucursal) AS VARCHAR) AS id_sucursal,
         CAST(coalesce(tv.id_cliente, tvpr.id_cliente) AS VARCHAR) AS id_cliente,
         CAST(tvpr.id_articulo AS VARCHAR) AS id_producto,
         CAST(tvpr.id_vendedor AS VARCHAR) AS id_vendedor,
         CAST(tvpr.id_supervisor AS VARCHAR) AS id_supervisor,
         CAST(tvpr.id_fuerza_venta AS VARCHAR) AS id_fuerza_venta,
         CAST(tvpr.id_modelo_atencion AS VARCHAR) AS id_modelo_atencion,
         CAST(tvpr.id_origen_pedido AS VARCHAR) AS id_origen_pedido,
         CAST(coalesce(tvpr.fecha_pedido, tv.fecha_visita) AS DATE) AS fecha_pedido,
         CAST(tvpr.cod_tipo_atencion AS VARCHAR) AS cod_tipo_atencion,
         CAST(coalesce(tv.id_visita, tvpr.id_pedido) AS VARCHAR) AS id_visita,
         CAST(tvpr.id_visita_pedido AS VARCHAR) AS id_visita_pedido,
         CAST(tvpr.id_visita_venta AS VARCHAR) AS id_visita_venta,
         CAST(tv.id_cliente AS VARCHAR) AS id_cliente_visita,
         CAST(coalesce(tv.id_cliente, tvpr.id_cliente_pedido) AS VARCHAR) AS id_cliente_visita_pedido,
         CAST(coalesce(tv.id_cliente, tvpr.id_cliente_venta) AS VARCHAR) AS id_cliente_visita_venta,
         CAST(tvpr.cant_cajafisica_vta AS DECIMAL(38,12)) AS cant_cajafisica_vta,
         CAST(tvpr.cant_cajaunitaria_vta AS DECIMAL(38,12)) AS cant_cajaunitaria_vta,
         CAST(tvpr.cant_cajafisica_pro AS DECIMAL(38,12)) AS cant_cajafisica_pro,
         CAST(tvpr.cant_cajaunitaria_pro AS DECIMAL(38,12)) AS cant_cajaunitaria_pro,
         CAST(tvpr.imp_neto_vta_mn AS DECIMAL(38,12)) AS imp_neto_vta_mn,
         CAST(tvpr.imp_neto_vta_me AS DECIMAL(38,12)) AS imp_neto_vta_me,
         CAST(tvpr.imp_bruto_vta_mn AS DECIMAL(38,12)) AS imp_bruto_vta_mn,
         CAST(tvpr.imp_bruto_vta_me AS DECIMAL(38,12)) AS imp_bruto_vta_me
  FROM job_t_visita AS tv
  FULL JOIN step_fact_kpi_detalle_df_venta_pedido_resumen AS tvpr ON (tvpr.id_visita = tv.id_visita)
),
job_fact_kpi_detalle AS (
  SELECT * FROM step_fact_kpi_detalle_df_fact_kpi_detalle
)
 SELECT id_pais,
       id_periodo,
       id_sucursal,
       id_cliente,
       id_producto,
       id_vendedor,
       id_supervisor,
       id_fuerza_venta,
       id_modelo_atencion,
       id_origen_pedido,
       fecha_pedido,
       cod_tipo_atencion,
       id_visita,
       id_visita_pedido,
       id_visita_venta,
       id_cliente_visita,
       id_cliente_visita_pedido,
       id_cliente_visita_venta,
       CAST(CAST(cant_cajafisica_vta AS VARCHAR) AS DOUBLE) AS cant_cajafisica_vta,
       CAST(CAST(cant_cajaunitaria_vta AS VARCHAR) AS DOUBLE) AS cant_cajaunitaria_vta,
       CAST(CAST(cant_cajafisica_pro AS VARCHAR) AS DOUBLE) AS cant_cajafisica_pro,
       CAST(CAST(cant_cajaunitaria_pro AS VARCHAR) AS DOUBLE) AS cant_cajaunitaria_pro,
       CAST(CAST(imp_neto_vta_mn AS VARCHAR) AS DOUBLE) AS imp_neto_vta_mn,
       CAST(CAST(imp_neto_vta_me AS VARCHAR) AS DOUBLE) AS imp_neto_vta_me,
       CAST(CAST(imp_bruto_vta_mn AS VARCHAR) AS DOUBLE) AS imp_bruto_vta_mn,
       CAST(CAST(imp_bruto_vta_me AS VARCHAR) AS DOUBLE) AS imp_bruto_vta_me FROM job_fact_kpi_detalle