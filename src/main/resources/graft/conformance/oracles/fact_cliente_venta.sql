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
stage_m_sucursal AS (
  SELECT lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS cod_compania,
         lpad(CAST(r_regionkey AS VARCHAR), 2, '0') AS cod_sucursal,
         ('SUC ' || n_name || ' ' || CAST(r_regionkey AS VARCHAR)) AS desc_sucursal,
         CASE WHEN r_regionkey = 4 AND n_nationkey % 11 = 0 THEN '0' ELSE '1' END AS es_activo,
         CASE WHEN r_regionkey % 3 = 0 THEN '00' ELSE CAST(r_regionkey AS VARCHAR) END AS cod_tipo_sucursal,
         CAST(('1995-0' || CAST(4 + (n_nationkey + r_regionkey) % 3 AS VARCHAR) || '-' || lpad(CAST(1 + (n_nationkey + r_regionkey) % 28 AS VARCHAR), 2, '0')) AS DATE) AS fecha_creacion,
         CAST(('1995-0' || CAST(4 + (n_nationkey + r_regionkey + 1) % 3 AS VARCHAR) || '-' || lpad(CAST(1 + (n_nationkey + r_regionkey + 1) % 28 AS VARCHAR), 2, '0')) AS DATE) AS fecha_modificacion
  FROM nation JOIN region ON n_nationkey % 1 = r_regionkey % 1
),
stage_m_cliente AS (
  SELECT CAST(c_custkey AS VARCHAR) AS cod_cliente,
         lpad(CAST((c_custkey) % 25 AS VARCHAR), 2, '0') AS cod_compania,
         lpad(CAST((c_custkey) % 5 AS VARCHAR), 2, '0') AS cod_sucursal,
         c_name AS nomb_cliente,
         ('DIR ' || c_name) AS direccion,
         CAST(c_custkey % 7 AS VARCHAR) AS cod_canal,
         CAST(c_custkey % 11 AS VARCHAR) AS cod_giro,
         CAST(c_custkey % 13 AS VARCHAR) AS cod_subgiro,
         CAST(c_custkey % 4 AS VARCHAR) AS cod_lista_precio,
         CAST(c_custkey % 17 AS VARCHAR) AS cod_cuenta_clave,
         CASE WHEN c_custkey % 5 = 0 THEN NULL
              WHEN c_custkey % 5 = 1 THEN ''
              ELSE ('Z' || CAST(c_custkey % 50 AS VARCHAR)) END AS cod_zona_postal,
         CASE WHEN c_custkey % 3 = 0 THEN NULL
              ELSE CAST(c_custkey % 100 AS VARCHAR) END AS cod_cliente_principal,
         'DNI' AS tipo_documento_identidad,
         CAST(10000000 + c_custkey AS VARCHAR) AS nro_documento_identidad,
         CASE WHEN c_custkey % 19 = 0 THEN '0' ELSE '1' END AS es_activo,
         CAST((CAST(CAST(('1995-0' || CAST(4 + (c_custkey) % 3 AS VARCHAR) || '-' || lpad(CAST(1 + (c_custkey) % 28 AS VARCHAR), 2, '0')) AS DATE) AS VARCHAR) || ' ' || lpad(CAST((c_custkey) % 24 AS VARCHAR), 2, '0') || ':00:00') AS TIMESTAMP) AS fecha_creacion,
         CAST((CAST(CAST(('1995-0' || CAST(4 + (c_custkey + 1) % 3 AS VARCHAR) || '-' || lpad(CAST(1 + (c_custkey + 1) % 28 AS VARCHAR), 2, '0')) AS DATE) AS VARCHAR) || ' ' || lpad(CAST((c_custkey + 1) % 24 AS VARCHAR), 2, '0') || ':00:00') AS TIMESTAMP) AS fecha_modificacion
  FROM customer
),
stage_m_asignacion_modulo AS (
  SELECT CAST(c_custkey AS VARCHAR) AS cod_cliente,
         lpad(CAST((c_custkey) % 25 AS VARCHAR), 2, '0') AS cod_compania,
         lpad(CAST((c_custkey) % 5 AS VARCHAR), 2, '0') AS cod_sucursal,
         CAST(c_custkey % 3 AS VARCHAR) AS cod_fuerza_venta,
         CAST(c_custkey % 9 AS VARCHAR) AS cod_modulo,
         CAST(c_custkey % 180 AS VARCHAR) AS coord_x,
         CAST(c_custkey % 90 AS VARCHAR) AS coord_y
  FROM customer
  WHERE c_custkey % 6 <> 0
),
stage_m_tipo_cliente AS (
  SELECT CAST(c_custkey AS VARCHAR) AS cod_cliente,
         lpad(CAST((c_custkey) % 25 AS VARCHAR), 2, '0') AS cod_compania,
         CASE c_custkey % 6 WHEN 0 THEN 'A' WHEN 1 THEN 'V'
              WHEN 2 THEN 'T' WHEN 3 THEN 'a' WHEN 4 THEN 'N'
              ELSE 'X' END AS tipo_cliente
  FROM customer
  WHERE c_custkey % 4 < 3
),
stage_m_cuenta_clave AS (
  SELECT DISTINCT cod_compania, cod_cuenta_clave,
         ('CUENTA ' || cod_cuenta_clave) AS descripcion
  FROM stage_m_cliente
),
stage_m_canal AS (
  SELECT DISTINCT cod_compania, cod_canal,
         ('CANAL ' || cod_canal) AS desc_canal,
         CASE WHEN cod_canal = '6' THEN '0' ELSE '1' END AS es_activo
  FROM stage_m_cliente
),
stage_m_giro AS (
  SELECT DISTINCT cod_compania, cod_giro,
         ('GIRO ' || cod_giro) AS desc_giro,
         '1' AS es_activo
  FROM stage_m_cliente
),
stage_m_modulo AS (
  SELECT DISTINCT cod_compania, cod_sucursal, cod_modulo,
         cod_fuerza_venta,
         CAST(CAST(cod_modulo AS INT) % 5 AS VARCHAR) AS cod_ruta,
         (cod_compania || '|' || cod_modulo) AS id_modulo,
         ('MODULO ' || cod_modulo) AS desc_modulo
  FROM stage_m_asignacion_modulo
),
stage_m_ruta AS (
  SELECT DISTINCT cod_compania, cod_sucursal, cod_ruta,
         cod_fuerza_venta,
         CAST(1 + CAST(cod_ruta AS INT) % 4 AS VARCHAR) AS cod_modelo_atencion,
         CAST(CAST(cod_ruta AS INT) * 8 % 40 AS VARCHAR) AS cod_vendedor,
         CAST(CAST(cod_ruta AS INT) % 15 AS VARCHAR) AS cod_zona,
         ('RUTA ' || cod_ruta) AS desc_ruta,
         '1' AS es_activo
  FROM stage_m_modulo
),
stage_m_modelo_atencion AS (
  SELECT lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS id_compania,
         CAST(1 + r_regionkey AS VARCHAR) AS cod_modelo_atencion,
         CASE r_regionkey WHEN 0 THEN 'Pre Venta' WHEN 1 THEN 'Auto Venta'
              WHEN 2 THEN 'Televenta' WHEN 3 THEN 'Especializado'
              ELSE 'Otro' END AS desc_modelo_atencion
  FROM nation JOIN region ON n_nationkey % 1 = r_regionkey % 1
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
stage_m_ng1 AS (
  SELECT DISTINCT CAST(n_regionkey AS VARCHAR) AS id_pais,
         CAST(n_nationkey % 3 AS VARCHAR) AS cod_ng1,
         ('NG1 ' || CAST(n_nationkey % 3 AS VARCHAR)) AS desc_ng1
  FROM nation
),
stage_m_ng2 AS (
  SELECT DISTINCT CAST(n_regionkey AS VARCHAR) AS id_pais,
         CAST(n_nationkey % 3 AS VARCHAR) AS cod_ng1,
         CAST(n_nationkey % 6 AS VARCHAR) AS cod_ng2,
         ('NG2 ' || CAST(n_nationkey % 6 AS VARCHAR)) AS desc_ng2
  FROM nation
),
stage_m_ng3 AS (
  SELECT DISTINCT
         CAST((c_custkey % 25) % 5 AS VARCHAR) AS id_pais,
         CAST(c_custkey % 3 AS VARCHAR) AS cod_ng1,
         CAST(c_custkey % 6 AS VARCHAR) AS cod_ng2,
         CAST(c_custkey % 12 AS VARCHAR) AS cod_ng3,
         ('Z' || CAST(c_custkey % 50 AS VARCHAR)) AS cod_zona_postal,
         ('NG3 ' || CAST(c_custkey % 12 AS VARCHAR)) AS desc_ng3
  FROM customer
  WHERE c_custkey % 5 > 1
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
stage_m_marca AS (
  SELECT DISTINCT cod_compania, cod_marca,
         ('MARCA ' || cod_marca) AS desc_marca
  FROM stage_m_articulo
),
stage_m_categoria AS (
  SELECT DISTINCT cod_compania, cod_categoria,
         ('CATEGORIA ' || cod_categoria) AS desc_categoria
  FROM stage_m_articulo
),
stage_m_familia AS (
  SELECT DISTINCT cod_compania, cod_familia, cod_linea,
         ('FAMILIA ' || cod_familia) AS desc_familia
  FROM stage_m_articulo
),
stage_m_subfamilia AS (
  SELECT DISTINCT cod_compania, cod_familia, cod_linea, cod_subfamilia,
         ('SUBFAMILIA ' || cod_subfamilia) AS desc_subfamilia
  FROM stage_m_articulo
),
stage_m_linea AS (
  SELECT DISTINCT cod_compania, cod_linea,
         ('LINEA ' || cod_linea) AS desc_linea,
         CASE WHEN cod_linea = '12' THEN 'TE'
              WHEN cod_linea = '17' THEN 'T' ELSE 'F' END AS flg_linea
  FROM stage_m_articulo
),
stage_m_formato AS (
  SELECT DISTINCT cod_compania, cod_formato,
         ('FORMATO ' || cod_formato) AS desc_formato
  FROM stage_m_articulo
),
stage_m_presentacion AS (
  SELECT DISTINCT cod_compania, cod_presentacion,
         ('PRESENTACION ' || cod_presentacion) AS desc_presentacion
  FROM stage_m_articulo
),
stage_m_sabor AS (
  SELECT DISTINCT cod_compania, cod_sabor,
         ('SABOR ' || cod_sabor) AS desc_sabor
  FROM stage_m_articulo
),
stage_m_tipo_envase AS (
  SELECT DISTINCT cod_compania, cod_tipo_envase,
         ('ENVASE ' || cod_tipo_envase) AS desc_tipo_envase
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
step_m_asignacion_modulo_tmp_asignacion_modulo AS (
  SELECT (trim(mm.cod_compania) || '|' || trim(mm.cod_sucursal) || '|' || trim(mm.cod_fuerza_venta) || '|' || trim(mm.cod_modulo) || '|' || trim(mm.cod_cliente)) AS id_asignacion_modulo,
         mp.id_pais AS id_pais,
         (trim(suc.cod_compania) || '|' || trim(suc.cod_sucursal)) AS id_sucursal,
         (trim(suc.cod_compania) || '|' || trim(mm.cod_cliente)) AS id_cliente,
         (trim(mm.cod_compania) || '|' || trim(mm.cod_sucursal) || '|' || trim(mm.cod_fuerza_venta) || '|' || trim(mm.cod_modulo)) AS id_modulo,
         trim(mm.cod_modulo) AS cod_modulo,
         CAST(NULL AS TIMESTAMP) AS fecha_inicio,
         CAST(NULL AS TIMESTAMP) AS fecha_fin,
         CAST(NULL AS VARCHAR) AS frecuencia_visita,
         CAST(NULL AS VARCHAR) AS periodo_visita,
         CASE WHEN ((mc.cod_sucursal IS NULL) OR (mm.cod_sucursal = mc.cod_sucursal)) THEN 1 ELSE 0 END AS es_activo,
         0 AS es_eliminado,
         DATE '1995-07-01' AS fecha_creacion,
         DATE '1995-07-01' AS fecha_modificacion
  FROM stage_m_asignacion_modulo AS mm
  LEFT JOIN stage_m_cliente AS mc ON ((mm.cod_compania = mc.cod_compania) AND (mm.cod_cliente = mc.cod_cliente))
  JOIN stage_m_sucursal AS suc ON ((suc.cod_compania = mm.cod_compania) AND (suc.cod_sucursal = mm.cod_sucursal))
  JOIN stage_m_compania AS comp ON (suc.cod_compania = comp.cod_compania)
  JOIN stage_m_pais AS mp ON (comp.cod_pais = mp.cod_pais)
),
step_m_asignacion_modulo_df_dom_m_asignacion_modulo AS (
  SELECT CAST(mam.id_asignacion_modulo AS VARCHAR) AS id_asignacion_modulo,
         CAST(mam.id_pais AS VARCHAR) AS id_pais,
         CAST(mam.id_sucursal AS VARCHAR) AS id_sucursal,
         CAST(mam.id_cliente AS VARCHAR) AS id_cliente,
         CAST(mam.id_modulo AS VARCHAR) AS id_modulo,
         CAST(mam.fecha_inicio AS TIMESTAMP) AS fecha_inicio,
         CAST(mam.fecha_fin AS TIMESTAMP) AS fecha_fin,
         CAST(mam.frecuencia_visita AS VARCHAR) AS frecuencia_visita,
         CAST(mam.periodo_visita AS VARCHAR) AS periodo_visita,
         CAST(mam.es_activo AS INT) AS es_activo,
         CAST(mam.es_eliminado AS INT) AS es_eliminado,
         CAST(mam.fecha_creacion AS TIMESTAMP) AS fecha_creacion,
         CAST(mam.fecha_modificacion AS TIMESTAMP) AS fecha_modificacion
  FROM step_m_asignacion_modulo_tmp_asignacion_modulo AS mam
),
job_m_asignacion_modulo AS (
  SELECT * FROM step_m_asignacion_modulo_df_dom_m_asignacion_modulo
),
step_m_cliente_df_tmp_estructura_cliente AS (
  SELECT mcl.cod_compania AS cod_compania,
         mcl.cod_cliente AS cod_cliente,
         mecl.coord_x AS coord_x,
         mecl.coord_y AS coord_y,
         row_number() OVER (PARTITION BY mcl.cod_compania, mcl.cod_sucursal, mcl.cod_cliente ORDER BY mecl.cod_fuerza_venta ASC) AS orden
  FROM stage_m_cliente AS mcl
  JOIN stage_m_asignacion_modulo AS mecl ON (((mcl.cod_compania = mecl.cod_compania) AND (mcl.cod_cliente = mecl.cod_cliente)) AND (mcl.cod_sucursal = CASE WHEN (mcl.cod_sucursal = '00') THEN mcl.cod_sucursal ELSE mecl.cod_sucursal END))
),
step_m_cliente_df_dom_m_cliente AS (
  SELECT CAST((trim(mc.cod_compania) || '|' || trim(mc.cod_cliente)) AS VARCHAR) AS id_cliente,
         CAST(NULL AS VARCHAR) AS id_cliente_ref,
         CAST(NULL AS VARCHAR) AS id_cliente_ref2,
         CAST(mp.id_pais AS VARCHAR) AS id_pais,
         CAST((trim(mc.cod_compania) || '|' || trim(mc.cod_sucursal)) AS VARCHAR) AS id_sucursal,
         CAST(CASE WHEN ((mc.cod_zona_postal IS NULL) OR (mc.cod_zona_postal = '')) THEN NULL ELSE (trim(mp.id_pais) || '|' || trim(coalesce(mc.cod_zona_postal, '0'))) END AS VARCHAR) AS id_eje_territorial,
         CAST((trim(mc.cod_compania) || '|' || 'SG' || '|' || trim(mc.cod_subgiro)) AS VARCHAR) AS id_clasificacion_cliente,
         CAST((trim(mc.cod_compania) || '|' || trim(mc.cod_lista_precio)) AS VARCHAR) AS id_lista_precio,
         CAST(mc.cod_cliente AS VARCHAR) AS cod_cliente,
         CAST(mc.nomb_cliente AS VARCHAR) AS nomb_cliente,
         CAST(cc.cod_cuenta_clave AS VARCHAR) AS cod_cuenta_clave,
         CAST(cc.descripcion AS VARCHAR) AS nomb_cuenta_clave,
         CAST(NULL AS VARCHAR) AS cod_segmento,
         CAST(NULL AS VARCHAR) AS desc_subsegmento,
         CAST(NULL AS VARCHAR) AS cod_cliente_ref,
         CAST(NULL AS VARCHAR) AS cod_cliente_ref2,
         CAST(NULL AS VARCHAR) AS cod_cliente_ref3,
         CAST(NULL AS VARCHAR) AS cod_cliente_ref4,
         CAST(c.desc_canal AS VARCHAR) AS desc_canal_local,
         CAST(g.desc_giro AS VARCHAR) AS desc_giro_local,
         CAST(mc.direccion AS VARCHAR) AS direccion,
         CAST(mc.tipo_documento_identidad AS VARCHAR) AS tipo_documento,
         CAST(mc.nro_documento_identidad AS VARCHAR) AS nro_documento,
         CAST(coalesce(tc.tipo_cliente, 'N') AS VARCHAR) AS cod_tipo_cliente,
         CAST(coalesce(mc.cod_cliente_principal, '0') AS VARCHAR) AS cod_cliente_principal,
         CAST(NULL AS VARCHAR) AS cod_cliente_transferencia,
         CAST(mecl.coord_x AS VARCHAR) AS coord_x,
         CAST(mecl.coord_y AS VARCHAR) AS coord_y,
         CAST(NULL AS DATE) AS fecha_baja,
         CAST(mc.es_activo AS VARCHAR) AS estado,
         CAST(mc.fecha_creacion AS TIMESTAMP) AS fecha_creacion,
         CAST(mc.fecha_modificacion AS TIMESTAMP) AS fecha_modificacion
  FROM stage_m_cliente AS mc
  LEFT JOIN stage_m_tipo_cliente AS tc ON (((mc.cod_compania = tc.cod_compania) AND (mc.cod_cliente = tc.cod_cliente)) AND (lower(tc.tipo_cliente) IN ('a', 'v', 't')))
  LEFT JOIN stage_m_cuenta_clave AS cc ON ((mc.cod_compania = cc.cod_compania) AND (mc.cod_cuenta_clave = cc.cod_cuenta_clave))
  LEFT JOIN stage_m_canal AS c ON ((c.cod_compania = mc.cod_compania) AND (c.cod_canal = mc.cod_canal))
  LEFT JOIN stage_m_giro AS g ON ((g.cod_compania = mc.cod_compania) AND (g.cod_giro = mc.cod_giro))
  LEFT JOIN step_m_cliente_df_tmp_estructura_cliente AS mecl ON (((mc.cod_compania = mecl.cod_compania) AND (mc.cod_cliente = mecl.cod_cliente)) AND (mecl.orden = 1))
  JOIN stage_m_compania AS mco ON (mco.cod_compania = mc.cod_compania)
  JOIN stage_m_pais AS mp ON (mco.cod_pais = mp.cod_pais)
),
job_m_cliente AS (
  SELECT * FROM step_m_cliente_df_dom_m_cliente
),
step_m_eje_territorial_df_ng4 AS (
  SELECT concat_ws('|', trim(p.id_pais), trim(di.cod_zona_postal)) AS id_eje_territorial,
         concat_ws('|', trim(p.id_pais), trim(di.cod_zona_postal), 'NG3') AS id_eje_territorial_padre,
         p.id_pais AS id_pais,
         trim(coalesce(di.cod_zona_postal, '0')) AS cod_eje_territorial,
         concat_ws('|', trim(p.id_pais), trim(coalesce(di.cod_zona_postal, '0'))) AS cod_eje_territorial_ref,
         di.desc_ng3 AS nomb_eje_territorial,
         'NG4' AS cod_tipo_eje_territorial,
         'A' AS estado,
         DATE '1995-07-01' AS fecha_creacion,
         DATE '1995-07-01' AS fecha_modificacion,
         row_number() OVER (PARTITION BY di.id_pais, coalesce(di.cod_zona_postal, '0') ORDER BY di.cod_ng3 DESC) AS orden
  FROM stage_m_ng3 AS di
  JOIN stage_m_pais AS p ON (di.id_pais = p.cod_pais)
  WHERE (di.cod_zona_postal IS NOT NULL)
),
step_m_eje_territorial_df_ng4__2 AS (
  SELECT id_eje_territorial AS id_eje_territorial,
         id_eje_territorial_padre AS id_eje_territorial_padre,
         id_pais AS id_pais,
         cod_eje_territorial AS cod_eje_territorial,
         cod_eje_territorial_ref AS cod_eje_territorial_ref,
         nomb_eje_territorial AS nomb_eje_territorial,
         cod_tipo_eje_territorial AS cod_tipo_eje_territorial,
         estado AS estado,
         fecha_creacion AS fecha_creacion,
         fecha_modificacion AS fecha_modificacion
  FROM step_m_eje_territorial_df_ng4
  WHERE (orden = 1)
),
step_m_eje_territorial_df_ng3 AS (
  SELECT concat_ws('|', trim(p.id_pais), trim(di.cod_zona_postal), 'NG3') AS id_eje_territorial,
         concat_ws('|', trim(p.id_pais), trim(di.cod_ng1), trim(di.cod_ng2)) AS id_eje_territorial_padre,
         p.id_pais AS id_pais,
         trim(coalesce(di.cod_zona_postal, '0')) AS cod_eje_territorial,
         concat_ws('|', trim(p.id_pais), trim(coalesce(di.cod_zona_postal, '0'))) AS cod_eje_territorial_ref,
         di.desc_ng3 AS nomb_eje_territorial,
         'NG3' AS cod_tipo_eje_territorial,
         'A' AS estado,
         DATE '1995-07-01' AS fecha_creacion,
         DATE '1995-07-01' AS fecha_modificacion,
         row_number() OVER (PARTITION BY di.id_pais, coalesce(di.cod_zona_postal, '0') ORDER BY di.cod_ng3 DESC) AS orden
  FROM stage_m_ng3 AS di
  JOIN stage_m_pais AS p ON (di.id_pais = p.cod_pais)
  WHERE (di.cod_zona_postal IS NOT NULL)
),
step_m_eje_territorial_df_ng3__2 AS (
  SELECT id_eje_territorial AS id_eje_territorial,
         id_eje_territorial_padre AS id_eje_territorial_padre,
         id_pais AS id_pais,
         cod_eje_territorial AS cod_eje_territorial,
         cod_eje_territorial_ref AS cod_eje_territorial_ref,
         nomb_eje_territorial AS nomb_eje_territorial,
         cod_tipo_eje_territorial AS cod_tipo_eje_territorial,
         estado AS estado,
         fecha_creacion AS fecha_creacion,
         fecha_modificacion AS fecha_modificacion
  FROM step_m_eje_territorial_df_ng3
  WHERE (orden = 1)
),
step_m_eje_territorial_df_ng2 AS (
  SELECT concat_ws('|', trim(p.id_pais), trim(pr.cod_ng1), trim(pr.cod_ng2)) AS id_eje_territorial,
         concat_ws('|', trim(p.id_pais), trim(pr.cod_ng1)) AS id_eje_territorial_padre,
         p.id_pais AS id_pais,
         trim(coalesce(pr.cod_ng2, '0')) AS cod_eje_territorial,
         NULL AS cod_eje_territorial_ref,
         pr.desc_ng2 AS nomb_eje_territorial,
         'NG2' AS cod_tipo_eje_territorial,
         'A' AS estado,
         DATE '1995-07-01' AS fecha_creacion,
         DATE '1995-07-01' AS fecha_modificacion
  FROM stage_m_ng2 AS pr
  JOIN stage_m_pais AS p ON (pr.id_pais = p.cod_pais)
  WHERE (pr.cod_ng2 IS NOT NULL)
),
step_m_eje_territorial_df_ng1 AS (
  SELECT concat_ws('|', trim(p.id_pais), trim(coalesce(de.cod_ng1, '0'))) AS id_eje_territorial,
         NULL AS id_eje_territorial_padre,
         p.id_pais AS id_pais,
         trim(coalesce(de.cod_ng1, '0')) AS cod_eje_territorial,
         NULL AS cod_eje_territorial_ref,
         de.desc_ng1 AS nomb_eje_territorial,
         'NG1' AS cod_tipo_eje_territorial,
         'A' AS estado,
         DATE '1995-07-01' AS fecha_creacion,
         DATE '1995-07-01' AS fecha_modificacion
  FROM stage_m_ng1 AS de
  JOIN stage_m_pais AS p ON (de.id_pais = p.cod_pais)
  WHERE (de.cod_ng1 IS NOT NULL)
),
step_m_eje_territorial___union AS (
  (SELECT *
  FROM step_m_eje_territorial_df_ng2)
  UNION ALL
  (SELECT * FROM step_m_eje_territorial_df_ng1)
),
step_m_eje_territorial___union__2 AS (
  (SELECT *
  FROM step_m_eje_territorial_df_ng3__2)
  UNION ALL
  (SELECT * FROM step_m_eje_territorial___union)
),
step_m_eje_territorial_df_dom_m_eje_territorial AS (
  SELECT DISTINCT *
  FROM (
  (SELECT *
  FROM step_m_eje_territorial_df_ng4__2)
  UNION ALL
  (SELECT * FROM step_m_eje_territorial___union__2)
  )
),
step_m_eje_territorial_df_dom_m_eje_territorial__2 AS (
  SELECT CAST(id_eje_territorial AS VARCHAR) AS id_eje_territorial,
         CAST(id_eje_territorial_padre AS VARCHAR) AS id_eje_territorial_padre,
         CAST(id_pais AS VARCHAR) AS id_pais,
         CAST(cod_eje_territorial AS VARCHAR) AS cod_eje_territorial,
         CAST(cod_eje_territorial_ref AS VARCHAR) AS cod_eje_territorial_ref,
         CAST(nomb_eje_territorial AS VARCHAR) AS nomb_eje_territorial,
         CAST(cod_tipo_eje_territorial AS VARCHAR) AS cod_tipo_eje_territorial,
         CAST(estado AS VARCHAR) AS estado,
         CAST(fecha_creacion AS DATE) AS fecha_creacion,
         CAST(fecha_modificacion AS DATE) AS fecha_modificacion
  FROM step_m_eje_territorial_df_dom_m_eje_territorial
),
job_m_eje_territorial AS (
  SELECT * FROM step_m_eje_territorial_df_dom_m_eje_territorial__2
),
step_m_modelo_atencion_df_dom_m_modelo_atencion AS (
  SELECT CAST(id_modelo_atencion AS VARCHAR) AS id_modelo_atencion,
         CAST(id_pais AS VARCHAR) AS id_pais,
         CAST(cod_modelo_atencion AS VARCHAR) AS cod_modelo_atencion,
         CAST(desc_modelo_atencion AS VARCHAR) AS desc_modelo_atencion,
         CAST(fecha_creacion AS DATE) AS fecha_creacion,
         CAST(fecha_modificacion AS DATE) AS fecha_modificacion
  FROM (
  SELECT DISTINCT *
  FROM (
  SELECT concat_ws('|', trim(mma.id_compania), trim(CAST(mma.cod_modelo_atencion AS VARCHAR))) AS id_modelo_atencion,
         mp.id_pais AS id_pais,
         mma.cod_modelo_atencion AS cod_modelo_atencion,
         mma.desc_modelo_atencion AS desc_modelo_atencion,
         DATE '1995-07-01' AS fecha_creacion,
         DATE '1995-07-01' AS fecha_modificacion
  FROM stage_m_modelo_atencion AS mma
  JOIN stage_m_compania AS mc ON (mma.id_compania = mc.cod_compania)
  JOIN stage_m_pais AS mp ON (mc.cod_pais = mp.cod_pais)
  )
  )
),
job_m_modelo_atencion AS (
  SELECT * FROM step_m_modelo_atencion_df_dom_m_modelo_atencion
),
step_m_modulo_df_tmp_modulo AS (
  SELECT mm.id_modulo AS id_modulo,
         mp.id_pais AS id_pais,
         concat_ws('|', trim(mm.cod_compania), trim(mm.cod_sucursal)) AS id_sucursal,
         concat_ws('|', trim(mm.cod_compania), trim(mm.cod_sucursal), CAST(mm.cod_fuerza_venta AS VARCHAR), CAST(mm.cod_ruta AS VARCHAR)) AS id_estructura_comercial,
         CAST(mm.cod_modulo AS VARCHAR) AS cod_modulo,
         mm.desc_modulo AS desc_modulo,
         concat_ws('|', trim(mm.cod_compania), trim(mrd.cod_modelo_atencion)) AS id_modelo_atencion,
         NULL AS periodo_visita,
         NULL AS desc_fuerza_venta,
         ms.es_activo AS estado,
         DATE '1995-07-01' AS fecha_creacion,
         DATE '1995-07-01' AS fecha_modificacion
  FROM stage_m_modulo AS mm
  JOIN stage_m_sucursal AS ms ON ((ms.cod_compania = mm.cod_compania) AND (ms.cod_sucursal = mm.cod_sucursal))
  JOIN stage_m_compania AS mc ON (ms.cod_compania = mc.cod_compania)
  JOIN stage_m_ruta AS mrd ON ((((mrd.cod_compania = mm.cod_compania) AND (mrd.cod_sucursal = mm.cod_sucursal)) AND (mrd.cod_fuerza_venta = mm.cod_fuerza_venta)) AND (mrd.cod_ruta = mm.cod_ruta))
  JOIN stage_m_pais AS mp ON (mc.cod_pais = mp.cod_pais)
),
step_m_modulo_df_dom_m_modulo AS (
  SELECT CAST(a.id_modulo AS VARCHAR) AS id_modulo,
         CAST(a.id_pais AS VARCHAR) AS id_pais,
         CAST(a.id_sucursal AS VARCHAR) AS id_sucursal,
         CAST(a.id_estructura_comercial AS VARCHAR) AS id_estructura_comercial,
         CAST(coalesce(a.id_modelo_atencion, NULL) AS VARCHAR) AS id_modelo_atencion,
         CAST(a.cod_modulo AS VARCHAR) AS cod_modulo,
         CAST(a.desc_modulo AS VARCHAR) AS desc_modulo,
         CAST(a.desc_fuerza_venta AS VARCHAR) AS desc_fuerza_venta,
         CAST(a.periodo_visita AS VARCHAR) AS periodo_visita,
         CAST(a.estado AS VARCHAR) AS estado,
         CAST(a.fecha_creacion AS DATE) AS fecha_creacion,
         CAST(a.fecha_modificacion AS DATE) AS fecha_modificacion
  FROM step_m_modulo_df_tmp_modulo AS a
),
job_m_modulo AS (
  SELECT * FROM step_m_modulo_df_dom_m_modulo
),
step_dim_cliente_df_m_asignacion_modulo_filter AS (
  SELECT row_number() OVER (PARTITION BY id_cliente ORDER BY orden_modelo_atencion ASC, fecha_creacion DESC) AS orden,
         id_cliente AS id_cliente,
         id_modulo AS id_modulo,
         frecuencia_visita AS frecuencia_visita,
         periodo_visita AS periodo_visita
  FROM (
  SELECT mam.id_cliente AS id_cliente,
         mm.id_modulo AS id_modulo,
         mam.frecuencia_visita AS frecuencia_visita,
         mam.periodo_visita AS periodo_visita,
         CASE WHEN (mma.desc_modelo_atencion = 'Pre Venta') THEN 1 WHEN (mma.desc_modelo_atencion = 'Especializado') THEN 2 WHEN (mma.desc_modelo_atencion = 'Auto Venta') THEN 3 WHEN (mma.desc_modelo_atencion = 'Televenta') THEN 4 ELSE 5 END AS orden_modelo_atencion,
         mm.fecha_creacion AS fecha_creacion
  FROM job_m_asignacion_modulo AS mam
  LEFT JOIN job_m_modulo AS mm ON (mm.id_modulo = mam.id_modulo)
  LEFT JOIN job_m_modelo_atencion AS mma ON (mma.id_modelo_atencion = mm.id_modelo_atencion)
  WHERE ((es_activo = 1) AND (es_eliminado = 0))
  )
),
step_dim_cliente_df_m_cliente_select AS (
  SELECT mc.id_cliente AS id_cliente,
         mc.id_pais AS id_pais,
         mc.id_sucursal AS id_sucursal,
         dc.id_modulo AS id_estructura_comercial,
         mc.id_clasificacion_cliente AS id_clasificacion_cliente,
         mc.id_eje_territorial AS id_eje_territorial,
         mc.id_lista_precio AS id_lista_precio,
         mc.cod_cliente AS cod_cliente,
         mc.nomb_cliente AS nomb_cliente,
         mc.cod_segmento AS cod_segmento,
         mc.desc_subsegmento AS desc_subsegmento,
         mc.cod_cliente_ref AS cod_cliente_ref,
         mc.cod_cliente_ref2 AS cod_cliente_ref2,
         mc.cod_cliente_ref3 AS cod_cliente_ref3,
         mc.cod_cliente_ref4 AS cod_cliente_ref4,
         mc.cod_tipo_cliente AS cod_tipo_cliente,
         mc.cod_cuenta_clave AS cod_cuenta_clave,
         mc.nomb_cuenta_clave AS nomb_cuenta_clave,
         mc.desc_canal_local AS desc_canal_local,
         mc.desc_giro_local AS desc_giro_local,
         mc.direccion AS direccion,
         mc.nro_documento AS nro_documento,
         mc.cod_cliente_principal AS cod_cliente_principal,
         mc.cod_cliente_transferencia AS cod_cliente_transferencia,
         met.cod_eje_territorial AS cod_eje_territorial,
         mc.coord_x AS coordx,
         mc.coord_y AS coordy,
         mc.fecha_creacion AS fecha_creacion,
         mc.fecha_baja AS fecha_baja,
         mc.estado AS estado
  FROM job_m_cliente AS mc
  LEFT JOIN step_dim_cliente_df_m_asignacion_modulo_filter AS dc ON ((mc.id_cliente = dc.id_cliente) AND (dc.orden = 1))
  LEFT JOIN job_m_eje_territorial AS met ON (mc.id_eje_territorial = met.id_eje_territorial)
),
step_dim_cliente_df_dim_cliente AS (
  SELECT CAST(id_cliente AS VARCHAR) AS id_cliente,
         CAST(id_pais AS VARCHAR) AS id_pais,
         CAST(id_sucursal AS VARCHAR) AS id_sucursal,
         CAST(id_estructura_comercial AS VARCHAR) AS id_estructura_comercial,
         CAST(id_clasificacion_cliente AS VARCHAR) AS id_clasificacion_cliente,
         CAST(id_eje_territorial AS VARCHAR) AS id_eje_territorial,
         CAST(id_lista_precio AS VARCHAR) AS id_lista_precio,
         CAST(cod_cliente AS VARCHAR) AS cod_cliente,
         CAST(nomb_cliente AS VARCHAR) AS nomb_cliente,
         CAST(cod_segmento AS VARCHAR) AS cod_segmento,
         CAST(desc_subsegmento AS VARCHAR) AS desc_subsegmento,
         CAST(cod_cliente_ref AS VARCHAR) AS cod_cliente_ref,
         CAST(cod_cliente_ref2 AS VARCHAR) AS cod_cliente_ref2,
         CAST(cod_cliente_ref3 AS VARCHAR) AS cod_cliente_ref3,
         CAST(cod_cliente_ref4 AS VARCHAR) AS cod_cliente_ref4,
         CAST(cod_tipo_cliente AS VARCHAR) AS cod_tipo_cliente,
         CAST(cod_cuenta_clave AS VARCHAR) AS cod_cuenta_clave,
         CAST(nomb_cuenta_clave AS VARCHAR) AS nomb_cuenta_clave,
         CAST(desc_canal_local AS VARCHAR) AS desc_canal_local,
         CAST(desc_giro_local AS VARCHAR) AS desc_giro_local,
         CAST(direccion AS VARCHAR) AS direccion,
         CAST(nro_documento AS VARCHAR) AS nro_documento,
         CAST(cod_cliente_principal AS VARCHAR) AS cod_cliente_principal,
         CAST(cod_cliente_transferencia AS VARCHAR) AS cod_cliente_transferencia,
         CAST(cod_eje_territorial AS VARCHAR) AS cod_eje_territorial,
         CAST(coordx AS VARCHAR) AS coordx,
         CAST(coordy AS VARCHAR) AS coordy,
         CAST(fecha_creacion AS TIMESTAMP) AS fecha_creacion,
         CAST(fecha_baja AS TIMESTAMP) AS fecha_baja,
         CAST(estado AS VARCHAR) AS estado
  FROM step_dim_cliente_df_m_cliente_select
),
job_dim_cliente AS (
  SELECT * FROM step_dim_cliente_df_dim_cliente
),
step_m_articulo_df_dom_m_articulo AS (
  SELECT CAST((ma.cod_compania || '|' || ma.cod_articulo) AS VARCHAR) AS id_articulo,
         CAST(mp.id_pais AS VARCHAR) AS id_pais,
         CAST(NULL AS VARCHAR) AS id_articulo_ref,
         CAST(ma.cod_articulo AS VARCHAR) AS cod_articulo,
         CAST(CASE WHEN (coalesce(ma.cod_articulo_corp, '0') = 0) THEN ma.cod_articulo ELSE ma.cod_articulo_corp END AS VARCHAR) AS cod_articulo_corp,
         CAST((ma.cod_compania || '|' || CASE WHEN (coalesce(ma.cod_articulo_corp, '0') = 0) THEN ma.cod_articulo ELSE ma.cod_articulo_corp END) AS VARCHAR) AS id_articulo_corp,
         CAST(NULL AS VARCHAR) AS cod_articulo_ref,
         CAST(NULL AS VARCHAR) AS cod_articulo_ref2,
         CAST(NULL AS VARCHAR) AS cod_articulo_ref3,
         CAST(ma.desc_articulo_corp AS VARCHAR) AS desc_articulo_corp,
         CAST(ma.desc_articulo AS VARCHAR) AS desc_articulo,
         CAST(coalesce(mca.cod_categoria, '000') AS VARCHAR) AS cod_categoria,
         CAST(coalesce(mca.desc_categoria, 'CATEGORIA DEFAULT') AS VARCHAR) AS desc_categoria,
         CAST(coalesce(mm.cod_marca, '000') AS VARCHAR) AS cod_marca,
         CAST(coalesce(mm.desc_marca, 'MARCA DEFAULT') AS VARCHAR) AS desc_marca,
         CAST(coalesce(mfo.cod_formato, '000') AS VARCHAR) AS cod_formato,
         CAST(coalesce(mfo.desc_formato, 'FORMATO DEFAULT') AS VARCHAR) AS desc_formato,
         CAST(coalesce(msa.cod_sabor, '000') AS VARCHAR) AS cod_sabor,
         CAST(coalesce(msa.desc_sabor, 'SABOR DEFAULT') AS VARCHAR) AS desc_sabor,
         CAST(coalesce(mpr.cod_presentacion, '000') AS VARCHAR) AS cod_presentacion,
         CAST(coalesce(mpr.desc_presentacion, 'PRESENTACION DEFAULT') AS VARCHAR) AS desc_presentacion,
         CAST(coalesce(mte.cod_tipo_envase, '000') AS VARCHAR) AS cod_tipo_envase,
         CAST(coalesce(mte.desc_tipo_envase, 'TIPO ENVASE DEFAULT') AS VARCHAR) AS desc_tipo_envase,
         CAST('000' AS VARCHAR) AS cod_aroma,
         CAST('AROMA DEFAULT' AS VARCHAR) AS desc_aroma,
         CAST('000' AS VARCHAR) AS cod_gasificado,
         CAST('GASIFICADO DEFAULT' AS VARCHAR) AS desc_gasificado,
         CAST(coalesce(ml.cod_linea, '00') AS VARCHAR) AS cod_linea,
         CAST(coalesce(ml.desc_linea, 'LINEA DEFAULT') AS VARCHAR) AS desc_linea,
         CAST(coalesce(ml.flg_linea, 'N') AS VARCHAR) AS flg_linea,
         CAST(coalesce(ma.es_explosion, 'N') AS VARCHAR) AS flg_explosion,
         CAST(coalesce(mf.cod_familia, '000') AS VARCHAR) AS cod_familia,
         CAST(coalesce(mf.desc_familia, 'FAMILIA DEFAULT') AS VARCHAR) AS desc_familia,
         CAST(coalesce(ms.cod_subfamilia, '00') AS VARCHAR) AS cod_subfamilia,
         CAST(coalesce(ms.desc_subfamilia, 'SUBFAMILIA DEFAULT') AS VARCHAR) AS desc_subfamilia,
         CAST(NULL AS VARCHAR) AS cod_unidad_negocio,
         CAST(NULL AS VARCHAR) AS desc_unidad_negocio,
         CAST(CASE WHEN ((coalesce(ml.cod_linea, '00') = '03') AND (coalesce(mf.cod_familia, '000') = '003')) THEN 1 ELSE 0 END AS INT) AS flg_jarabe,
         CAST(CASE WHEN ((coalesce(ml.cod_linea, '00') = '04') AND (coalesce(mf.cod_familia, '000') = '008')) THEN 1 ELSE 0 END AS INT) AS flg_co2,
         CAST(CASE WHEN ((coalesce(ml.cod_linea, '00') = '04') AND (coalesce(mf.cod_familia, '000') = '001')) THEN 1 ELSE 0 END AS INT) AS flg_azucar,
         CAST(CASE WHEN ((coalesce(ml.cod_linea, '00') = '03') AND (coalesce(mf.cod_familia, '000') = '002')) THEN 1 ELSE 0 END AS INT) AS flg_jarabe_conver,
         CAST(ma.unidad_compra AS VARCHAR) AS cod_unidad_compra,
         CAST(ma.unidad_manejo AS VARCHAR) AS cod_unidad_manejo,
         CAST(ma.unidad_volumen AS VARCHAR) AS cod_unidad_volumen,
         CAST(ma.cant_unidad_peso AS VARCHAR) AS cant_unidad_peso,
         CAST(ma.cant_unidad_volumen AS DECIMAL(38,12)) AS cant_unidad_volumen,
         CAST(ma.cant_unidad_paquete AS DECIMAL(38,12)) AS cant_unidad_paquete,
         CAST(ma.cant_paquete_caja AS DECIMAL(38,12)) AS cant_paquete_caja,
         CAST(ma.cant_cajas_por_palet AS DECIMAL(38,12)) AS cant_cajas_por_palet,
         CAST(ma.es_activo AS VARCHAR) AS es_activo,
         CAST(ma.flgskuplan AS VARCHAR) AS flgskuplan,
         CAST(ma.fecha_creacion AS TIMESTAMP) AS fecha_creacion,
         CAST(ma.fecha_modificacion AS TIMESTAMP) AS fecha_modificacion
  FROM stage_m_articulo AS ma
  JOIN stage_m_compania AS mc ON (ma.cod_compania = mc.cod_compania)
  LEFT JOIN stage_m_pais AS mp ON (mp.cod_pais = mc.cod_pais)
  LEFT JOIN stage_m_linea AS ml ON ((ma.cod_compania = ml.cod_compania) AND (ma.cod_linea = ml.cod_linea))
  LEFT JOIN stage_m_familia AS mf ON (((ma.cod_compania = mf.cod_compania) AND (ma.cod_linea = mf.cod_linea)) AND (ma.cod_familia = mf.cod_familia))
  LEFT JOIN stage_m_subfamilia AS ms ON ((((ma.cod_compania = ms.cod_compania) AND (ma.cod_linea = ms.cod_linea)) AND (ma.cod_familia = ms.cod_familia)) AND (ma.cod_subfamilia = ms.cod_subfamilia))
  LEFT JOIN stage_m_marca AS mm ON ((ma.cod_compania = mm.cod_compania) AND (ma.cod_marca = mm.cod_marca))
  LEFT JOIN stage_m_presentacion AS mpr ON ((ma.cod_compania = mpr.cod_compania) AND (ma.cod_presentacion = mpr.cod_presentacion))
  LEFT JOIN stage_m_formato AS mfo ON ((ma.cod_compania = mfo.cod_compania) AND (ma.cod_formato = mfo.cod_formato))
  LEFT JOIN stage_m_sabor AS msa ON ((ma.cod_compania = msa.cod_compania) AND (ma.cod_sabor = msa.cod_sabor))
  LEFT JOIN stage_m_categoria AS mca ON ((ma.cod_compania = mca.cod_compania) AND (ma.cod_categoria = mca.cod_categoria))
  LEFT JOIN stage_m_tipo_envase AS mte ON ((ma.cod_compania = mte.cod_compania) AND (ma.cod_tipo_envase = mte.cod_tipo_envase))
),
job_m_articulo AS (
  SELECT * FROM step_m_articulo_df_dom_m_articulo
),
step_dim_producto_df_dim_producto AS (
  SELECT CAST(id_articulo AS VARCHAR) AS id_producto,
         CAST(id_pais AS VARCHAR) AS id_pais,
         CAST(cod_articulo AS VARCHAR) AS cod_producto,
         CAST(desc_articulo AS VARCHAR) AS desc_producto,
         CAST(desc_articulo_corp AS VARCHAR) AS desc_articulo_corp,
         CAST(cod_categoria AS VARCHAR) AS cod_categoria,
         CAST(desc_categoria AS VARCHAR) AS desc_categoria,
         CAST(cod_marca AS VARCHAR) AS cod_marca,
         CAST(desc_marca AS VARCHAR) AS desc_marca,
         CAST(cod_presentacion AS VARCHAR) AS cod_presentacion,
         CAST(desc_presentacion AS VARCHAR) AS desc_presentacion,
         CAST(cod_formato AS VARCHAR) AS cod_formato,
         CAST(desc_formato AS VARCHAR) AS desc_formato,
         CAST(cod_sabor AS VARCHAR) AS cod_sabor,
         CAST(desc_sabor AS VARCHAR) AS desc_sabor,
         CAST(cod_tipo_envase AS VARCHAR) AS cod_tipo_envase,
         CAST(desc_tipo_envase AS VARCHAR) AS desc_tipo_envase,
         CAST(cod_unidad_negocio AS VARCHAR) AS cod_unidad_negocio,
         CAST(desc_unidad_negocio AS VARCHAR) AS desc_unidad_negocio,
         CAST(cod_unidad_manejo AS VARCHAR) AS cod_unidad_paquete,
         CAST(cod_unidad_volumen AS DECIMAL(38,12)) AS cod_unidad_volumen,
         CAST(cant_unidad_paquete AS DECIMAL(38,12)) AS cant_unidad_paquete,
         CAST(cant_unidad_volumen AS DECIMAL(38,12)) AS cant_unidad_volumen,
         CAST(es_activo AS INT) AS es_activo
  FROM job_m_articulo
),
job_dim_producto AS (
  SELECT * FROM step_dim_producto_df_dim_producto
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
step_fact_cliente_venta_df_t_venta AS (
  SELECT *
  FROM job_t_venta
  WHERE (id_periodo IN ('199504', '199505', '199506'))
),
step_fact_cliente_venta_df_t_venta_detalle AS (
  SELECT *
  FROM job_t_venta_detalle
  WHERE (id_periodo IN ('199504', '199505', '199506'))
),
step_fact_cliente_venta_tmp_aux_cantidades_general AS (
  SELECT id_pais AS id_pais,
         id_periodo AS id_periodo,
         id_compania AS id_compania,
         id_cliente AS id_cliente,
         cod_modulo AS cod_modulo,
         cant_caja_fisica_ven AS cant_caja_fisica_ven,
         cant_caja_unitaria_ven AS cant_caja_unitaria_ven,
         cant_caja_fisica_pro AS cant_caja_fisica_pro,
         cant_caja_unitaria_pro AS cant_caja_unitaria_pro,
         imp_neto_mn AS imp_neto_mn,
         imp_neto_me AS imp_neto_me,
         imp_bruto_mn AS imp_bruto_mn,
         imp_bruto_me AS imp_bruto_me,
         cant_producto AS cant_producto,
         cant_marca AS cant_marca,
         cant_venta AS cant_venta,
         ult_fecha_compra_cliente AS ult_fecha_compra_cliente,
         ult_dia_compra_cliente AS ult_dia_compra_cliente
  FROM (
  SELECT __p0 AS id_pais,
         __p1 AS id_periodo,
         __p2 AS id_compania,
         __p3 AS id_cliente,
         __p4 AS cod_modulo,
         CAST((CASE WHEN (CASE WHEN abs(__agg0) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg0 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg0) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg0 END)) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg0) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg0 END)) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_caja_fisica_ven,
         CAST((CASE WHEN (CASE WHEN abs(__q4) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __q4 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__q4) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __q4 END)) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__q4) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __q4 END)) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_caja_unitaria_ven,
         CAST((CASE WHEN (CASE WHEN abs(__agg2) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg2 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg2) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg2 END)) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg2) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg2 END)) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_caja_fisica_pro,
         CAST((CASE WHEN (CASE WHEN abs(__q9) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __q9 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__q9) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __q9 END)) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__q9) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __q9 END)) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_caja_unitaria_pro,
         CAST((CASE WHEN (CASE WHEN abs(__agg4) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg4 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg4) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg4 END)) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg4) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg4 END)) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS imp_neto_mn,
         CAST((CASE WHEN (CASE WHEN abs(__agg5) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg5 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg5) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg5 END)) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg5) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg5 END)) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS imp_neto_me,
         CAST((CASE WHEN (CASE WHEN abs(__agg6) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg6 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg6) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg6 END)) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg6) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg6 END)) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS imp_bruto_mn,
         CAST((CASE WHEN (CASE WHEN abs(__agg7) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg7 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg7) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg7 END)) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg7) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg7 END)) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS imp_bruto_me,
         __agg8 AS cant_producto,
         __agg9 AS cant_marca,
         __agg10 AS cant_venta,
         __agg11 AS ult_fecha_compra_cliente,
         date_diff('day', __agg12, DATE '1995-07-01') AS ult_dia_compra_cliente
  FROM (
  SELECT *,
         (CASE WHEN __q2 = 0 THEN NULL ELSE (CASE WHEN (__q3 < 0) != (__q2 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__q3) + abs(__q2)) // (2::HUGEINT * abs(__q2))) END) AS __q4,
         (CASE WHEN __q7 = 0 THEN NULL ELSE (CASE WHEN (__q8 < 0) != (__q7 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__q8) + abs(__q7)) // (2::HUGEINT * abs(__q7))) END) AS __q9
  FROM (
  SELECT *,
         (CASE WHEN abs(__agg1) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg1 END) AS __q0,
         (CAST(30 AS HUGEINT)) AS __q1,
         (CASE WHEN abs(__q1) >= 100::HUGEINT THEN NULL ELSE __q1 END) AS __q2,
         (__q0 * 1::HUGEINT) AS __q3,
         (CASE WHEN abs(__agg3) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg3 END) AS __q5,
         (CAST(30 AS HUGEINT)) AS __q6,
         (CASE WHEN abs(__q6) >= 100::HUGEINT THEN NULL ELSE __q6 END) AS __q7,
         (__q5 * 1::HUGEINT) AS __q8
  FROM (
  SELECT __p0,
         __p1,
         __p2,
         __p3,
         __p4,
         sum(__p5) AS __agg0,
         sum(__p6) AS __agg1,
         sum(__p7) AS __agg2,
         sum(__p8) AS __agg3,
         sum(__p9) AS __agg4,
         sum(__p10) AS __agg5,
         sum(__p11) AS __agg6,
         sum(__p12) AS __agg7,
         CAST(count(DISTINCT __p13) AS BIGINT) AS __agg8,
         CAST(count(DISTINCT __p14) AS BIGINT) AS __agg9,
         CAST(count(DISTINCT __p15) AS BIGINT) AS __agg10,
         max(__p16) AS __agg11,
         max(__p16) AS __agg12
  FROM (
  SELECT tv.id_pais AS __p0,
         tv.id_periodo AS __p1,
         tv.id_compania AS __p2,
         tv.id_cliente AS __p3,
         tv.cod_modulo AS __p4,
         CAST(replace(CAST(tvd.cant_caja_fisica_ven AS VARCHAR), '.', '') AS HUGEINT) AS __p5,
         CAST(replace(CAST(tvd.cant_caja_volumen_ven AS VARCHAR), '.', '') AS HUGEINT) AS __p6,
         CAST(replace(CAST(tvd.cant_caja_fisica_pro AS VARCHAR), '.', '') AS HUGEINT) AS __p7,
         CAST(replace(CAST(tvd.cant_caja_volumen_pro AS VARCHAR), '.', '') AS HUGEINT) AS __p8,
         CAST(replace(CAST(tvd.imp_neto_vta_mn AS VARCHAR), '.', '') AS HUGEINT) AS __p9,
         CAST(replace(CAST(tvd.imp_neto_vta_me AS VARCHAR), '.', '') AS HUGEINT) AS __p10,
         CAST(replace(CAST(tvd.imp_cobrar_vta_mn AS VARCHAR), '.', '') AS HUGEINT) AS __p11,
         CAST(replace(CAST(tvd.imp_cobrar_vta_me AS VARCHAR), '.', '') AS HUGEINT) AS __p12,
         tvd.id_producto AS __p13,
         dp.desc_marca AS __p14,
         tv.id_venta AS __p15,
         tv.fecha_liquidacion AS __p16
  FROM step_fact_cliente_venta_df_t_venta AS tv
  JOIN step_fact_cliente_venta_df_t_venta_detalle AS tvd ON ((tv.id_venta = tvd.id_venta) AND (tv.es_eliminado = 0))
  LEFT JOIN job_dim_producto AS dp ON (tvd.id_producto = dp.id_producto)
  
  )
  GROUP BY __p0, __p1, __p2, __p3, __p4
  )
  )
  )
  )
),
step_fact_cliente_venta_tmp_fact_cliente_venta_metricas_general_3meses AS (
  SELECT id_pais AS id_pais,
         id_periodo AS id_periodo,
         id_compania AS id_compania,
         id_cliente AS id_cliente,
         cod_modulo AS cod_modulo,
         cant_caja_fisica_ven_3meses AS cant_caja_fisica_ven_3meses,
         cant_caja_unitaria_ven_3meses AS cant_caja_unitaria_ven_3meses,
         cant_caja_fisica_pro_3meses AS cant_caja_fisica_pro_3meses,
         cant_caja_unitaria_pro_3meses AS cant_caja_unitaria_pro_3meses,
         imp_neto_mn_3meses AS imp_neto_mn_3meses,
         imp_neto_me_3meses AS imp_neto_me_3meses,
         imp_bruto_mn_3meses AS imp_bruto_mn_3meses,
         imp_bruto_me_3meses AS imp_bruto_me_3meses
  FROM (
  SELECT current.id_pais,
         current.id_periodo,
         current.id_compania,
         current.id_cliente,
         current.cod_modulo,
         coalesce(sum(past.cant_caja_fisica_ven), '0') AS cant_caja_fisica_ven_3meses,
         coalesce(sum(past.cant_caja_unitaria_ven), '0') AS cant_caja_unitaria_ven_3meses,
         coalesce(sum(past.cant_caja_fisica_pro), '0') AS cant_caja_fisica_pro_3meses,
         coalesce(sum(past.cant_caja_unitaria_pro), '0') AS cant_caja_unitaria_pro_3meses,
         coalesce(sum(past.imp_neto_mn), '0') AS imp_neto_mn_3meses,
         coalesce(sum(past.imp_neto_me), '0') AS imp_neto_me_3meses,
         coalesce(sum(past.imp_bruto_mn), '0') AS imp_bruto_mn_3meses,
         coalesce(sum(past.imp_bruto_me), '0') AS imp_bruto_me_3meses
  FROM step_fact_cliente_venta_tmp_aux_cantidades_general AS current
  LEFT JOIN step_fact_cliente_venta_tmp_aux_cantidades_general AS past ON (((current.id_pais = past.id_pais) AND (CAST(try_strptime(CAST(past.id_periodo AS VARCHAR), '%Y%m') AS DATE) BETWEEN (CAST(try_strptime(CAST(current.id_periodo AS VARCHAR), '%Y%m') AS DATE) + to_months(CAST((- 3) AS INT))) AND CAST(try_strptime(CAST(current.id_periodo AS VARCHAR), '%Y%m') AS DATE))) AND (past.id_cliente = current.id_cliente))
  GROUP BY current.id_pais, current.id_periodo, current.id_compania, current.id_cliente, current.cod_modulo
  )
),
step_fact_cliente_venta_tmp_fact_cliente_venta_metricas_general_12meses AS (
  SELECT id_pais AS id_pais,
         id_periodo AS id_periodo,
         id_compania AS id_compania,
         id_cliente AS id_cliente,
         cod_modulo AS cod_modulo,
         cant_caja_fisica_ven_12meses AS cant_caja_fisica_ven_12meses,
         cant_caja_unitaria_ven_12meses AS cant_caja_unitaria_ven_12meses,
         cant_caja_fisica_pro_12meses AS cant_caja_fisica_pro_12meses,
         cant_caja_unitaria_pro_12meses AS cant_caja_unitaria_pro_12meses,
         imp_neto_mn_12meses AS imp_neto_mn_12meses,
         imp_neto_me_12meses AS imp_neto_me_12meses,
         imp_bruto_mn_12meses AS imp_bruto_mn_12meses,
         imp_bruto_me_12meses AS imp_bruto_me_12meses
  FROM (
  SELECT current.id_pais,
         current.id_periodo,
         current.id_compania,
         current.id_cliente,
         current.cod_modulo,
         coalesce(sum(past.cant_caja_fisica_ven), '0') AS cant_caja_fisica_ven_12meses,
         coalesce(sum(past.cant_caja_unitaria_ven), '0') AS cant_caja_unitaria_ven_12meses,
         coalesce(sum(past.cant_caja_fisica_pro), '0') AS cant_caja_fisica_pro_12meses,
         coalesce(sum(past.cant_caja_unitaria_pro), '0') AS cant_caja_unitaria_pro_12meses,
         coalesce(sum(past.imp_neto_mn), '0') AS imp_neto_mn_12meses,
         coalesce(sum(past.imp_neto_me), '0') AS imp_neto_me_12meses,
         coalesce(sum(past.imp_bruto_mn), '0') AS imp_bruto_mn_12meses,
         coalesce(sum(past.imp_bruto_me), '0') AS imp_bruto_me_12meses
  FROM step_fact_cliente_venta_tmp_aux_cantidades_general AS current
  LEFT JOIN step_fact_cliente_venta_tmp_aux_cantidades_general AS past ON (((current.id_pais = past.id_pais) AND (CAST(try_strptime(CAST(past.id_periodo AS VARCHAR), '%Y%m') AS DATE) BETWEEN (CAST(try_strptime(CAST(current.id_periodo AS VARCHAR), '%Y%m') AS DATE) + to_months(CAST((- 12) AS INT))) AND CAST(try_strptime(CAST(current.id_periodo AS VARCHAR), '%Y%m') AS DATE))) AND (past.id_cliente = current.id_cliente))
  GROUP BY current.id_pais, current.id_periodo, current.id_compania, current.id_cliente, current.cod_modulo
  )
),
step_fact_cliente_venta_tmp_aux_cantidades_general_nn AS (
  SELECT id_pais AS id_pais,
         id_periodo AS id_periodo,
         id_compania AS id_compania,
         id_cliente AS id_cliente,
         cod_modulo AS cod_modulo,
         cant_caja_unitaria_ven AS cant_caja_unitaria_ven,
         imp_neto_mn AS imp_neto_mn,
         cant_marca AS cant_marca,
         cant_venta AS cant_venta,
         ult_fecha_compra_cliente AS ult_fecha_compra_cliente
  FROM (
  SELECT __p0 AS id_pais,
         __p1 AS id_periodo,
         __p2 AS id_compania,
         __p3 AS id_cliente,
         __p4 AS cod_modulo,
         CAST((CASE WHEN (CASE WHEN abs(__agg0) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg0 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg0) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg0 END)) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg0) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg0 END)) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS cant_caja_unitaria_ven,
         CAST((CASE WHEN (CASE WHEN abs(__agg1) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg1 END) < 0 THEN '-' ELSE '' END || CAST(abs((CASE WHEN abs(__agg1) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg1 END)) // 1000000000000::HUGEINT AS VARCHAR) || '.' || lpad(CAST(abs((CASE WHEN abs(__agg1) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __agg1 END)) % 1000000000000::HUGEINT AS VARCHAR), 12, '0')) AS DECIMAL(38,12)) AS imp_neto_mn,
         __agg2 AS cant_marca,
         __agg3 AS cant_venta,
         __agg4 AS ult_fecha_compra_cliente
  FROM (
  SELECT __p0,
         __p1,
         __p2,
         __p3,
         __p4,
         sum(__p10) AS __agg0,
         sum(__p11) AS __agg1,
         CAST(count(DISTINCT __p12) AS BIGINT) AS __agg2,
         CAST(count(DISTINCT __p13) AS BIGINT) AS __agg3,
         max(__p14) AS __agg4
  FROM (
  SELECT *,
         (CASE WHEN __p7 = 0 THEN NULL ELSE (CASE WHEN (__p8 < 0) != (__p7 < 0) THEN -1::HUGEINT ELSE 1::HUGEINT END) * ((2::HUGEINT * abs(__p8) + abs(__p7)) // (2::HUGEINT * abs(__p7))) END) AS __p9,
         (CASE WHEN abs(__p9) >= 100000000000000000000000000000000000000::HUGEINT THEN NULL ELSE __p9 END) AS __p10
  FROM (
  SELECT tv.id_pais AS __p0,
         tv.id_periodo AS __p1,
         tv.id_compania AS __p2,
         tv.id_cliente AS __p3,
         tv.cod_modulo AS __p4,
         CAST(replace(CAST(tvd.cant_caja_volumen_ven AS VARCHAR), '.', '') AS HUGEINT) AS __p5,
         (CAST(30 AS HUGEINT)) AS __p6,
         (CASE WHEN abs(__p6) >= 100::HUGEINT THEN NULL ELSE __p6 END) AS __p7,
         (__p5 * 1::HUGEINT) AS __p8,
         CAST(replace(CAST(tvd.imp_neto_vta_mn AS VARCHAR), '.', '') AS HUGEINT) AS __p11,
         dp.desc_marca AS __p12,
         tv.id_venta AS __p13,
         tv.fecha_liquidacion AS __p14
  FROM step_fact_cliente_venta_df_t_venta AS tv
  JOIN step_fact_cliente_venta_df_t_venta_detalle AS tvd ON (((tv.id_venta = tvd.id_venta) AND (tv.id_pais = tvd.id_pais)) AND (tvd.es_eliminado = 0))
  LEFT JOIN job_dim_producto AS dp ON ((tv.id_pais = dp.id_pais) AND (tvd.id_producto = dp.id_producto))
  WHERE (((tv.id_periodo IN ('199504', '199505', '199506')) AND (tvd.id_periodo IN ('199504', '199505', '199506'))) AND (dp.cod_unidad_negocio = '003'))
  )
  )
  GROUP BY __p0, __p1, __p2, __p3, __p4
  )
  )
),
step_fact_cliente_venta_tmp_fact_cliente_venta_metricas_general_3meses_nn AS (
  SELECT id_pais AS id_pais,
         id_periodo AS id_periodo,
         id_compania AS id_compania,
         id_cliente AS id_cliente,
         cod_modulo AS cod_modulo,
         cant_caja_unitaria_ven_3meses AS cant_caja_unitaria_ven_3meses,
         imp_neto_mn_3meses AS imp_neto_mn_3meses
  FROM (
  SELECT current.id_pais,
         current.id_periodo,
         current.id_compania,
         current.id_cliente,
         current.cod_modulo,
         coalesce(sum(past.cant_caja_unitaria_ven), '0') AS cant_caja_unitaria_ven_3meses,
         coalesce(sum(past.imp_neto_mn), '0') AS imp_neto_mn_3meses
  FROM step_fact_cliente_venta_tmp_aux_cantidades_general_nn AS current
  LEFT JOIN step_fact_cliente_venta_tmp_aux_cantidades_general_nn AS past ON (((((current.id_pais = past.id_pais) AND (CAST(try_strptime(CAST(past.id_periodo AS VARCHAR), '%Y%m') AS DATE) BETWEEN (CAST(try_strptime(CAST(current.id_periodo AS VARCHAR), '%Y%m') AS DATE) + to_months(CAST((- 3) AS INT))) AND CAST(try_strptime(CAST(current.id_periodo AS VARCHAR), '%Y%m') AS DATE))) AND (past.id_cliente = current.id_cliente)) AND (past.id_compania = current.id_compania)) AND (past.cod_modulo = current.cod_modulo))
  GROUP BY current.id_pais, current.id_periodo, current.id_compania, current.id_cliente, current.cod_modulo
  )
),
step_fact_cliente_venta_tmp_fact_cliente_venta_metricas_general_12meses_nn AS (
  SELECT id_pais AS id_pais,
         id_periodo AS id_periodo,
         id_compania AS id_compania,
         id_cliente AS id_cliente,
         cod_modulo AS cod_modulo,
         cant_caja_unitaria_ven_12meses AS cant_caja_unitaria_ven_12meses,
         imp_neto_mn_12meses AS imp_neto_mn_12meses
  FROM (
  SELECT current.id_pais,
         current.id_periodo,
         current.id_compania,
         current.id_cliente,
         current.cod_modulo,
         coalesce(sum(past.cant_caja_unitaria_ven), '0') AS cant_caja_unitaria_ven_12meses,
         coalesce(sum(past.imp_neto_mn), '0') AS imp_neto_mn_12meses
  FROM step_fact_cliente_venta_tmp_aux_cantidades_general_nn AS current
  LEFT JOIN step_fact_cliente_venta_tmp_aux_cantidades_general_nn AS past ON (((((current.id_pais = past.id_pais) AND (CAST(try_strptime(CAST(past.id_periodo AS VARCHAR), '%Y%m') AS DATE) BETWEEN (CAST(try_strptime(CAST(current.id_periodo AS VARCHAR), '%Y%m') AS DATE) + to_months(CAST((- 12) AS INT))) AND CAST(try_strptime(CAST(current.id_periodo AS VARCHAR), '%Y%m') AS DATE))) AND (past.id_cliente = current.id_cliente)) AND (past.id_compania = current.id_compania)) AND (past.cod_modulo = current.cod_modulo))
  GROUP BY current.id_pais, current.id_periodo, current.id_compania, current.id_cliente, current.cod_modulo
  )
),
step_fact_cliente_venta_df_fact_cliente_venta AS (
  SELECT CAST(fcv.id_pais AS VARCHAR) AS id_pais,
         CAST(fcv.id_periodo AS VARCHAR) AS id_periodo,
         CAST(fcv.id_compania AS VARCHAR) AS id_compania,
         CAST(fcv.id_cliente AS VARCHAR) AS id_cliente,
         CAST(fcv.cod_modulo AS VARCHAR) AS cod_modulo,
         CAST(fcv_3.cant_caja_fisica_ven_3meses AS DECIMAL(38,12)) AS cant_caja_fisica_ven_3meses,
         CAST(fcv_12.cant_caja_fisica_ven_12meses AS DECIMAL(38,12)) AS cant_caja_fisica_ven_12meses,
         CAST(fcv_3.cant_caja_unitaria_ven_3meses AS DECIMAL(38,12)) AS cant_caja_unitaria_ven_3meses,
         CAST(fcv_12.cant_caja_unitaria_ven_12meses AS DECIMAL(38,12)) AS cant_caja_unitaria_ven_12meses,
         CAST(fcv_3.cant_caja_fisica_pro_3meses AS DECIMAL(38,12)) AS cant_caja_fisica_pro_3meses,
         CAST(fcv_12.cant_caja_fisica_pro_12meses AS DECIMAL(38,12)) AS cant_caja_fisica_pro_12meses,
         CAST(fcv_3.cant_caja_unitaria_pro_3meses AS DECIMAL(38,12)) AS cant_caja_unitaria_pro_3meses,
         CAST(fcv_12.cant_caja_unitaria_pro_12meses AS DECIMAL(38,12)) AS cant_caja_unitaria_pro_12meses,
         CAST(fcv_3.imp_neto_mn_3meses AS DECIMAL(38,12)) AS imp_neto_mn_3meses,
         CAST(fcv_12.imp_neto_mn_12meses AS DECIMAL(38,12)) AS imp_neto_mn_12meses,
         CAST(fcv_3.imp_neto_me_3meses AS DECIMAL(38,12)) AS imp_neto_me_3meses,
         CAST(fcv_12.imp_neto_me_12meses AS DECIMAL(38,12)) AS imp_neto_me_12meses,
         CAST(fcv_3.imp_bruto_mn_3meses AS DECIMAL(38,12)) AS imp_bruto_mn_3meses,
         CAST(fcv_12.imp_bruto_mn_12meses AS DECIMAL(38,12)) AS imp_bruto_mn_12meses,
         CAST(fcv_3.imp_bruto_me_3meses AS DECIMAL(38,12)) AS imp_bruto_me_3meses,
         CAST(fcv_12.imp_bruto_me_12meses AS DECIMAL(38,12)) AS imp_bruto_me_12meses,
         CAST(fcv.cant_producto AS INT) AS cant_producto,
         CAST(fcv.cant_venta AS INT) AS cant_venta,
         CAST(fcv.cant_marca AS INT) AS cant_marca,
         CAST(fcv.ult_fecha_compra_cliente AS DATE) AS ult_fecha_compra_cliente,
         CAST(fcv.ult_dia_compra_cliente AS INT) AS ult_dia_compra_cliente,
         CAST(fcv_12_nn.cant_caja_unitaria_ven_12meses AS INT) AS cant_caja_unit_venta_12meses_nn,
         CAST(fcv_3_nn.cant_caja_unitaria_ven_3meses AS INT) AS cant_caja_unit_venta_3meses_nn,
         CAST(fcv_12_nn.imp_neto_mn_12meses AS DECIMAL(38,12)) AS imp_neto_mn_12meses_nn,
         CAST(fcv_3_nn.imp_neto_mn_3meses AS DECIMAL(38,12)) AS imp_neto_mn_3meses_nn,
         CAST(fcv_nn.ult_fecha_compra_cliente AS DATE) AS ult_fecha_compra_12meses_nn,
         CAST(fcv_nn.cant_venta AS INT) AS cant_venta_nn,
         CAST(fcv_nn.cant_marca AS INT) AS cant_marca_nn
  FROM step_fact_cliente_venta_tmp_aux_cantidades_general AS fcv
  LEFT JOIN step_fact_cliente_venta_tmp_fact_cliente_venta_metricas_general_3meses AS fcv_3 ON ((((fcv.id_pais = fcv_3.id_pais) AND (fcv.id_periodo = fcv_3.id_periodo)) AND (fcv.id_cliente = fcv_3.id_cliente)) AND (fcv.cod_modulo = fcv_3.cod_modulo))
  LEFT JOIN step_fact_cliente_venta_tmp_fact_cliente_venta_metricas_general_12meses AS fcv_12 ON ((((fcv.id_pais = fcv_12.id_pais) AND (fcv.id_periodo = fcv_12.id_periodo)) AND (fcv.id_cliente = fcv_12.id_cliente)) AND (fcv.cod_modulo = fcv_12.cod_modulo))
  LEFT JOIN step_fact_cliente_venta_tmp_aux_cantidades_general_nn AS fcv_nn ON ((((fcv.id_pais = fcv_nn.id_pais) AND (fcv.id_periodo = fcv_nn.id_periodo)) AND (fcv.id_cliente = fcv_nn.id_cliente)) AND (fcv.cod_modulo = fcv_nn.cod_modulo))
  LEFT JOIN step_fact_cliente_venta_tmp_fact_cliente_venta_metricas_general_3meses_nn AS fcv_3_nn ON ((((fcv.id_pais = fcv_3_nn.id_pais) AND (fcv.id_periodo = fcv_3_nn.id_periodo)) AND (fcv.id_cliente = fcv_3_nn.id_cliente)) AND (fcv.cod_modulo = fcv_3_nn.cod_modulo))
  LEFT JOIN step_fact_cliente_venta_tmp_fact_cliente_venta_metricas_general_12meses_nn AS fcv_12_nn ON ((((fcv.id_pais = fcv_12_nn.id_pais) AND (fcv.id_periodo = fcv_12_nn.id_periodo)) AND (fcv.id_cliente = fcv_12_nn.id_cliente)) AND (fcv.cod_modulo = fcv_12_nn.cod_modulo))
  WHERE (fcv.id_periodo IN ('199504', '199505', '199506'))
),
job_fact_cliente_venta AS (
  SELECT * FROM step_fact_cliente_venta_df_fact_cliente_venta
)
 SELECT id_pais,
       id_periodo,
       id_compania,
       id_cliente,
       cod_modulo,
       CAST(CAST(cant_caja_fisica_ven_3meses AS VARCHAR) AS DOUBLE) AS cant_caja_fisica_ven_3meses,
       CAST(CAST(cant_caja_fisica_ven_12meses AS VARCHAR) AS DOUBLE) AS cant_caja_fisica_ven_12meses,
       CAST(CAST(cant_caja_unitaria_ven_3meses AS VARCHAR) AS DOUBLE) AS cant_caja_unitaria_ven_3meses,
       CAST(CAST(cant_caja_unitaria_ven_12meses AS VARCHAR) AS DOUBLE) AS cant_caja_unitaria_ven_12meses,
       CAST(CAST(cant_caja_fisica_pro_3meses AS VARCHAR) AS DOUBLE) AS cant_caja_fisica_pro_3meses,
       CAST(CAST(cant_caja_fisica_pro_12meses AS VARCHAR) AS DOUBLE) AS cant_caja_fisica_pro_12meses,
       CAST(CAST(cant_caja_unitaria_pro_3meses AS VARCHAR) AS DOUBLE) AS cant_caja_unitaria_pro_3meses,
       CAST(CAST(cant_caja_unitaria_pro_12meses AS VARCHAR) AS DOUBLE) AS cant_caja_unitaria_pro_12meses,
       CAST(CAST(imp_neto_mn_3meses AS VARCHAR) AS DOUBLE) AS imp_neto_mn_3meses,
       CAST(CAST(imp_neto_mn_12meses AS VARCHAR) AS DOUBLE) AS imp_neto_mn_12meses,
       CAST(CAST(imp_neto_me_3meses AS VARCHAR) AS DOUBLE) AS imp_neto_me_3meses,
       CAST(CAST(imp_neto_me_12meses AS VARCHAR) AS DOUBLE) AS imp_neto_me_12meses,
       CAST(CAST(imp_bruto_mn_3meses AS VARCHAR) AS DOUBLE) AS imp_bruto_mn_3meses,
       CAST(CAST(imp_bruto_mn_12meses AS VARCHAR) AS DOUBLE) AS imp_bruto_mn_12meses,
       CAST(CAST(imp_bruto_me_3meses AS VARCHAR) AS DOUBLE) AS imp_bruto_me_3meses,
       CAST(CAST(imp_bruto_me_12meses AS VARCHAR) AS DOUBLE) AS imp_bruto_me_12meses,
       cant_producto,
       cant_venta,
       cant_marca,
       ult_fecha_compra_cliente,
       ult_dia_compra_cliente,
       cant_caja_unit_venta_12meses_nn,
       cant_caja_unit_venta_3meses_nn,
       CAST(CAST(imp_neto_mn_12meses_nn AS VARCHAR) AS DOUBLE) AS imp_neto_mn_12meses_nn,
       CAST(CAST(imp_neto_mn_3meses_nn AS VARCHAR) AS DOUBLE) AS imp_neto_mn_3meses_nn,
       ult_fecha_compra_12meses_nn,
       cant_venta_nn,
       cant_marca_nn FROM job_fact_cliente_venta