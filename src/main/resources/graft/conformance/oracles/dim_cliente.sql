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
)
 SELECT id_cliente,
       id_pais,
       id_sucursal,
       id_estructura_comercial,
       id_clasificacion_cliente,
       id_eje_territorial,
       id_lista_precio,
       cod_cliente,
       nomb_cliente,
       cod_segmento,
       desc_subsegmento,
       cod_cliente_ref,
       cod_cliente_ref2,
       cod_cliente_ref3,
       cod_cliente_ref4,
       cod_tipo_cliente,
       cod_cuenta_clave,
       nomb_cuenta_clave,
       desc_canal_local,
       desc_giro_local,
       direccion,
       nro_documento,
       cod_cliente_principal,
       cod_cliente_transferencia,
       cod_eje_territorial,
       coordx,
       coordy,
       fecha_creacion,
       fecha_baja,
       estado FROM job_dim_cliente