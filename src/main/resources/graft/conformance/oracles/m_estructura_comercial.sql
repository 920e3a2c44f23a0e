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
step_m_estructura_comercial_df_estructura_comercial_ruta AS (
  SELECT concat_ws('|', trim(mrd.cod_compania), trim(cod_sucursal), trim(CAST(cod_fuerza_venta AS VARCHAR)), trim(CAST(cod_ruta AS VARCHAR))) AS id_estructura_comercial,
         mp.id_pais AS id_pais,
         concat_ws('|', trim(mrd.cod_compania), trim(cod_sucursal)) AS id_sucursal,
         concat_ws('|', trim(mrd.cod_compania), trim(cod_sucursal), trim(CAST(cod_zona AS VARCHAR))) AS id_estructura_comercial_padre,
         concat_ws('|', trim(mrd.cod_compania), trim(CAST(cod_vendedor AS VARCHAR))) AS id_responsable_comercial,
         CAST(cod_ruta AS VARCHAR) AS cod_estructura_comercial,
         desc_ruta AS nomb_estructura_comercial,
         'Ruta' AS cod_tipo_estructura_comercial,
         mrd.es_activo AS estado,
         DATE '1995-07-01' AS fecha_creacion,
         DATE '1995-07-01' AS fecha_modificacion
  FROM stage_m_ruta AS mrd
  JOIN stage_m_compania AS mc ON (mrd.cod_compania = mc.cod_compania)
  JOIN stage_m_pais AS mp ON (mp.cod_pais = mc.cod_pais)
),
step_m_estructura_comercial_df_estructura_comercial_zona AS (
  SELECT concat_ws('|', trim(mrd.cod_compania), trim(cod_sucursal), trim(CAST(cod_zona AS VARCHAR))) AS id_estructura_comercial,
         mp.id_pais AS id_pais,
         concat_ws('|', trim(mrd.cod_compania), trim(cod_sucursal)) AS id_sucursal,
         concat_ws('|', trim(mrd.cod_compania), trim(cod_sucursal), mrd.cod_region, mrd.cod_subregion, trim(CAST(cod_centro_distribucion AS VARCHAR))) AS id_estructura_comercial_padre,
         concat_ws('|', trim(mrd.cod_compania), CAST(cod_supervisor AS VARCHAR)) AS id_responsable_comercial,
         CAST(cod_zona AS VARCHAR) AS cod_estructura_comercial,
         mrd.desc_zona AS nomb_estructura_comercial,
         'Zona' AS cod_tipo_estructura_comercial,
         mrd.es_activo AS estado,
         DATE '1995-07-01' AS fecha_creacion,
         DATE '1995-07-01' AS fecha_modificacion
  FROM stage_m_zona AS mrd
  JOIN stage_m_compania AS mc ON (mrd.cod_compania = mc.cod_compania)
  JOIN stage_m_pais AS mp ON (mp.cod_pais = mc.cod_pais)
),
step_m_estructura_comercial_df_m_zona_distribucion_distinct AS (
  SELECT DISTINCT *
  FROM (
  SELECT cod_compania AS cod_compania,
         cod_sucursal AS cod_sucursal,
         cod_centro_distribucion AS cod_centro_distribucion,
         cod_subregion AS cod_subregion,
         cod_region AS cod_region
  FROM stage_m_zona
  )
),
step_m_estructura_comercial_df_estructura_comercial_division AS (
  SELECT concat_ws('|', trim(mrd.cod_compania), trim(mzd.cod_sucursal), mzd.cod_region, mzd.cod_subregion, CAST(mrd.cod_division AS VARCHAR)) AS id_estructura_comercial,
         mp.id_pais AS id_pais,
         concat_ws('|', trim(mrd.cod_compania), trim(cod_sucursal)) AS id_sucursal,
         concat_ws('|', mp.id_pais, trim(CAST(mzd.cod_region AS VARCHAR)), trim(CAST(mzd.cod_subregion AS VARCHAR))) AS id_estructura_comercial_padre,
         concat_ws('|', trim(mrd.cod_compania), trim(CAST(cod_jefe_venta AS VARCHAR))) AS id_responsable_comercial,
         trim(CAST(mrd.cod_division AS VARCHAR)) AS cod_estructura_comercial,
         mrd.desc_division AS nomb_estructura_comercial,
         'División' AS cod_tipo_estructura_comercial,
         mrd.es_activo AS estado,
         DATE '1995-07-01' AS fecha_creacion,
         DATE '1995-07-01' AS fecha_modificacion
  FROM stage_m_division AS mrd
  JOIN step_m_estructura_comercial_df_m_zona_distribucion_distinct AS mzd ON ((mrd.cod_compania = mzd.cod_compania) AND (mrd.cod_division = mzd.cod_centro_distribucion))
  JOIN stage_m_compania AS mc ON (mrd.cod_compania = mc.cod_compania)
  JOIN stage_m_pais AS mp ON (mp.cod_pais = mc.cod_pais)
),
step_m_estructura_comercial_df_estructura_comercial_subregion AS (
  SELECT concat_ws('|', mp.id_pais, trim(CAST(msr.cod_region AS VARCHAR)), trim(CAST(msr.cod_subregion AS VARCHAR))) AS id_estructura_comercial,
         mp.id_pais AS id_pais,
         NULL AS id_sucursal,
         concat_ws('|', mp.id_pais, trim(CAST(msr.cod_region AS VARCHAR))) AS id_estructura_comercial_padre,
         NULL AS id_responsable_comercial,
         trim(CAST(cod_subregion AS VARCHAR)) AS cod_estructura_comercial,
         msr.desc_subregion AS nomb_estructura_comercial,
         'Subregión' AS cod_tipo_estructura_comercial,
         msr.es_activo AS estado,
         DATE '1995-07-01' AS fecha_creacion,
         DATE '1995-07-01' AS fecha_modificacion
  FROM stage_m_subregion AS msr
  JOIN stage_m_pais AS mp ON (mp.cod_pais = msr.cod_pais)
),
step_m_estructura_comercial_df_estructura_comercial_region AS (
  SELECT concat_ws('|', mp.id_pais, CAST(trim(mrd.cod_region) AS VARCHAR)) AS id_estructura_comercial,
         mp.id_pais AS id_pais,
         NULL AS id_sucursal,
         NULL AS id_estructura_comercial_padre,
         NULL AS id_responsable_comercial,
         trim(CAST(cod_region AS VARCHAR)) AS cod_estructura_comercial,
         mrd.desc_region AS nomb_estructura_comercial,
         'Región' AS cod_tipo_estructura_comercial,
         mrd.es_activo AS estado,
         DATE '1995-07-01' AS fecha_creacion,
         DATE '1995-07-01' AS fecha_modificacion
  FROM stage_m_region AS mrd
  JOIN stage_m_pais AS mp ON (mp.cod_pais = mrd.cod_pais)
),
step_m_estructura_comercial___union AS (
  (SELECT *
  FROM step_m_estructura_comercial_df_estructura_comercial_subregion)
  UNION ALL
  (SELECT * FROM step_m_estructura_comercial_df_estructura_comercial_region)
),
step_m_estructura_comercial___union__2 AS (
  (SELECT *
  FROM step_m_estructura_comercial_df_estructura_comercial_division)
  UNION ALL
  (SELECT * FROM step_m_estructura_comercial___union)
),
step_m_estructura_comercial___union__3 AS (
  (SELECT *
  FROM step_m_estructura_comercial_df_estructura_comercial_zona)
  UNION ALL
  (SELECT * FROM step_m_estructura_comercial___union__2)
),
step_m_estructura_comercial_df_dom_m_estructura_comercial AS (
  SELECT CAST(id_estructura_comercial AS VARCHAR) AS id_estructura_comercial,
         CAST(id_pais AS VARCHAR) AS id_pais,
         CAST(id_sucursal AS VARCHAR) AS id_sucursal,
         CAST(id_estructura_comercial_padre AS VARCHAR) AS id_estructura_comercial_padre,
         CAST(id_responsable_comercial AS VARCHAR) AS id_responsable_comercial,
         CAST(cod_estructura_comercial AS VARCHAR) AS cod_estructura_comercial,
         CAST(nomb_estructura_comercial AS VARCHAR) AS nomb_estructura_comercial,
         CAST(cod_tipo_estructura_comercial AS VARCHAR) AS cod_tipo_estructura_comercial,
         CAST(estado AS VARCHAR) AS estado,
         CAST(fecha_creacion AS TIMESTAMP) AS fecha_creacion,
         CAST(fecha_modificacion AS TIMESTAMP) AS fecha_modificacion
  FROM (
  SELECT DISTINCT *
  FROM (
  (SELECT *
  FROM step_m_estructura_comercial_df_estructura_comercial_ruta)
  UNION ALL
  (SELECT * FROM step_m_estructura_comercial___union__3)
  )
  )
),
job_m_estructura_comercial AS (
  SELECT * FROM step_m_estructura_comercial_df_dom_m_estructura_comercial
)
 SELECT id_estructura_comercial,
       id_pais,
       id_sucursal,
       id_estructura_comercial_padre,
       id_responsable_comercial,
       cod_estructura_comercial,
       nomb_estructura_comercial,
       cod_tipo_estructura_comercial,
       estado,
       fecha_creacion,
       fecha_modificacion FROM job_m_estructura_comercial