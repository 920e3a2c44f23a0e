package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType, IntegerType}
import graft.core.Tables
import graft.operators.{Keys, Periods}
import graft.sources.LakeIO

/** End-to-end lake pipeline: the reference's job graph (stage → domain →
  * analytics, reference: artifacts/aws-glue/code/{domain,analytics})
  * re-expressed over graft operators and LakeIO.
  *
  * Domain conforms raw tables (surrogate keys, defaults, casts, period
  * column); analytics builds the star (dims + facts) from domain.
  * Facts are partitioned by id_periodo, so periodic runs upsert only the
  * touched partitions — the reference's id_pais/id_periodo layout.
  */
object Analytics {
  private def dec(c: Column): Column = c.cast(DecimalType(38, 6))

  /** Domain layer: conformed master + transactional tables. */
  def buildDomain(lake: LakeIO, sfDir: String): Unit = {
    val spark = lake.spark
    val mCliente = CoreQueries.q3DimConform(spark, sfDir)
    lake.write(mCliente, lake.layers.Domain, "m_cliente")

    val tVenta = Tables.orders(spark, sfDir).select(
      Keys.surrogate(col("o_orderkey")).as("id_venta"),
      Keys.surrogate(col("o_custkey")).as("id_cliente"),
      Periods.periodOf(col("o_orderdate")).as("id_periodo"),
      col("o_orderdate").cast(DateType).as("fecha_emision"),
      upper(trim(col("o_orderstatus"))).as("cod_estado"),
      col("o_orderpriority").as("cod_prioridad"),
      dec(col("o_totalprice")).as("imp_total"))
    lake.write(tVenta, lake.layers.Domain, "t_venta", Seq("id_periodo"))

    val tVentaDetalle = Tables.lineitem(spark, sfDir).select(
      Keys.surrogate(col("l_orderkey")).as("id_venta"),
      Keys.surrogate(col("l_orderkey"), col("l_linenumber")).as("id_venta_detalle"),
      Keys.surrogate(col("l_partkey")).as("id_producto"),
      Periods.periodOf(col("l_shipdate")).as("id_periodo"),
      dec(col("l_quantity")).as("cant"),
      dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("imp_neto"))
    lake.write(tVentaDetalle, lake.layers.Domain, "t_venta_detalle", Seq("id_periodo"))
  }

  /** Analytics layer: star-schema dims and facts from domain. */
  def buildAnalytics(lake: LakeIO): Unit = {
    val dimCliente = lake.read(lake.layers.Domain, "m_cliente")
    lake.write(dimCliente, lake.layers.Analytics, "dim_cliente")

    val tv = lake.read(lake.layers.Domain, "t_venta")
    val tvd = lake.read(lake.layers.Domain, "t_venta_detalle")
    val fact = tvd.join(tv.drop("id_periodo"), Seq("id_venta"))
      .groupBy(col("id_periodo"), col("id_cliente"))
      .agg(
        sum(col("imp_neto")).as("imp_neto"),
        sum(col("cant")).as("cant_total"),
        countDistinct(col("id_venta")).as("cant_ventas"))
    lake.write(fact, lake.layers.Analytics, "fact_cliente_periodo", Seq("id_periodo"))
  }

  /** Full run; idempotent (overwrite/dynamic-overwrite semantics). */
  def run(spark: SparkSession, sfDir: String, lakeRoot: String): LakeIO = {
    val lake = LakeIO(spark, lakeRoot)
    buildDomain(lake, sfDir)
    buildAnalytics(lake)
    lake
  }
}
