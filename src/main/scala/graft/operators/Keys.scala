package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Surrogate-key construction.
  *
  * The reference builds every dimensional id as a '|'-joined composite of
  * source codes (reference: artifacts/aws-glue/code/domain/t_venta.py:89-102,
  * `concat_ws("|", cod_compania, cod_sucursal, ...)`). `concat_ws` is a
  * codegen'd built-in, so key construction stays inside whole-stage codegen
  * and never forces a UDF boundary.
  */
object Keys {
  val Sep = "|"

  /** Composite surrogate key from heterogenous columns. */
  def surrogate(cols: Column*): Column =
    concat_ws(Sep, cols.map(_.cast(StringType)): _*)

  /** Reference-style defaulting: first non-null else a fixed label
    * (reference: t_venta.py:108-109 `coalesce(desc_region, lit("REGION DEFAULT"))`). */
  def orDefault(c: Column, default: String): Column = coalesce(c, lit(default))
}
