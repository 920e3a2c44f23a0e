package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-instance union with schema drift tolerance.
  *
  * The reference reads the same table from N source-system instances and
  * unions them (reference: artifacts/aws-glue/layer/
  * common_jobs_functions.py:246-268 — `unionByName` across endpoint
  * folders). Instances can lag in schema, so missing columns become nulls
  * (then conformed with defaults downstream). Pure metadata operation —
  * no shuffle; each instance stays in its own partitions.
  */
object UnionInstances {
  def unionAll(instances: Seq[DataFrame]): DataFrame =
    instances.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Union with an instance-id column, like the reference's per-endpoint
    * provenance. */
  def unionTagged(instances: Seq[(String, DataFrame)], tagCol: String = "instancia"): DataFrame =
    instances.map { case (tag, df) => df.withColumn(tagCol, lit(tag)) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
}
