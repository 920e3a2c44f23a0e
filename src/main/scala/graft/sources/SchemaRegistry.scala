package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Column-spec registry: declared schemas for tables that may not exist yet.
  *
  * The reference stores per-table column specs in DynamoDB and builds an
  * empty, correctly-typed DataFrame when a source instance has no data
  * (reference: artifacts/aws-glue/layer/common_jobs_functions.py:124-217
  * `_create_empty_dataframe_from_dynamodb`) — that keeps downstream
  * unions/joins schema-stable. Here specs are plain data (registered in
  * code or loaded from a CSV artifact with columns
  * table;column;type;ordinal).
  */
object SchemaRegistry {
  /** reference type mapping: common_jobs_functions.py:179-188. */
  val TypeMapping: Map[String, DataType] = Map(
    "string" -> StringType, "int" -> IntegerType, "integer" -> IntegerType,
    "long" -> LongType, "bigint" -> LongType,
    "double" -> DoubleType, "float" -> DoubleType,
    "boolean" -> BooleanType, "date" -> DateType, "timestamp" -> TimestampType)

  final case class ColumnSpec(name: String, dtype: String) {
    def toField: StructField =
      StructField(name, TypeMapping.getOrElse(dtype.toLowerCase, StringType), nullable = true)
  }

  final case class Registry(specs: Map[String, Seq[ColumnSpec]]) {
    def schema(table: String): StructType =
      StructType(specs.getOrElse(table,
        throw new NoSuchElementException(s"no spec for table $table")).map(_.toField))

    /** Empty, correctly-typed frame for a missing table. */
    def emptyFrame(spark: SparkSession, table: String): DataFrame =
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema(table))
  }

  /** Load from a `;`-separated CSV artifact (table;column;type;ordinal). */
  def fromCsv(spark: SparkSession, path: String): Registry = {
    val rows = spark.read.option("sep", ";").option("header", "true").csv(path)
      .select("table", "column", "type", "ordinal").collect()
    Registry(rows.groupBy(_.getString(0)).map { case (t, rs) =>
      t -> rs.sortBy(_.getString(3).toInt).map(r => ColumnSpec(r.getString(1), r.getString(2))).toSeq
    })
  }
}
