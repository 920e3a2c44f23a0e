package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT heavy hitters in two bounded passes — every item whose frequency
  * strictly exceeds n/(k+1), with its exact count.
  *
  * The naive form (q33's vocabulary shape) shuffles the FULL item stream
  * to count it: at 100 TB the vocabulary exchange dominates the job even
  * though the answer is ≤ k rows. This operator never shuffles the
  * stream:
  *
  *   pass 1: a Misra–Gries summary ([[graft.functions.MgCandidates]],
  *     k counters, mergeable) — map-side O(k) state, the exchange carries
  *     ≤ k (string, count) pairs per partition. By the MG bound the
  *     summary is a guaranteed SUPERSET of every item with frequency
  *     > n/(k+1), and it also yields the exact n.
  *   pass 2: exact counts of the ≤ k candidates only — the stream is
  *     filtered by an InSet of candidates BEFORE the exchange, so the
  *     groupBy shuffles ≤ k distinct keys (map-side partials make that
  *     ≤ k rows per partition), then the exact threshold
  *     count·(k+1) > n cuts the superset down to the exact answer.
  *
  * Total: two scans, both exchanges bounded by k — the 100 TB shape.
  * Threshold arithmetic is pure integer (count·(k+1) > n), so any SQL
  * oracle agrees bit-exactly. At most k items can exceed n/(k+1)
  * (k+1 of them would sum past n), so the result is ≤ k rows.
  *
  * Candidate-set determinism: the MG SET may vary with partitioning (it
  * is a superset, not canonical) — correctness never depends on it, only
  * the exact-counted, threshold-filtered result is surfaced. */
object HeavyHitters {

  /** Items (and exact counts) with frequency·(k+1) > n over `itemCol`
    * (StringType; nulls ignored). Output: (itemCol, frecuencia),
    * frequency desc then item asc. */
  def exact(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    graft.functions.GraftFunctions.ensureRegistered()
    val spark = items.sparkSession
    val summary = items
      .agg(expr(s"mg_candidates($itemCol, $k)").as("s"))
      .select(col("s.n").as("n"), col("s.candidates").as("candidates"))
      .head()
    val n = summary.getLong(0)
    val candidates = summary.getSeq[String](1)
    if (candidates.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(itemCol,
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("frecuencia",
            org.apache.spark.sql.types.LongType, nullable = false))))
    items
      .filter(col(itemCol).isin(candidates: _*))
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("frecuencia"))
      .filter(col("frecuencia") * lit(k + 1L) > lit(n))
      .orderBy(col("frecuencia").desc, col(itemCol).asc)
      .limit(k) // ≤ k rows by the threshold math — pins TakeOrdered
  }
}
