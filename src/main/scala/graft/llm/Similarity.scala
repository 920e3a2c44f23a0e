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

  /** Exact top-k neighbors per query, single pass over the corpus.
    *
    * The query set (bounded, like a broadcast-join build side) is collected
    * and broadcast; each corpus partition keeps one bounded candidate
    * buffer per query and emits at most k rows per (query, partition) —
    * so the shuffle carries k·partitions rows per query instead of N pair
    * rows, and the final exact ranking runs on that tiny set. Dot products
    * use the same strict left-to-right double loop as the float_dot kernel,
    * so results are bit-identical to the pairwise form and the oracle.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qArr: Array[(Long, Array[Float], Double)] = queries
      .select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
      .collect().map { case (id, v) => (id, v, VectorNorms.norm(v)) }
    val bq = spark.sparkContext.broadcast(qArr)
    val partials = corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        // unpack to parallel primitive arrays: no boxing in the hot loop
        val qs = bq.value
        val nq = qs.length
        val qIds = Array.tabulate(nq)(qs(_)._1)
        val qVecs = Array.tabulate(nq)(qs(_)._2)
        val qNorms = Array.tabulate(nq)(qs(_)._3)
        // per-query bounded candidate buffers: (cosine, neighborId)
        val buf = Array.fill(nq)(
          new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
            // min-heap on (cos asc, id desc): evict the worst candidate,
            // where "worse" = lower cos, then larger id
            Ordering.by[(Double, Long), (Double, Long)] { case (c, id) => (-c, id) }))
        rows.foreach { case (cid, cvec) =>
          val cn = VectorNorms.norm(cvec)
          var i = 0
          while (i < nq) {
            if (qIds(i) != cid) {
              val cos = VectorNorms.dot(qVecs(i), cvec) / (qNorms(i) * cn)
              val q = buf(i)
              if (q.size < k) q.enqueue((cos, cid))
              else {
                val (wc, wid) = q.head
                if (cos > wc || (cos == wc && cid < wid)) { q.dequeue(); q.enqueue((cos, cid)) }
              }
            }
            i += 1
          }
        }
        buf.iterator.zipWithIndex.flatMap { case (q, i) =>
          q.iterator.map { case (cos, cid) => (qIds(i), cid, cos) }
        }
      }.toDF("query_id", "neighbor_id", "cosine")
    TopN.perGroup(partials, Seq("query_id"),
        Seq(col("cosine").desc, col("neighbor_id").asc), k, rankCol = "rango")
      .select(col("query_id"), col("rango"), col("neighbor_id"), col("cosine"))
  }

  /** Pairwise expression form (reference baseline; same results). */
  def bruteForceTopKPairwise(queries: DataFrame, corpus: DataFrame, idCol: String,
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

  /** JVM-side twins of the float_dot kernel (identical summation order). */
  private[llm] object VectorNorms {
    def dot(a: Array[Float], b: Array[Float]): Double = {
      val n = math.min(a.length, b.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))
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
