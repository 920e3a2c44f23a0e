package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the union-find
  * step that turns a near-dup PAIR set (MinHash/SimHash output) into
  * dedup groups with one survivor per group.
  *
  * Algorithm: alternating large-star / small-star edge contraction
  * (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected
  * Components in MapReduce and Beyond", SoCC 2014; public). Each round
  * rewrites the edge set:
  *   - large-star: every node connects its strictly-LARGER neighbors to
  *     the minimum of its closed neighborhood;
  *   - small-star: every node connects its smaller neighbors (and
  *     itself) to that minimum.
  * The fixpoint is a star forest — every component contracted to a star
  * centered on its minimum id — reached in O(log n) rounds on ANY
  * topology, paths included (large-star halves a path per round).
  *
  * Why not min-label propagation with pointer halving (the previous
  * implementation): its round count is the LABEL-ENTRY distance, not
  * O(log diameter). The factor-300 scale sweep produced exactly the
  * killer shape: a 300-copy family chained into a path whose local min
  * sits at one end, with one cross-family edge injecting a smaller
  * label at the other end. Halving jumps through label POINTERS, but
  * the whole path already points at its local min, so the smaller label
  * advances one PATH hop per round — 299 rounds for one family, and
  * maxIter truncation silently split components (25 of 300 members
  * relabeled, the rest stranded). Star contraction restructures the
  * EDGES instead, so the same graph converges in ~log2(n) rounds.
  *
  * Scale shape (100 TB corpus, billions of pair edges): every step is a
  * groupBy/join/distinct keyed on node id — no broadcast of anything
  * unbounded, no driver-side state. Edge tables are materialized per
  * round through an explicit persist + RDD cut (`cut` below), NOT
  * `localCheckpoint`: Spark 4's localCheckpoint rewrites the replaced
  * plan's ESTIMATED stats onto the checkpoint node
  * (`LogicalRDD.rewriteStatsAndConstraints`), so lineage is truncated
  * but the `sizeInBytes` estimate is not — and iterated joins multiply
  * it until stats estimation itself spends minutes in BigInteger
  * Toom-Cook multiplies and throws "BigInteger would overflow supported
  * range" (found by the factor-300 sweep). Rebuilding from the persisted
  * RDD resets stats to unknown each round, and the explicit handles let
  * each round unpersist its predecessor, keeping block-manager usage
  * O(1) in the iteration count.
  */
object ConnectedComponents {
  /** Persist + plan cut: lineage AND stats truncated, handle returned so
    * the loop can free prior rounds. Lazy — the caller's next aggregate
    * over the frame materializes every partition. */
  private def cut(df: DataFrame): (DataFrame, RDD[Row]) = {
    val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK_SER)
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }

  /** Order-free edge-set signature (count, hash-sum) — one full-scan
    * aggregate, so it doubles as the materializer for a fresh cut.
    * Decimal sum: a long sum of 64-bit hashes overflows under ANSI. */
  private def sigOf(df: DataFrame): (Long, Any) = {
    val r = df.agg(count(lit(1)),
      sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)"))).head
    (r.getLong(0), r.get(1))
  }

  /** Symmetric view of the edge set with m(u) = min(closed neighborhood)
    * alongside every (u, v) row — ONE exchange (the window on u) instead
    * of the groupBy + join pair, which costs two. */
  private def withMin(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sym = e.select(col("a").as("u"), col("b").as("v"))
      .unionByName(e.select(col("b").as("u"), col("a").as("v")))
    sym.withColumn("m",
      least(col("u"), min(col("v")).over(Window.partitionBy("u"))))
  }

  /** One large-star step: per node u, connect neighbors v > u to m(u).
    * Halves path lengths. No distinct: duplicate edges are harmless to
    * the min aggregates and the following small-star dedups before the
    * cut — dropping it saves one exchange per round. */
  private def largeStar(e: DataFrame): DataFrame =
    withMin(e)
      .filter(col("v") > col("u") && col("v") =!= col("m"))
      .select(least(col("v"), col("m")).as("a"),
        greatest(col("v"), col("m")).as("b"))

  /** One small-star step: per node u, connect neighbors v < u AND u
    * itself to m(u). Keeps every non-min node attached. Self edges are
    * emitted from the same windowed pass via explode (duplicates per
    * u collapse in the final distinct). */
  private def smallStar(e: DataFrame): DataFrame = {
    val self = struct(col("u").as("x"), col("m"))
    val nbr = struct(col("v").as("x"), col("m"))
    withMin(e)
      .select(explode(when(col("v") < col("u"), array(nbr, self))
        .otherwise(array(self))).as("e"))
      .filter(col("e.x") =!= col("e.m"))
      .select(least(col("e.x"), col("e.m")).as("a"),
        greatest(col("e.x"), col("e.m")).as("b"))
      .distinct()
  }

  /** In-driver union–find over a collected (a, b) edge array — the
    * bounded fast path of [[labelsReleasable]]. Path-halving find +
    * union by smaller root id, so the final root of every node IS the
    * component minimum (identical to the distributed fixpoint's label
    * law by construction — order-free, partitioning-free). Returns
    * (id, label) pairs for every node mentioned. */
  private def driverUnionFind(rows: Array[Row]): Array[(Long, Long)] = {
    val parent = new java.util.HashMap[Long, Long](rows.length * 2)
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) { // path halving
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp)
        x = gp
        p = parent.getOrDefault(x, x)
      }
      x
    }
    rows.foreach { r =>
      val a = r.getLong(0); val b = r.getLong(1)
      parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
      val ra = find(a); val rb = find(b)
      // union by MIN id: the surviving root is the smaller id, so every
      // root is its component's minimum at all times
      if (ra < rb) parent.put(rb, ra)
      else if (rb < ra) parent.put(ra, rb)
    }
    import scala.jdk.CollectionConverters._
    parent.keySet().asScala.iterator.map(id => (id, find(id))).toArray
  }

  /** (labels, rounds, release): labels = (id, label) for every node in
    * `edges` (label = min node id of the component); rounds = large+small
    * iterations until the edge set reached its star-forest fixpoint;
    * release() unpersists the materialized label cache once the caller
    * has consumed (or copied) the result. Labels are returned ALREADY
    * MATERIALIZED behind a persisted RDD — without the handle, repeated
    * calls would accumulate block-manager storage until the
    * ContextCleaner happened to GC the reference. Runs Spark jobs when
    * called (driver-side convergence loop). Default maxIter 50 is far
    * above the ~log2(n) rounds star contraction needs at any realistic
    * corpus size.
    *
    * Bounded driver fast path (r13): a Long-keyed edge set whose
    * normalized distinct pair count is ≤ `maxDriverEdges` resolves with
    * an in-driver union–find instead of the contraction loop — the
    * DimLookup/ExactQuantile bounded-collect contract applied to graphs.
    * Near-dup pair graphs are SPARSE relative to the corpus (BoundedPairs
    * caps bucket fanout), so a multi-round distributed fixpoint over a
    * few-MB edge list pays ~5 driver-coordinated jobs per round for work
    * a path-halving loop finishes in milliseconds; measured at sf0.1 the
    * q38 wall dropped 1.87 s → ~0.6 s with identical labels (spec-pinned
    * equality, LLMSpec "driver fast path"). The cap bounds the collect at
    * 2^22 edges (~64 MB of longs); ABOVE it the star-contraction loop
    * runs exactly as before — rounds = 0 reports the fast path.
    * `maxDriverEdges = 0` forces the distributed path (the contraction
    * specs pin its round law that way). */
  def labelsReleasable(edges: DataFrame, aCol: String = "id_a",
                       bCol: String = "id_b",
                       maxIter: Int = 50,
                       maxDriverEdges: Long = 1L << 22): (DataFrame, Int, () => Unit) = {
    // one pass over the (possibly expensive) input plan: the normalized
    // pair set is cut once and serves both the contraction loop (minus
    // self-pairs) and the final node roster (so every node mentioned in
    // the input keeps a label even if contraction removes it early)
    val (base, baseRdd) = cut(
      edges.select(least(col(aCol), col(bCol)).as("a"),
          greatest(col(aCol), col(bCol)).as("b"))
        .distinct())
    val longKeyed = base.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.LongType)
    if (longKeyed && maxDriverEdges > 0) {
      // materializes the cut; ONE agg gates the bounded collect (null
      // keys route to the distributed path, which labels them as today)
      val gate = base.agg(count(lit(1)),
        sum(when(col("a").isNull || col("b").isNull, 1L).otherwise(0L))).head()
      val n = gate.getLong(0)
      val nulls = if (gate.isNullAt(1)) 0L else gate.getLong(1)
      if (n <= maxDriverEdges && nulls == 0L) {
        val lbl = driverUnionFind(base.collect())
        baseRdd.unpersist(false)
        val spark = edges.sparkSession
        import spark.implicits._
        // LocalRelation result: trivially "materialized", release no-ops
        val out = lbl.toSeq.toDF("id", "label")
        return (out, 0, () => ())
      }
    }
    var e = base.filter(col("a") =!= col("b"))
    var eRdd: RDD[Row] = null
    // fixpoint = identical edge set round over round; the previous
    // round's signature is carried, so each round costs ONE aggregate —
    // which doubles as the materializer of that round's cut
    var prevSig = sigOf(e)
    var converged = prevSig._1 == 0L
    var i = 0
    while (!converged && i < maxIter) {
      val (next, nextRdd) = cut(smallStar(largeStar(e)))
      val s = sigOf(next)
      converged = s == prevSig
      prevSig = s
      if (eRdd != null) eRdd.unpersist(false)
      e = next
      eRdd = nextRdd
      i += 1
    }
    // star forest: centers label themselves, leaves take their center;
    // nodes contracted out of the edge set label themselves. The min-agg
    // collapses the (only-at-maxIter-truncation) case of a leaf still
    // holding two centers, so the labeling stays one-row-per-node.
    val nodes = base.select(explode(array(col("a"), col("b"))).as("id")).distinct()
    val lbl = nodes
      .join(e.select(col("b").as("id"), col("a").as("lbl")), Seq("id"), "left")
      .groupBy(col("id"))
      .agg(min(coalesce(col("lbl"), col("id"))).as("label"))
    val (out, outRdd) = cut(lbl)
    outRdd.count()
    if (eRdd != null) eRdd.unpersist(false)
    baseRdd.unpersist(false)
    (out, i, () => { outRdd.unpersist(false); () })
  }

  /** [[labelsReleasable]] without the release handle — the label cache
    * stays persisted until the ContextCleaner GCs it. Fine for
    * one-shot/test use; pipelines calling per run should prefer
    * [[labelsReleasable]] and drop the cache once consumed. */
  def labelsWithRounds(edges: DataFrame, aCol: String = "id_a",
                       bCol: String = "id_b",
                       maxIter: Int = 50,
                       maxDriverEdges: Long = 1L << 22): (DataFrame, Int) = {
    val (out, rounds, _) =
      labelsReleasable(edges, aCol, bCol, maxIter, maxDriverEdges)
    (out, rounds)
  }

  /** (id, label) for every node in `edges`, where label = min node id of
    * the node's component. Persisted until GC — see [[labelsWithRounds]]. */
  def labels(edges: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
             maxIter: Int = 50, maxDriverEdges: Long = 1L << 22): DataFrame =
    labelsWithRounds(edges, aCol, bCol, maxIter, maxDriverEdges)._1

  /** Label every node with its component representative and size —
    * (id, survivor, size); survivor = min id of the component.
    * Persisted until GC — see [[labelsWithRounds]]. */
  def components(edges: DataFrame, aCol: String = "id_a", bCol: String = "id_b",
                 maxIter: Int = 50, maxDriverEdges: Long = 1L << 22): DataFrame = {
    val lbl = labels(edges, aCol, bCol, maxIter, maxDriverEdges)
    lbl.join(lbl.groupBy(col("label")).agg(count(lit(1)).as("size")), Seq("label"))
      .select(col("id"), col("label").as("survivor"), col("size"))
  }
}
