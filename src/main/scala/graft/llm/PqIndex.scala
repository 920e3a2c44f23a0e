package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TopN
import graft.sources.TxnTable

/** Product-quantization layer over the persisted IVF index — IVF-PQ
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011): the memory side of the 100 TB ANN story.
  * [[IvfIndex]] bounds the SCAN (probe P of √N cells); this layer bounds
  * the BYTES each probed row costs: a dim-float vector (4·dim B)
  * becomes `m` one-byte codes + one stored norm, so candidate scoring
  * streams `m + 8` bytes per row instead of 4·dim (a 64-dim corpus:
  * 256 B → 16 B at m=8) and the scoring loop is `m` table lookups per
  * row (Asymmetric Distance Computation) instead of a dim-length dot.
  *
  * Serving is two-stage, like [[Similarity.quantizedTopK]]'s int8 path:
  * ADC ranks a per-query shortlist of `refine · k` candidates from the
  * CODES table alone, then only the shortlist is exact-rescored against
  * the full vectors of the probed cells — so the returned cosines are
  * EXACT (bit-equal to the full-vector serve for the same pairs), PQ
  * only decides which candidates get the exact treatment. With the
  * shortlist wide enough to cover the probed population, the serve
  * equals the full-vector serve outright (spec-pinned); at production
  * width the trade is recall, measured by PqIndexSpec on clustered
  * corpora.
  *
  * Artifact lifecycle mirrors the index: the CODEC (m·k codewords — a
  * bounded model table) and the CODES file (id, codes, vnorm, cell —
  * partitioned by cell like the inverted file, so the ADC stage opens
  * exactly the probed partitions) are [[TxnTable]]s under the index
  * root, and a PQINDEX pin records (centroidVersion, assignmentVersion,
  * codesVersion, codecVersion): codes are valid AGAINST ONE index pin,
  * and [[topK]] refuses loudly when the index has been rebuilt or
  * appended past the codes (stale codes would silently drop the new
  * rows from serving — fail, don't under-recall).
  *
  * Routing reuses [[IvfIndex.resolveServe]] verbatim — flat and
  * two-level models, coarse auto-widening, version-pin co-resolution
  * are the same code path as the full-vector serve, so the two serves
  * cannot drift.
  */
object PqIndex {

  /** Trained product quantizer: `codebooks(i)(j)` is codeword `j` of
    * sub-space `i`, each of length `dim / m`. Codes are byte indexes,
    * so every sub-space codebook holds ≤ 256 codewords. */
  final case class PqCodec(dim: Int, m: Int,
                           codebooks: Array[Array[Array[Float]]])
      extends Serializable {
    val sub: Int = dim / m

    /** Encode one vector: per-sub-space squared-L2 argmin, ties to the
      * smallest code (strictly-smaller comparison keeps the first). */
    def encode(v: Array[Float]): Array[Byte] = {
      require(v.length == dim,
        s"PqCodec(dim=$dim) cannot encode a ${v.length}-dim vector")
      val out = new Array[Byte](m)
      var i = 0
      while (i < m) {
        val cb = codebooks(i)
        var best = 0
        var bestD = Double.MaxValue
        var j = 0
        while (j < cb.length) {
          val cw = cb(j)
          var d = 0.0
          var t = 0
          while (t < sub) {
            val x = (v(i * sub + t) - cw(t)).toDouble
            d += x * x
            t += 1
          }
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        out(i) = best.toByte
        i += 1
      }
      out
    }

    /** Per-query ADC table: `tab(i)(j)` = dot(query sub-vector i,
      * codeword j). Approximate dot(q, v) = Σ_i tab(i)(codes(i)) — m
      * lookups per candidate, the whole point of ADC. */
    def dotTables(q: Array[Float]): Array[Array[Double]] = {
      require(q.length == dim,
        s"PqCodec(dim=$dim) cannot table a ${q.length}-dim query")
      Array.tabulate(m) { i =>
        val cb = codebooks(i)
        Array.tabulate(cb.length) { j =>
          val cw = cb(j)
          var s = 0.0
          var t = 0
          while (t < sub) {
            s += q(i * sub + t).toDouble * cw(t)
            t += 1
          }
          s
        }
      }
    }
  }

  /** Train sub-space codebooks by per-sub-space Lloyd k-means over a
    * BOUNDED deterministic sample — codebook quality needs a sample,
    * not the corpus (standard PQ practice; the sample is the md5-spread
    * `sampleN`-row TakeOrdered the q55/centroid paths use, so training
    * never scans more than one pass and never collects more than
    * `sampleN` vectors). Init per sub-space: the first `k` DISTINCT
    * sub-vectors in sample order (fewer survive if the sample lacks
    * variety — codes stay dense either way); `iters = 0` freezes the
    * init, which makes exact-codeword corpora encode losslessly (the
    * spec's exactness law). Empty clusters keep their previous center.
    * Deterministic end to end: no RNG, ties to the smaller code. */
  def train(corpus: DataFrame, idCol: String, vecCol: String, m: Int = 8,
            k: Int = 256, sampleN: Int = 16384, iters: Int = 10): PqCodec = {
    require(k >= 1 && k <= 256, s"PQ codes are bytes: k=$k not in [1,256]")
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample: Array[Array[Float]] = corpus
      .select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"))
      .withColumn("__h", md5(col("__id").cast("string")))
      .orderBy(col("__h"), col("__id"))
      .limit(sampleN)
      .select(col("__v")).as[Array[Float]].collect()
    require(sample.nonEmpty, "PqIndex.train: empty corpus")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m sub-spaces")
    val sub = dim / m
    val codebooks = Array.tabulate(m) { i =>
      val init = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
      val seen = scala.collection.mutable.HashSet.empty[Seq[Float]]
      var t = 0
      while (t < sample.length && init.length < k) {
        val sv = java.util.Arrays.copyOfRange(sample(t), i * sub, (i + 1) * sub)
        if (seen.add(sv.toSeq)) init += sv: Unit
        t += 1
      }
      var centers = init.toArray
      var it = 0
      while (it < iters) {
        val sums = Array.fill(centers.length)(new Array[Double](sub))
        val counts = new Array[Long](centers.length)
        sample.foreach { v =>
          var best = 0
          var bestD = Double.MaxValue
          var j = 0
          while (j < centers.length) {
            val cw = centers(j)
            var d = 0.0
            var u = 0
            while (u < sub) {
              val x = (v(i * sub + u) - cw(u)).toDouble
              d += x * x
              u += 1
            }
            if (d < bestD) { bestD = d; best = j }
            j += 1
          }
          counts(best) += 1
          var u = 0
          while (u < sub) { sums(best)(u) += v(i * sub + u); u += 1 }
        }
        centers = Array.tabulate(centers.length) { j =>
          if (counts(j) == 0L) centers(j)
          else Array.tabulate(sub)(u => (sums(j)(u) / counts(j)).toFloat)
        }
        it += 1
      }
      centers
    }
    PqCodec(dim, m, codebooks)
  }

  /** The codec as a bounded model table: one row per (sub-space, code). */
  def codecTable(spark: SparkSession, root: String): TxnTable =
    TxnTable(spark, s"$root/pqmodel")

  /** The codes file: (id, codes, vnorm, cell), partitioned by cell. */
  def codesTable(spark: SparkSession, root: String): TxnTable =
    TxnTable(spark, s"$root/pqcodes")

  def saveCodec(spark: SparkSession, root: String, codec: PqCodec): Long = {
    import spark.implicits._
    val rows = for {
      i <- codec.codebooks.indices
      j <- codec.codebooks(i).indices
    } yield (i, j, codec.codebooks(i)(j).toSeq)
    codecTable(spark, root).overwrite(rows.toDF("subspace", "code", "codeword"))
  }

  def loadCodecAt(spark: SparkSession, root: String, version: Long): PqCodec = {
    import spark.implicits._
    val rows = codecTable(spark, root).readVersion(version)
      .select(col("subspace").cast("int"), col("code").cast("int"),
        col("codeword"))
      .as[(Int, Int, Array[Float])].collect()
    require(rows.nonEmpty, s"empty PQ codec at $root")
    val m = rows.iterator.map(_._1).max + 1
    val books = Array.tabulate(m) { i =>
      rows.filter(_._1 == i).sortBy(_._2).map(_._3)
    }
    PqCodec(m * books(0)(0).length, m, books)
  }

  // ------------------------------------------------------------ PQ pin
  // PQINDEX holds "centroidVersion assignmentVersion codesVersion
  // codecVersion" — the index pin the codes were built against plus the
  // code artifacts' own versions. Same atomic tmp+move as the index pin.

  private def pinPath(root: String) =
    java.nio.file.Paths.get(root, "PQINDEX")

  private def writePin(root: String, cv: Long, av: Long, codesV: Long,
                       codecV: Long): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    val dir = java.nio.file.Paths.get(root)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".pqindex-${java.util.UUID.randomUUID()}")
    Files.write(tmp, s"$cv $av $codesV $codecV".getBytes("UTF-8"))
    Files.move(tmp, pinPath(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING): Unit
  }

  /** Whether PQ serving artifacts have been published under `root` —
    * maintenance loops use it to keep codes riding index appends only
    * where a PQ serve actually exists. */
  def hasCodes(root: String): Boolean =
    java.nio.file.Files.exists(pinPath(root))

  /** (centroidVersion, assignmentVersion, codesVersion, codecVersion)
    * the codes were published against. */
  def readPin(root: String): (Long, Long, Long, Long) = {
    val p = pinPath(root)
    require(java.nio.file.Files.exists(p),
      s"no PQ codes at $root — run PqIndex.buildCodes first")
    val Array(cv, av, codesV, codecV) =
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim.split(' ')
    (cv.toLong, av.toLong, codesV.toLong, codecV.toLong)
  }

  /** Encode the ENTIRE pinned inverted file and publish codes + codec
    * under the index root. One pass over the assignments (dense encode
    * kernel, the documented mapPartitions case), partitioned by cell so
    * the ADC stage prunes like the index itself. The published pin
    * records the index (cv, av) the codes mirror — [[topK]] enforces
    * it. Re-run after every index rebuild or append. */
  def buildCodes(spark: SparkSession, root: String, idCol: String,
                 vecCol: String, codec: PqCodec): Long = {
    val (cv, av) = IvfIndex.readPin(spark, root)
    val assigned = IvfIndex.assignmentTable(spark, root).readVersion(av)
    val codecV = saveCodec(spark, root, codec)
    val codesV = codesTable(spark, root).overwrite(
      encodeRows(assigned, idCol, vecCol, codec).repartition(col("cell")),
      partitionBy = Seq("cell"))
    writePin(root, cv, av, codesV, codecV)
    codesV
  }

  /** O(churn) code maintenance after [[IvfIndex.append]]: encode ONLY
    * the assignment rows added since the codes' pinned version — the
    * txn log's version diff scans just the appended files, never the
    * standing corpus — append them to the codes table, and re-pin.
    * Without this, every index append would force [[buildCodes]]'s
    * full O(N) re-encode, breaking the O(churn) increment loop the
    * index itself keeps. Refuses after a REBUILD (new centroid
    * version) or any diff that removes rows (compaction overwrites,
    * partition rewrites) — those invalidate the standing codes, and
    * patching over them would serve wrong; buildCodes is the heal. */
  def appendCodes(spark: SparkSession, root: String, idCol: String,
                  vecCol: String): Long = {
    val (pcv, pav, pCodesV, codecV) = readPin(root)
    val (cv, av) = IvfIndex.readPin(spark, root)
    require(cv == pcv,
      s"index at $root was rebuilt (centroids $pcv -> $cv) — incremental " +
        "codes cannot follow a rebuild; run buildCodes")
    if (av == pav) return pCodesV
    val delta = IvfIndex.assignmentTable(spark, root).changes(pav, av)
    require(delta.filter(col("_change_type") === "delete").isEmpty,
      s"assignment diff $pav -> $av at $root removes rows — the standing " +
        "codes are invalid; run buildCodes")
    val added = delta.filter(col("_change_type") === "insert")
    val codec = loadCodecAt(spark, root, codecV)
    val codesV = codesTable(spark, root).append(
      encodeRows(added, idCol, vecCol, codec).repartition(col("cell")),
      partitionBy = Seq("cell"))
    writePin(root, cv, av, codesV, codecV)
    codesV
  }

  /** The encode pass: (id, codes, vnorm, cell) rows via the dense
    * per-partition kernel (broadcast codec, no boxing in the loop). */
  private def encodeRows(assigned: DataFrame, idCol: String,
                         vecCol: String, codec: PqCodec): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(codec)
    assigned
      .select(col(idCol).cast("long"), col(vecCol), col("cell").cast("int"))
      .as[(Long, Array[Float], Int)]
      .mapPartitions { rows =>
        val c = bc.value
        rows.map { case (id, v, cell) =>
          (id, c.encode(v), Similarity.VectorNorms.norm(v), cell)
        }
      }
      .toDF(idCol, "codes", "vnorm", "cell")
  }

  /** Serve top-k through ADC + exact rescore. Stage 1 streams the
    * PROBED cells' codes (m+8 bytes/row) against per-query distance
    * tables and keeps a `refine · k` shortlist per query (bounded heaps,
    * the bruteForceTopK kernel shape; approximate cosine =
    * ADC-dot / (‖q‖ · stored ‖v‖)). Stage 2 joins ONLY the shortlist
    * back to the probed cells' full vectors and rescores exactly, so
    * the returned cosines are bit-equal to the full-vector serve's for
    * the same pairs — `refine` trades recall against how many exact
    * dots stage 2 pays. Routing, widening, and pins come from
    * [[IvfIndex.resolveServe]]; stale codes (index rebuilt or appended
    * past the PQ pin) refuse loudly. */
  def topK(queries: DataFrame, root: String, idCol: String, vecCol: String,
           k: Int, probes: Int = 4, refine: Int = 4,
           coarseProbes: Int = 8, autoWiden: Boolean = true,
           maxQueries: Int = 100000): DataFrame =
    serve(queries, root, idCol, vecCol, k, probes, refine, coarseProbes,
      autoWiden, maxQueries, keep = None)

  /** Metadata-FILTERED ADC serve — [[IvfIndex.topKFiltered]]'s semantics
    * over PQ codes, so filtered RAG serving gets the m+8-bytes-per-row
    * scan too. The predicate evaluates against `meta` (attributes live in
    * the source table, lakehouse-style) and the surviving ids semi-join
    * the probed-cell CODES scan AFTER partition pruning and BEFORE the
    * distance-table loop: the ADC stage streams only (probed cells ∩
    * filter) rows, the shortlist is a true top of the FILTERED corpus
    * within the probed cells, and the exact rescore touches shortlist
    * rows only (already filtered — the rescore join keys on the
    * shortlist). Routing stays that of the full index; raise `probes` /
    * `refine` as the predicate gets more selective. */
  def topKFiltered(queries: DataFrame, root: String, idCol: String,
                   vecCol: String, k: Int, meta: DataFrame,
                   where: org.apache.spark.sql.Column,
                   probes: Int = 4, refine: Int = 4,
                   coarseProbes: Int = 8, autoWiden: Boolean = true,
                   maxQueries: Int = 100000): DataFrame =
    serve(queries, root, idCol, vecCol, k, probes, refine, coarseProbes,
      autoWiden, maxQueries,
      keep = Some(meta.filter(where).select(col(idCol))))

  private def serve(queries: DataFrame, root: String, idCol: String,
                    vecCol: String, k: Int, probes: Int, refine: Int,
                    coarseProbes: Int, autoWiden: Boolean,
                    maxQueries: Int, keep: Option[DataFrame]): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val sv = IvfIndex.resolveServe(queries, root, vecCol, probes,
      coarseProbes, autoWiden)
    val (pcv, pav, codesV, codecV) = readPin(root)
    require(pcv == sv.cv && pav == sv.av,
      s"PQ codes at $root were built against index pin ($pcv, $pav) but " +
        s"the index pin is now (${sv.cv}, ${sv.av}) — serving them would " +
        "silently drop rows; re-run PqIndex.buildCodes")
    val codec = loadCodecAt(spark, root, codecV)
    // the query batch is a broadcast build side — the bruteForceTopK cap
    // contract: bounded collect, loud overflow
    val capped = queries
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].limit(maxQueries + 1).collect()
    require(capped.length <= maxQueries,
      s"PqIndex.topK: query set exceeds maxQueries=$maxQueries rows — " +
        "batch the queries or raise the cap explicitly")
    // per-query probed cells — the SAME law as ivfTopKWith's probe
    // (score every model cell, stable sort by score desc, take
    // `probes`), so ADC serves each query exactly the cells the
    // full-vector serve would: the union-probed partition read below
    // narrows per query here, or PQ would silently OVER-serve (score
    // candidates from cells other queries probed) and diverge from the
    // full-vector serve it must bound.
    val qArr: Array[(Long, Array[Array[Double]], Double, Array[Int])] =
      capped.map { case (id, v) =>
        val nv = Similarity.VectorNorms.norm(v)
        val cells = sv.model
          .map { case (cell, cv, cn) =>
            (cell, Similarity.VectorNorms.dot(cv, v) / (cn * nv)) }
          .sortBy(-_._2).take(math.min(probes, sv.model.length)).map(_._1)
        (id, codec.dotTables(v), nv, cells)
      }
    val bq = spark.sparkContext.broadcast(qArr)
    val shortK = math.max(k, k * refine)
    val codesScan = codesTable(spark, root)
      .readParts(codesV)(p => IvfIndex.cellOf(p).forall(sv.probed.contains))
    // the filter lands here: after partition pruning, before ADC — the
    // predicate-selective keep side broadcasts against the pruned scan
    val codesDf = keep.fold(codesScan)(ks =>
      codesScan.join(ks, Seq(idCol), "left_semi"))
    val partials = codesDf
      .select(col(idCol).cast("long"), col("codes"), col("vnorm"),
        col("cell").cast("int"))
      .as[(Long, Array[Byte], Double, Int)]
      .mapPartitions { rows =>
        val qs = bq.value
        val nq = qs.length
        val qIds = Array.tabulate(nq)(qs(_)._1)
        val qTabs = Array.tabulate(nq)(qs(_)._2)
        val qNorms = Array.tabulate(nq)(qs(_)._3)
        val qCells = Array.tabulate(nq) { i =>
          val bs = new java.util.BitSet()
          qs(i)._4.foreach(bs.set)
          bs
        }
        val m = qTabs.headOption.map(_.length).getOrElse(0)
        // per-query bounded shortlist heaps: evict (approx asc, id desc)
        val buf = Array.fill(nq)(
          new scala.collection.mutable.PriorityQueue[(Double, Long)]()(
            Ordering.by[(Double, Long), (Double, Long)] {
              case (c, id) => (-c, id)
            }))
        rows.foreach { case (cid, codes, vn, cell) =>
          var i = 0
          while (i < nq) {
            if (qIds(i) != cid && qCells(i).get(cell)) {
              val tab = qTabs(i)
              var adc = 0.0
              var s = 0
              while (s < m) {
                adc += tab(s)(codes(s) & 0xff)
                s += 1
              }
              val approx = adc / (qNorms(i) * vn)
              val q = buf(i)
              if (q.size < shortK) q.enqueue((approx, cid))
              else {
                val (wc, wid) = q.head
                if (approx > wc || (approx == wc && cid < wid)) {
                  q.dequeue(): Unit
                  q.enqueue((approx, cid))
                }
              }
            }
            i += 1
          }
        }
        buf.iterator.zipWithIndex.flatMap { case (q, i) =>
          q.iterator.map { case (a, cid) => (qIds(i), cid, a) }
        }
      }.toDF("query_id", "neighbor_id", "__approx")
    val short = TopN.perGroup(partials, Seq("query_id"),
        Seq(col("__approx").desc, col("neighbor_id").asc), shortK,
        rankCol = "__r")
      .select(col("query_id"), col("neighbor_id"))
    // exact rescore of the shortlist only: the full vectors come from
    // the probed cells' partitions; the shortlist side is queries ×
    // shortK rows, so AQE broadcasts it against the pruned scan
    val vecs = IvfIndex.assignmentTable(spark, root)
      .readParts(sv.av)(p => IvfIndex.cellOf(p).forall(sv.probed.contains))
      .select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).as("__cv"))
    val qv = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("__qv"))
    val scored = short
      .join(vecs, Seq("neighbor_id"))
      .join(qv, Seq("query_id"))
      .withColumn("cosine", Similarity.cosine(col("__qv"), col("__cv"),
        Similarity.norm(col("__qv")), Similarity.norm(col("__cv"))))
      // a neighbor id can reach the shortlist through SEVERAL codes rows
      // (duplicate-id appends are legal — the inverted file keeps every
      // row) and the rescore join fans out across them; collapse to one
      // row per (query, neighbor) exactly like ivfTopKWith does, or the
      // same neighbor occupies several ranks and pushes true results out
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(max(col("cosine")).as("cosine"))
    TopN.perGroup(scored, Seq("query_id"),
        Seq(col("cosine").desc, col("neighbor_id").asc), k, rankCol = "rango")
      .select(col("query_id"), col("rango"), col("neighbor_id"),
        col("cosine"))
  }
}
