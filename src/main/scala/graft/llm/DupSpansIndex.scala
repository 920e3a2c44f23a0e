package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.TxnTable

/** The PERSISTED side of incremental exact-substring dedup (SURVEY §2
  * row 85 — the [[DupSpans]] analog of the MinHash path's maintained
  * banded table): the corpus's gram-hash anchors live as a standing
  * transactional inverted file, so a daily increment
  *
  *   1. anchors only ITS OWN positions (O(churn · L) hashing — the
  *      standing corpus text is never re-read, never re-hashed),
  *   2. probes the standing index with a semi join on its own 8-byte
  *      hash set (churn-sized; broadcastable for a daily batch), and
  *   3. appends its anchors (one [[TxnTable.append]] — O(churn) rows),
  *
  * which is the whole maintenance loop: nothing ever rescans or
  * re-anchors the corpus. The index rows are (celda, h, doc_id, pos)
  * partitioned by `celda = pmod(h, nCells)` — a hash-range layout, so a
  * SMALL probe batch whose hashes populate few cells opens only those
  * partitions ([[TxnTable.readParts]], manifest-resolved), and the
  * per-cell files stay mergeable by [[TxnTable.compact]] as appends
  * accumulate. Anchors are WINNOWED by default (w = 16): the index costs
  * ~2/(w+1) of a per-position index (~2.5 bytes per corpus character
  * instead of ~20) and still guarantees every duplicated span of
  * code-point length >= L + w - 1.
  *
  * Verification stays exact: the index stores hashes, and [[flag]]
  * re-reads gram strings for HASH-HIT positions only — increment grams
  * from the increment itself, corpus grams from the corpus text table
  * pruned to hit documents — so a hash collision can never fabricate a
  * duplicate, exactly the q80 contract.
  *
  * Index parameters (L, w, nCells) are pinned at [[build]] in a
  * root-level PARAMS file (the IvfIndex INDEX-pin pattern, atomic
  * replace): probes and appends always hash with the parameters the
  * standing index was built with — a mismatched L would silently probe
  * nothing.
  *
  * Reference analog: the dedup stages of the curation flow (SURVEY §2
  * rows 80/83/85); the incremental shape follows the q60 MinHash path
  * (Lee et al. 2022 §4's exact-substring semantics, maintained rather
  * than recomputed).
  */
object DupSpansIndex {

  final case class Params(L: Int, w: Int, nCells: Int)

  private def table(spark: SparkSession, root: String): TxnTable =
    TxnTable(spark, s"$root/anchors")

  // ----------------------------------------------------------- params pin
  private def paramsPath(root: String) =
    java.nio.file.Paths.get(root, "PARAMS")

  private def writeParams(root: String, p: Params): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    val dir = java.nio.file.Paths.get(root)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".params-${java.util.UUID.randomUUID()}")
    Files.write(tmp, s"${p.L} ${p.w} ${p.nCells}".getBytes("UTF-8"))
    Files.move(tmp, paramsPath(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING): Unit
  }

  def readParams(root: String): Params = {
    val raw = new String(
      java.nio.file.Files.readAllBytes(paramsPath(root)), "UTF-8").trim
    val Array(l, w, c) = raw.split(' ')
    Params(l.toInt, w.toInt, c.toInt)
  }

  private def celdaOf(part: String): Option[Int] =
    part.split('=') match {
      case Array("celda", v) => scala.util.Try(v.toInt).toOption
      case _ => None
    }

  private def anchorsOf(docs: DataFrame, textCol: String, idCol: String,
                        p: Params): DataFrame = {
    val a =
      if (p.w <= 1) DupSpans.anchors(docs, textCol, idCol, p.L)
      else DupSpans.winnowedAnchors(docs, textCol, idCol, p.L, p.w)
    a.withColumn("celda", pmod(col("h"), lit(p.nCells.toLong)).cast("int"))
  }

  // Writes exchange the anchor rows ON celda first: without it every
  // write task emits a file into every cell it touches — 32 tasks × 64
  // cells = ~2048 files PER COMMIT, and the probe's per-file open tax
  // then grows with every append (measured by the r13 maintenance
  // sweep: per-cycle flag walls climbed 23 s → 42 s over six 500-doc
  // appends at the 10× slice from file count alone — the data grew
  // ~1%/cycle). The exchange is churn-sized 8-byte-hash rows (corpus-
  // sized only at build), i.e. trivial next to 32× fewer files; cells
  // hash onto tasks, so each cell's rows land in exactly ONE task →
  // one file per cell per commit. nCells therefore sizes BOTH probe
  // pruning granularity and per-commit file count — at larger corpora
  // raise nCells, not files-per-cell.
  private def celled(a: DataFrame): DataFrame = a.repartition(col("celda"))

  /** Build the standing inverted file over `docs`; returns the published
    * version. One anchor pass + one partitioned write. */
  def build(docs: DataFrame, textCol: String, idCol: String, root: String,
            L: Int = 48, w: Int = 16, nCells: Int = 64): Long = {
    val p = Params(L, w, nCells)
    writeParams(root, p)
    table(docs.sparkSession, root)
      .overwrite(celled(anchorsOf(docs, textCol, idCol, p)), Seq("celda"))
  }

  /** Append an increment's anchors — O(churn·L) hashing, one append
    * commit; the standing rows are untouched (immutable files). */
  def append(increment: DataFrame, textCol: String, idCol: String,
             root: String): Long = {
    val p = readParams(root)
    table(increment.sparkSession, root)
      .append(celled(anchorsOf(increment, textCol, idCol, p)), Seq("celda"))
  }

  /** Flag an increment against the STANDING index: per increment doc,
    * verified duplicate-anchor count, exact duplicated-char coverage and
    * ratio (zeros for clean docs) — [[DupSpans.flagIncrement]] semantics
    * with the corpus anchor pass replaced by an index read. The index
    * scan opens only the cells the increment's hashes populate (all of
    * them for a large batch, few for a trickle — the IVF probed-cell
    * access pattern); `corpusText` resolves candidate grams for hash-hit
    * corpus documents only. */
  def flag(increment: DataFrame, corpusText: DataFrame, root: String,
           textCol: String, idCol: String, nCharsCol: String): DataFrame = {
    val (p, standing) = standingFor(increment, root, textCol, idCol)
    DupSpans.flagAgainst(increment, corpusText, standing, textCol, idCol,
      p.L, nCharsCol, p.w)
  }

  /** APPLY an increment against the STANDING index: each increment doc
    * rewritten with every span the corpus already holds cut out —
    * [[DupSpans.dropIncrement]] semantics (the corpus owns; zeros-cut
    * pass-through for clean docs) with the corpus anchor pass replaced
    * by the same probed-cell index read as [[flag]]. The daily-ingest
    * TRANSFORM: O(churn·L) hashing, cell-pruned standing scan, per-doc
    * Column rebuild — never a corpus re-anchor. */
  def drop(increment: DataFrame, corpusText: DataFrame, root: String,
           textCol: String, idCol: String): DataFrame = {
    val (p, standing) = standingFor(increment, root, textCol, idCol)
    DupSpans.dropAgainst(increment, corpusText, standing, textCol, idCol,
      p.L, p.w)
  }

  /** Shared probe resolution: params + the standing anchors restricted
    * to the cells the increment's own hashes populate (<= nCells ints
    * cross the driver — the IVF probed-cell access pattern). */
  private def standingFor(increment: DataFrame, root: String,
                          textCol: String, idCol: String): (Params, DataFrame) = {
    val spark = increment.sparkSession
    val p = readParams(root)
    val t = table(spark, root)
    val probedCells = anchorsOf(increment, textCol, idCol, p)
      .select(col("celda")).distinct()
      .collect().map(_.getInt(0)).toSet
    val standing = t.readParts()(part =>
        celdaOf(part).forall(probedCells.contains))
      .select(col("doc_id"), col("pos"), col("h"))
    (p, standing)
  }
}
