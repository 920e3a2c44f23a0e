package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Delta Lake table interop, built directly on the PUBLIC Delta
  * transaction-log protocol (delta.io PROTOCOL.md): the reference's whole
  * lake is Delta-format (`spark.read.format("delta")`, merge, history —
  * common_jobs_functions.py:222–356), so a user pointing graft at the
  * reference's own tables must get their data back without the
  * delta-spark runtime on the classpath.
  *
  * Read side — [[snapshot]]/[[read]]:
  *   - replays `_delta_log/`: latest parquet checkpoint at or below the
  *     requested version (single- or multi-part, discovered via
  *     `_last_checkpoint` with a directory-listing fallback), then the
  *     newline-delimited JSON commits after it, in version order;
  *   - `add` inserts a file keyed by its (percent-decoded) path, `remove`
  *     deletes it, last `metaData` wins — exactly the protocol's state
  *     reconstruction rule;
  *   - schema comes from `metaData.schemaString` (the JSON form of a
  *     Spark StructType); partition columns are reattached from each
  *     file's `partitionValues`, cast to their schema types — Delta data
  *     files do not carry partition columns;
  *   - `protocol` is enforced, not assumed: reader version ≤ 2, or ≤ 3
  *     when every `readerFeatures` entry is supported (timestampNtz,
  *     deletionVectors, columnMapping, v2Checkpoint). Unknown features
  *     fail loudly rather than silently returning wrong rows.
  *   - v2 checkpoints (r7): UUID-named manifests (parquet or json) are
  *     recognized alongside classic single/multi-part layouts; the
  *     manifest's checkpointMetadata version is validated against its
  *     file name, sidecar actions resolve under `_delta_log/_sidecars/`,
  *     and the sidecars' add/remove actions replay like checkpoint rows.
  *   - column mapping (r6), both modes: data columns scan under the
  *     physical names recorded in the schema field metadata and rename
  *     back to logical; partitionValues resolve by physical name; id
  *     mode additionally stamps `parquet.field.id` on the scan schema
  *     and enables Spark's parquet field-id resolution, matching columns
  *     by the ids the writer embedded — so tables whose columns were
  *     RENAMEd (either mode) read correctly.
  *   - deletion vectors (r6): each file's DV descriptor is resolved
  *     (uuid-file / inline-z85 / absolute-path), CRC-verified, and its
  *     RoaringBitmapArray deserialized driver-side; reads drop deleted
  *     rows by probing the broadcast bitmap with the parquet scan's
  *     `_metadata.row_index` — so tables written by current writers
  *     (OPTIMIZE with DVs on) read correctly.
  *
  * Scale: log replay touches file METADATA only (checkpoint scan is a
  * column-pruned distributed read collected as add/remove entries; JSON
  * tails are driver-read, bounded by checkpoint cadence — the same cost
  * class every Delta reader pays to plan a scan). The data scan itself
  * groups files by partition tuple and unions per-group parquet
  * relations, so plan width is the distinct-partition count of the
  * SNAPSHOT (pais × periodo in the reference's facts: hundreds), never
  * the file count.
  *
  * Write side — [[exportTxn]]: publishes a [[TxnTable]] as a valid Delta
  * table IN PLACE (a `_delta_log/` beside the existing `_graft_log/`).
  * Each export commits the DIFF against the previously exported Delta
  * version (adds for new files, removes for dropped ones), so repeated
  * exports build a real Delta history an external Delta reader can time
  * travel; graft itself keeps reading through the richer `_graft_log`.
  * The symlink-manifest export (TxnTable.writeSymlinkManifest) remains
  * for engines that predate Delta support.
  */
object DeltaInterop {

  private val mapper = new ObjectMapper()

  /** Deletion-vector descriptor (PROTOCOL.md "Deletion Vector
    * Descriptor Schema"): `storageType` u = UUID-named file relative to
    * the table, i = inline (z85 in `pathOrInlineDv`), p = absolute path. */
  final case class DvDescriptor(storageType: String, pathOrInlineDv: String,
                                offset: Option[Int], sizeInBytes: Int,
                                cardinality: Long)

  /** One live data file of a snapshot. `partitionValues` uses None for a
    * null partition value (the protocol serializes those as JSON null). */
  final case class DeltaAdd(path: String,
                            partitionValues: Map[String, Option[String]],
                            size: Long,
                            dv: Option[DvDescriptor] = None)

  final case class DeltaSnapshot(version: Long, schema: StructType,
                                 partitionColumns: Seq[String],
                                 files: Seq[DeltaAdd],
                                 columnMappingMode: String = "none")

  def isDeltaTable(root: String): Boolean =
    Files.isDirectory(Paths.get(root, "_delta_log"))

  // -------------------------------------------------------------- reading

  private def logDir(root: String): Path = Paths.get(root, "_delta_log")

  private val commitName = """(\d{20})\.json""".r
  private val checkpointName = """(\d{20})\.checkpoint(\..*)?\.(parquet|json)""".r
  // classic layouts: single file or numbered multi-part
  private val classicSingle = """\d{20}\.checkpoint\.parquet""".r
  private val classicPart = """\d{20}\.checkpoint\.\d{10}\.\d{10}\.parquet""".r
  /** V2 ("UUID-named") checkpoint manifest: n.checkpoint.<uuid>.{parquet,json}. */
  private def isV2Manifest(name: String): Boolean =
    checkpointName.matches(name) &&
      !classicSingle.matches(name) && !classicPart.matches(name)

  private def listLog(root: String): Seq[Path] = {
    val d = logDir(root)
    require(Files.isDirectory(d), s"$root is not a Delta table (no _delta_log)")
    val s = Files.list(d)
    try s.iterator().asScala.toList finally s.close()
  }

  /** Percent-decode a log path (the protocol stores relative paths
    * percent-encoded; '+' is a literal plus, not a space). */
  private def decodePath(p: String): String =
    java.net.URLDecoder.decode(p.replace("+", "%2B"), "UTF-8")

  private def checkProtocol(minReader: Int, readerFeatures: Seq[String]): Unit = {
    val supported =
      Set("timestampNtz", "deletionVectors", "columnMapping", "v2Checkpoint")
    val ok = minReader <= 2 ||
      (minReader <= 3 && readerFeatures.forall(supported.contains))
    require(ok, "unsupported Delta reader protocol: version " + minReader +
      (if (readerFeatures.nonEmpty)
        readerFeatures.mkString(" features [", ", ", "]") else "") +
      " — unknown features would read wrong")
  }

  private def checkMetaData(conf: Map[String, String]): Unit = {
    val mode = conf.getOrElse("delta.columnMapping.mode", "none")
    // name mode resolves physical names from the schema metadata; id
    // mode rides Spark's parquet FIELD-ID resolution (the scan schema
    // carries parquet.field.id from delta.columnMapping.id)
    require(mode == "none" || mode == "name" || mode == "id",
      s"unsupported delta.columnMapping.mode=$mode")
  }

  /** Reconstruct the table state at `version` (default: latest). */
  def snapshot(spark: SparkSession, root: String,
               version: Option[Long] = None): DeltaSnapshot = {
    val entries = listLog(root)
    val commits = entries.flatMap(p => p.getFileName.toString match {
      case commitName(v) => Some(v.toLong -> p)
      case _ => None
    }).toMap
    val checkpoints = entries.flatMap(p => p.getFileName.toString match {
      case checkpointName(v, _, _) => Some(v.toLong -> p)
      case _ => None
    }).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val latest = (commits.keySet ++ checkpoints.keySet).maxOption.getOrElse(
      throw new IllegalArgumentException(s"$root: empty _delta_log"))
    val target = version.getOrElse(latest)
    require(target <= latest, s"$root: version $target > latest $latest")

    // newest usable checkpoint at or below the target; fall back to a
    // full JSON replay from 0 when time traveling below every checkpoint
    val ckptV = checkpoints.keySet.filter(_ <= target).maxOption
      .filter(v => (v + 1 to target).forall(commits.contains))
    val replayFrom = ckptV.map(_ + 1).getOrElse(0L)
    (replayFrom to target).foreach(v => require(commits.contains(v),
      s"$root: missing commit $v (have checkpoint ${ckptV.getOrElse(-1L)})"))

    val files = scala.collection.mutable.LinkedHashMap[String, DeltaAdd]()
    var schema: Option[StructType] = None
    var partCols: Seq[String] = Nil
    var cmMode: String = "none"

    def applyMeta(schemaString: String, parts: Seq[String],
                  conf: Map[String, String]): Unit = {
      checkMetaData(conf)
      schema = Some(DataType.fromJson(schemaString).asInstanceOf[StructType])
      partCols = parts
      cmMode = conf.getOrElse("delta.columnMapping.mode", "none")
    }
    def applyAdd(a: DeltaAdd): Unit = { files(a.path) = a; () }
    def applyRemove(path: String): Unit = { files.remove(path); () }

    // JSON action line (commit or v2 json manifest): apply to the state
    def applyJsonAction(n: JsonNode): Unit = {
      if (n.has("protocol")) {
        val p = n.get("protocol")
        val feats = Option(p.get("readerFeatures")).toSeq
          .flatMap(_.elements().asScala.map(_.asText()))
        checkProtocol(p.get("minReaderVersion").asInt(), feats)
      }
      if (n.has("metaData")) {
        val m = n.get("metaData")
        val parts = Option(m.get("partitionColumns")).toSeq
          .flatMap(_.elements().asScala.map(_.asText()))
        val conf = Option(m.get("configuration")).map(c =>
          c.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
          .getOrElse(Map.empty)
        applyMeta(m.get("schemaString").asText(), parts, conf)
      }
      if (n.has("remove"))
        applyRemove(decodePath(n.get("remove").get("path").asText()))
      if (n.has("add")) {
        val a = n.get("add")
        val pv = Option(a.get("partitionValues")).map(o =>
          o.properties().asScala.map { e =>
            e.getKey -> (if (e.getValue.isNull) None else Some(e.getValue.asText()))
          }.toMap).getOrElse(Map.empty[String, Option[String]])
        val dv = Option(a.get("deletionVector")).filterNot(_.isNull).map { d =>
          DvDescriptor(d.get("storageType").asText(),
            d.get("pathOrInlineDv").asText(),
            Option(d.get("offset")).filterNot(_.isNull).map(_.asInt()),
            d.get("sizeInBytes").asInt(),
            d.get("cardinality").asLong())
        }
        applyAdd(DeltaAdd(decodePath(a.get("path").asText()), pv,
          Option(a.get("size")).map(_.asLong()).getOrElse(0L), dv))
      }
    }

    // ---- checkpoint: distributed column-pruned scan of the action table.
    // Classic layout (single file or numbered multi-part) carries every
    // action in the n.checkpoint*.parquet files themselves. The V2 layout
    // (PROTOCOL.md "V2 Checkpoint Table Feature": UUID-named
    // n.checkpoint.<uuid>.{parquet,json} manifest) carries a
    // checkpointMetadata action, SIDECAR actions pointing at parquet files
    // under _delta_log/_sidecars/ that hold the add/remove actions, and
    // possibly inline add/remove in the manifest itself.
    ckptV.foreach { v =>
      val sidecars = scala.collection.mutable.ArrayBuffer[String]()
      // the replay consumes a FIXED subset of each action's fields —
      // prune the scan to those before anything reaches the driver, and
      // stream the rows (toLocalIterator) instead of collecting one
      // array, so a million-add checkpoint costs the driver one row of
      // pruned fields at a time, not the full action structs at once
      val consumedFields: Map[String, Seq[String]] = Map(
        "protocol" -> Seq("minReaderVersion", "readerFeatures"),
        "metaData" -> Seq("schemaString", "partitionColumns", "configuration"),
        "add" -> Seq("path", "partitionValues", "size", "deletionVector"),
        "remove" -> Seq("path"),
        "checkpointMetadata" -> Seq("version"),
        "sidecar" -> Seq("path"))
      def scanActionParquet(paths: Seq[String]): Unit = {
        val df = spark.read.parquet(paths: _*)
        val cols = df.columns.toSet
        Seq("protocol", "metaData", "add", "remove", "checkpointMetadata",
            "sidecar").filter(cols).foreach { c =>
          val avail = df.schema(c).dataType
            .asInstanceOf[StructType].fieldNames.toSet
          val fields = consumedFields(c).filter(avail)
          val it = df.filter(col(c).isNotNull)
            .select(struct(fields.map(f => col(s"$c.$f").as(f)): _*).as(c))
            .toLocalIterator()
          while (it.hasNext) {
            val s = it.next().getStruct(0)
            c match {
              case "protocol" =>
                val feats =
                  if (s.schema.fieldNames.contains("readerFeatures") &&
                      !s.isNullAt(s.fieldIndex("readerFeatures")))
                    s.getSeq[String](s.fieldIndex("readerFeatures"))
                  else Nil
                checkProtocol(s.getInt(s.fieldIndex("minReaderVersion")), feats)
              case "metaData" =>
                val conf =
                  if (s.schema.fieldNames.contains("configuration") &&
                      !s.isNullAt(s.fieldIndex("configuration")))
                    s.getMap[String, String](s.fieldIndex("configuration")).toMap
                  else Map.empty[String, String]
                applyMeta(s.getString(s.fieldIndex("schemaString")),
                  s.getSeq[String](s.fieldIndex("partitionColumns")), conf)
              case "add" =>
                val dv =
                  if (s.schema.fieldNames.contains("deletionVector") &&
                      !s.isNullAt(s.fieldIndex("deletionVector"))) {
                    val d = s.getStruct(s.fieldIndex("deletionVector"))
                    Some(DvDescriptor(
                      d.getString(d.fieldIndex("storageType")),
                      d.getString(d.fieldIndex("pathOrInlineDv")),
                      if (d.schema.fieldNames.contains("offset") &&
                          !d.isNullAt(d.fieldIndex("offset")))
                        Some(d.getInt(d.fieldIndex("offset"))) else None,
                      d.getInt(d.fieldIndex("sizeInBytes")),
                      d.getLong(d.fieldIndex("cardinality"))))
                  } else None
                applyAdd(DeltaAdd(decodePath(s.getString(s.fieldIndex("path"))),
                  rowPartitionValues(s), s.getLong(s.fieldIndex("size")), dv))
              case "remove" =>
                applyRemove(decodePath(s.getString(s.fieldIndex("path"))))
              case "checkpointMetadata" =>
                val cv = s.getLong(s.fieldIndex("version"))
                require(cv == v, s"v2 checkpoint manifest claims version $cv, " +
                  s"file name says $v")
              case "sidecar" =>
                sidecars += s.getString(s.fieldIndex("path")); ()
            }
          }
        }
      }
      val (v2s, classic) =
        checkpoints(v).partition(p => isV2Manifest(p.getFileName.toString))
      if (v2s.nonEmpty) {
        // any one manifest is a complete checkpoint — writers may leave
        // several; pick deterministically
        val manifest = v2s.minBy(_.getFileName.toString)
        if (manifest.getFileName.toString.endsWith(".json")) {
          Files.readAllLines(manifest).asScala.filter(_.nonEmpty).foreach { line =>
            val n = mapper.readTree(line)
            applyJsonAction(n)
            if (n.has("checkpointMetadata")) {
              val cv = n.get("checkpointMetadata").get("version").asLong()
              require(cv == v, s"v2 checkpoint manifest claims version $cv, " +
                s"file name says $v")
            }
            if (n.has("sidecar")) {
              sidecars += n.get("sidecar").get("path").asText(); ()
            }
          }
        } else scanActionParquet(Seq(manifest.toString))
        val resolved = sidecars.toSeq.map { p =>
          val d = decodePath(p)
          if (d.startsWith("/") || d.contains("://")) d
          else logDir(root).resolve("_sidecars").resolve(d).toString
        }
        if (resolved.nonEmpty) scanActionParquet(resolved)
      } else scanActionParquet(classic.map(_.toString))
    }

    // ---- JSON commits after the checkpoint, in version order
    (replayFrom to target).foreach { v =>
      Files.readAllLines(commits(v)).asScala.filter(_.nonEmpty)
        .foreach(line => applyJsonAction(mapper.readTree(line)))
    }

    DeltaSnapshot(target,
      schema.getOrElse(throw new IllegalStateException(
        s"$root: no metaData action in log up to version $target")),
      partCols, files.values.toList, cmMode)
  }

  // ----------------------------------------------------- deletion vectors
  // PROTOCOL.md "Deletion Vectors": a DV is a RoaringBitmapArray of the
  // file's deleted row indexes (64-bit index = [32-bit bitmap ordinal |
  // 32-bit position]). On-disk DV files start with a format-version byte
  // (1); each blob inside is <int32-BE dataSize><bitmap bytes><int32-BE
  // CRC-32 of the bitmap bytes>, the descriptor's offset pointing at the
  // size. The bitmap serialization is "portable": int32-LE magic
  // 1681511377, int64-LE count of SERIALIZED bitmaps, then for each
  // NON-EMPTY bitmap in ascending key order an int32-LE key followed by
  // the standard-format 32-bit RoaringBitmap (the library Spark already
  // ships). Empty bitmaps are skipped, so the logical array is sized by
  // the largest key, not the serialized count.

  /** Driver-loaded, broadcast-friendly deleted-row membership test. */
  final class DvBitmap(bitmaps: Array[org.roaringbitmap.RoaringBitmap])
      extends Serializable {
    def contains(rowIndex: Long): Boolean = {
      val hi = (rowIndex >>> 32).toInt
      hi < bitmaps.length && bitmaps(hi) != null &&
        bitmaps(hi).contains(rowIndex.toInt)
    }
    def cardinality: Long = bitmaps.filter(_ != null).map(_.getLongCardinality).sum
  }

  private val z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val z85Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  /** Z85 decode (the base85 variant the protocol prescribes): 5 chars ->
    * one big-endian uint32 -> 4 bytes. Input length must be ≡ 0 (mod 5). */
  private[sources] def z85(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      (0 until 5).foreach { j =>
        val c = s.charAt(i + j)
        val d = if (c < 128) z85Decode(c.toInt) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
      }
      val o = i / 5 * 4
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
      i += 5
    }
    out
  }

  private def dvFilePath(root: String, dv: DvDescriptor): Path =
    dv.storageType match {
      case "p" => Paths.get(dv.pathOrInlineDv)
      case "u" =>
        val enc = dv.pathOrInlineDv
        require(enc.length >= 20, s"DV uuid token too short: $enc")
        val prefix = enc.dropRight(20)
        val u = z85(enc.takeRight(20))
        val bb = java.nio.ByteBuffer.wrap(u)
        val uuid = new UUID(bb.getLong, bb.getLong)
        val name = s"deletion_vector_$uuid.bin"
        if (prefix.isEmpty) Paths.get(root, name)
        else Paths.get(root, prefix, name)
      case other =>
        throw new IllegalArgumentException(s"unknown DV storageType $other")
    }

  /** Load and verify one file's deletion vector. */
  def loadDv(root: String, dv: DvDescriptor): DvBitmap = {
    val bitmapBytes: Array[Byte] = dv.storageType match {
      case "i" =>
        val b = z85(dv.pathOrInlineDv)
        // z85 pads to 4-byte groups; the descriptor carries the true size
        b.take(dv.sizeInBytes)
      case _ =>
        val p = dvFilePath(root, dv)
        val all = Files.readAllBytes(p)
        require(all.nonEmpty && all(0) == 1,
          s"$p: unsupported DV file format version ${if (all.isEmpty) "?" else all(0)}")
        val off = dv.offset.getOrElse(1)
        val bb = java.nio.ByteBuffer.wrap(all, off, all.length - off)
        val size = bb.getInt // big-endian
        require(size == dv.sizeInBytes,
          s"$p: DV blob size $size != descriptor sizeInBytes ${dv.sizeInBytes}")
        val data = new Array[Byte](size)
        bb.get(data)
        val expected = bb.getInt
        val crc = new java.util.zip.CRC32()
        crc.update(data)
        require(crc.getValue.toInt == expected,
          s"$p: DV checksum mismatch (stored $expected, computed ${crc.getValue.toInt})")
        data
    }
    val bb = java.nio.ByteBuffer.wrap(bitmapBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == 1681511377, s"bad RoaringBitmapArray magic $magic")
    val n = bb.getLong
    require(n >= 0 && n <= Int.MaxValue, s"absurd DV bitmap count $n")
    val MaxDvKey = 1 << 21
    // each serialized bitmap is prefixed by its int32-LE key; only
    // non-empty bitmaps appear, in ascending key order, so the logical
    // array spans [0, maxKey] with gaps left null
    val entries = new Array[(Int, org.roaringbitmap.RoaringBitmap)](n.toInt)
    var lastKey = -1
    var i = 0
    while (i < n.toInt) {
      val key = bb.getInt
      require(key > lastKey,
        s"DV bitmap keys must be non-negative and strictly ascending (got $key after $lastKey)")
      // the key is the high-32 of a 64-bit row index; 2^21 keys covers
      // 2^53 rows per data file, so anything larger is a corrupt or
      // hostile blob — fail loudly instead of allocating a multi-GB
      // logical array below (mirrors the "absurd DV bitmap count" guard)
      require(key <= MaxDvKey,
        s"absurd DV bitmap key $key (cap $MaxDvKey) — corrupt deletion vector")
      val bm = new org.roaringbitmap.RoaringBitmap()
      bm.deserialize(bb)
      bb.position(bb.position() + bm.serializedSizeInBytes())
      entries(i) = (key, bm)
      lastKey = key
      i += 1
    }
    val bms = new Array[org.roaringbitmap.RoaringBitmap](
      if (n == 0) 0 else lastKey + 1)
    entries.foreach { case (k, bm) => bms(k) = bm }
    val out = new DvBitmap(bms)
    require(dv.cardinality < 0 || out.cardinality == dv.cardinality,
      s"DV cardinality ${out.cardinality} != descriptor ${dv.cardinality}")
    out
  }

  private def rowPartitionValues(s: Row): Map[String, Option[String]] =
    if (s.schema.fieldNames.contains("partitionValues") &&
        !s.isNullAt(s.fieldIndex("partitionValues")))
      s.getMap[String, String](s.fieldIndex("partitionValues"))
        .map { case (k, v) => k -> Option(v) }.toMap
    else Map.empty

  /** Column-mapping (name mode): the parquet files store columns under
    * the physical name recorded in the field metadata; logical names live
    * only in the schema. Nested mapped fields are out of scope (flat
    * reference schemas) and fail loudly. */
  private def physicalName(f: org.apache.spark.sql.types.StructField): String = {
    val key = "delta.columnMapping.physicalName"
    // nested mapped fields (struct/array/map at any depth) would need
    // physical-name resolution inside the scan schema — refuse loudly
    def nestedMapped(dt: DataType): Boolean = dt match {
      case s: StructType =>
        s.fields.exists(x => x.metadata.contains(key) || nestedMapped(x.dataType))
      case a: org.apache.spark.sql.types.ArrayType => nestedMapped(a.elementType)
      case m: org.apache.spark.sql.types.MapType =>
        nestedMapped(m.keyType) || nestedMapped(m.valueType)
      case _ => false
    }
    if (nestedMapped(f.dataType))
      throw new IllegalArgumentException(
        s"column mapping on nested field ${f.name} is not supported")
    if (f.metadata.contains(key)) f.metadata.getString(key) else f.name
  }

  private def normalizeFilePath(p: String): String =
    try {
      val u = new java.net.URI(p)
      Option(u.getPath).filter(_.nonEmpty).getOrElse(p)
    } catch { case _: Throwable => p }

  /** Read the table as a DataFrame at `version` (default: latest).
    *
    * Id-mode column-mapping caveat: the field-id parquet resolution rides
    * a session conf that the parquet reader resolves from the ACTIVE
    * session at planning time. The returned DataFrame is built on a
    * derived session with the flag on, so it plans correctly when
    * executed as returned (actions on this df, joins where it is the
    * driver side). Composing it under a DIFFERENT session that has
    * `spark.sql.parquet.fieldId.read.enabled=false` (e.g. as the right
    * side of a join planned by the caller's session) can silently
    * mis-resolve id-mapped columns by name — if you need that, set the
    * flag in the composing session, or materialize this df first. Only
    * id-mode tables are affected; name-mode and unmapped tables carry no
    * session state. */
  def read(spark: SparkSession, root: String,
           version: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, root, version)
    // data columns scan under their PHYSICAL names (column mapping; equal
    // to the logical name in unmapped tables), then rename back. In id
    // mode the scan schema also carries parquet.field.id so Spark's
    // parquet reader matches columns by the writer-embedded field ids
    // (names in id-mode files are not contractual).
    val dataFields = snap.schema.fields
      .filterNot(f => snap.partitionColumns.contains(f.name))
    val byFieldId = snap.columnMappingMode == "id"
    // field-id resolution is a session conf the parquet reader captures at
    // execution time, so it can't be set-and-restored around a lazy scan;
    // instead the id-mode scan runs on a DERIVED session (same context,
    // runtime confs copied over) with the flag on, leaving the caller's
    // session untouched for unrelated reads
    val scanSpark: SparkSession = if (byFieldId) {
      val ns = spark.newSession()
      spark.conf.getAll.foreach { case (k, v) =>
        try ns.conf.set(k, v) catch { case _: Throwable => () } // static confs
      }
      ns.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
      ns
    } else spark
    val dataSchema = StructType(dataFields.map { f =>
      val meta =
        if (byFieldId && f.metadata.contains("delta.columnMapping.id"))
          new org.apache.spark.sql.types.MetadataBuilder()
            .putLong("parquet.field.id",
              f.metadata.getLong("delta.columnMapping.id")).build()
        else org.apache.spark.sql.types.Metadata.empty
      org.apache.spark.sql.types.StructField(
        physicalName(f), f.dataType, f.nullable, meta)
    })
    val renames: Seq[(String, String)] =
      dataFields.map(f => physicalName(f) -> f.name).toSeq
    val partFields = snap.partitionColumns.map(c =>
      snap.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalStateException(s"partition column $c not in schema")))
    val partTypes = partFields.map(f => f.name -> f.dataType)
    // partitionValues in the log are keyed by PHYSICAL name
    val partPhysical: Map[String, String] =
      partFields.map(f => f.name -> physicalName(f)).toMap
    def abs(p: String): String =
      if (p.startsWith("/") || p.contains("://")) p else s"$root/$p"
    // DVs are per-file metadata, bounded by design (a bitmap over one
    // file's row indexes): load them driver-side once, broadcast, and
    // filter on the parquet scan's (_metadata.file_path, row_index) — a
    // constant-time membership probe per row, no join, no index
    // materialization. FAIL-CLOSED: the scan-side path string can differ
    // from the log-side path in scheme/relativity/encoding, so lookups
    // resolve by canonical path AND any miss whose file NAME belongs to
    // a DV'd file throws — deleted rows must never silently reappear
    // because of a key-normalization mismatch.
    def canonical(p: String): String =
      try new java.io.File(normalizeFilePath(p)).getCanonicalPath
      catch { case _: Throwable => normalizeFilePath(p) }
    def baseName(p: String): String =
      normalizeFilePath(p).substring(normalizeFilePath(p).lastIndexOf('/') + 1)
    val dvByPath: Map[String, DvBitmap] =
      snap.files.filter(_.dv.isDefined)
        .map(f => canonical(abs(f.path)) -> loadDv(root, f.dv.get)).toMap
    val dvNames: Set[String] =
      snap.files.filter(_.dv.isDefined).map(f => baseName(f.path)).toSet
    val applyDvs: DataFrame => DataFrame =
      if (dvByPath.isEmpty) identity
      else {
        val bcMap = spark.sparkContext.broadcast(dvByPath)
        val bcNames = spark.sparkContext.broadcast(dvNames)
        val keep = udf { (path: String, idx: Long) =>
          bcMap.value.get(
            try new java.io.File(
              new java.net.URI(path).getPath match { case null => path; case p => p })
              .getCanonicalPath
            catch { case _: Throwable => path }) match {
            case Some(bm) => !bm.contains(idx)
            case None =>
              val name = path.substring(path.lastIndexOf('/') + 1)
              if (bcNames.value.contains(name))
                throw new IllegalStateException(
                  s"deletion vector for $path failed to resolve by canonical " +
                    "path — refusing to return rows the DV may delete")
              true
          }
        }
        df => df.withColumn("__dv_path", col("_metadata.file_path"))
          .withColumn("__dv_idx", col("_metadata.row_index"))
          .filter(keep(col("__dv_path"), col("__dv_idx")))
          .drop("__dv_path", "__dv_idx")
      }
    def renamed(df: DataFrame): DataFrame =
      df.select(renames.map { case (ph, lg) => col(ph).as(lg) }: _*)
    if (snap.files.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], snap.schema)
    } else if (snap.partitionColumns.isEmpty) {
      renamed(applyDvs(
        scanSpark.read.schema(dataSchema).parquet(snap.files.map(f => abs(f.path)): _*)))
    } else {
      // one relation per distinct partition tuple: the tuple's values are
      // attached as typed literals (protocol: data files carry no
      // partition columns), then unioned by name
      val groups = snap.files.groupBy(f =>
        snap.partitionColumns.map(c =>
          f.partitionValues.getOrElse(partPhysical(c), None)))
      groups.map { case (tuple, fs) =>
        val base = renamed(applyDvs(
          scanSpark.read.schema(dataSchema).parquet(fs.map(f => abs(f.path)): _*)))
        snap.partitionColumns.zip(tuple).zip(partTypes).foldLeft(base) {
          case (df, ((c, v), (_, dt))) =>
            df.withColumn(c, v.map(s => lit(s).cast(dt)).getOrElse(
              lit(null).cast(dt)))
        }
      }.reduce(_.unionByName(_)).select(snap.schema.fieldNames.map(col): _*)
    }
  }

  // ------------------------------------------------------------ exporting

  /** Hive-style partition dir ("a=1/b=x y") -> partitionValues pairs,
    * decoding the writer-escaped segment values. */
  private def partValuesOf(part: String): Seq[(String, String)] =
    if (part.isEmpty) Nil
    else part.split('/').toSeq.map { seg =>
      val i = seg.indexOf('=')
      require(i > 0, s"not a hive-style partition segment: $seg")
      seg.substring(0, i) -> decodePath(seg.substring(i + 1))
    }

  /** RFC 3986 path-segment encoding (NOT form encoding: '=' and '+' are
    * legal in a path segment and real Delta writers leave them bare;
    * URLEncoder would escape '=' and break hive-style paths). */
  private def encodeSegment(s: String): String =
    s.flatMap {
      case c if c.isLetterOrDigit && c < 128 => c.toString
      case c if "-._~!$&'()*+,;=:@".indexOf(c.toInt) >= 0 => c.toString
      case c => c.toString.getBytes("UTF-8")
        .map(b => f"%%${b & 0xff}%02X").mkString
    }

  /** Publish `txn`'s CURRENT version as the next commit of a Delta log at
    * the table root. First call writes version 0 (protocol + metaData +
    * every live file); later calls commit only the file diff since the
    * previous export. Returns the Delta version written, or -1 when the
    * export is already up to date (no diff — Delta forbids empty
    * commits). */
  def exportTxn(txn: TxnTable): Long = {
    val spark = txn.spark
    val entries = txn.entriesFull()
    require(entries.nonEmpty, s"${txn.root}: nothing committed to export")
    val df = txn.read()
    val schema = df.schema
    val partCols = partValuesOf(entries.map(_.part).find(_.nonEmpty).getOrElse(""))
      .map(_._1)

    def relPath(e: TxnEntry): String = {
      val segs = "data" +: (if (e.part.isEmpty) Seq(e.file)
                            else e.part.split('/').toSeq :+ e.file)
      segs.map(encodeSegment).mkString("/")
    }

    val current: Map[String, TxnEntry] = entries.map(e => relPath(e) -> e).toMap
    val dir = logDir(txn.root)
    Files.createDirectories(dir)
    // "first export" is an EMPTY LOG, not an empty prior file set (a
    // valid prior commit can remove every file), and the next version
    // comes from the replayed snapshot version — JSON commit names alone
    // under-count on checkpoint-only logs (retention may have cleaned
    // every commit at/below the checkpoint)
    val priorSnap =
      if (listLogSafe(txn.root).isEmpty) None
      else Some(snapshot(spark, txn.root))
    val prior: Map[String, DeltaAdd] = priorSnap
      .map(_.files.map(f =>
        f.path.split('/').map(encodeSegment).mkString("/") -> f).toMap)
      .getOrElse(Map.empty)
    val nextV = priorSnap.map(_.version + 1L).getOrElse(0L)

    val adds = current.filterNot { case (p, _) => prior.contains(p) }
    val removes = prior.keySet.diff(current.keySet)
    // schema evolution must re-commit metaData even with no file churn
    val schemaChanged = priorSnap.exists(_.schema.json != schema.json)
    if (nextV > 0 && adds.isEmpty && removes.isEmpty && !schemaChanged)
      return -1L

    val now = System.currentTimeMillis()
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    if (nextV == 0L) {
      val protocol = mapper.createObjectNode()
      protocol.putObject("protocol")
        .put("minReaderVersion", 1).put("minWriterVersion", 2)
      lines += mapper.writeValueAsString(protocol)
    }
    if (nextV == 0L || schemaChanged) {
      val metaWrap = mapper.createObjectNode()
      val meta = metaWrap.putObject("metaData")
      // deterministic id: re-exporting the same table keeps its identity
      meta.put("id", UUID.nameUUIDFromBytes(
        ("graft:" + txn.root).getBytes("UTF-8")).toString)
      val fmt = meta.putObject("format")
      fmt.put("provider", "parquet")
      fmt.putObject("options")
      meta.put("schemaString", schema.json)
      val pc: ArrayNode = meta.putArray("partitionColumns")
      partCols.foreach(pc.add)
      meta.putObject("configuration")
      meta.put("createdTime", now)
      lines += mapper.writeValueAsString(metaWrap)
    }
    removes.toSeq.sorted.foreach { p =>
      val w = mapper.createObjectNode()
      w.putObject("remove").put("path", p)
        .put("deletionTimestamp", now).put("dataChange", true)
      lines += mapper.writeValueAsString(w)
    }
    adds.toSeq.sortBy(_._1).foreach { case (p, e) =>
      val w = mapper.createObjectNode()
      val a: ObjectNode = w.putObject("add")
      a.put("path", p)
      val pv = a.putObject("partitionValues")
      partValuesOf(e.part).foreach { case (k, v) => pv.put(k, v) }
      val f = Paths.get(txn.root).resolve(
        if (e.part.isEmpty) Paths.get("data", e.file)
        else Paths.get("data", e.part.split('/') :+ e.file: _*))
      a.put("size", Files.size(f))
      a.put("modificationTime", Files.getLastModifiedTime(f).toMillis)
      a.put("dataChange", true)
      lines += mapper.writeValueAsString(w)
    }
    // atomic publish: same-volume move, mirroring the txn log's commits
    val tmp = dir.resolve(s".tmp-${UUID.randomUUID()}")
    Files.write(tmp, lines.asJava)
    Files.move(tmp, dir.resolve(f"$nextV%020d.json"), StandardCopyOption.ATOMIC_MOVE)
    nextV
  }

  private def listLogSafe(root: String): Seq[Path] =
    if (Files.isDirectory(logDir(root))) listLog(root) else Nil
}
