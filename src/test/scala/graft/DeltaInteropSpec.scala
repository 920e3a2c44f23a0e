package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{DeltaInterop, LakeIO, TxnTable}

// checkpoint action rows (top level so Spark derives an Encoder)
case class CkProtocol(minReaderVersion: Int, minWriterVersion: Int)
case class CkFormat(provider: String)
case class CkMeta(id: String, schemaString: String,
                  partitionColumns: Seq[String],
                  configuration: Map[String, String], format: CkFormat)
case class CkAdd(path: String, partitionValues: Map[String, String],
                 size: Long, modificationTime: Long, dataChange: Boolean)
case class CkRow(protocol: Option[CkProtocol], metaData: Option[CkMeta],
                 add: Option[CkAdd])
// v2 (UUID-named) checkpoint actions
case class CkProtocolV2(minReaderVersion: Int, minWriterVersion: Int,
                        readerFeatures: Seq[String], writerFeatures: Seq[String])
case class CkCkptMeta(version: Long)
case class CkSidecar(path: String, sizeInBytes: Long, modificationTime: Long)
case class CkRemove(path: String, deletionTimestamp: Long, dataChange: Boolean)
case class V2ManifestRow(protocol: Option[CkProtocolV2],
                         metaData: Option[CkMeta],
                         checkpointMetadata: Option[CkCkptMeta],
                         sidecar: Option[CkSidecar],
                         add: Option[CkAdd])
case class SidecarRow(add: Option[CkAdd], remove: Option[CkRemove])

/** Delta-log interop: reading hand-crafted tables shaped exactly like a
  * delta-spark writer's output (JSON commits, parquet checkpoint,
  * partition values, protocol actions), and publishing a TxnTable as a
  * valid Delta history. The fixtures are built from the PUBLIC protocol
  * spec, not from a Delta runtime — which is the point: the reference's
  * lake must open without one. */
class DeltaInteropSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmpDir(prefix: String): Path =
    Files.createTempDirectory(prefix)

  /** Write `df` as exactly one parquet file at `target`. */
  private def oneFile(df: DataFrame, target: Path): Unit = {
    val stage = tmpDir("delta_stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = Files.list(stage).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.createDirectories(target.getParent)
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING): Unit
  }

  private def writeCommit(root: Path, v: Long, lines: Seq[String]): Unit = {
    val dir = root.resolve("_delta_log")
    Files.createDirectories(dir)
    Files.write(dir.resolve(f"$v%020d.json"), lines.asJava): Unit
  }

  private val dataSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType)))

  private def metaLine(schema: StructType, partCols: Seq[String]): String = {
    val pc = partCols.map(c => "\"" + c + "\"").mkString("[", ",", "]")
    s"""{"metaData":{"id":"00000000-0000-0000-0000-000000000001","format":{"provider":"parquet","options":{}},"schemaString":${
      com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
        .writeValueAsString(schema.json)},"partitionColumns":$pc,"configuration":{},"createdTime":1}}"""
  }
  private val protocolLine =
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  test("replays json commits: add, remove, metaData, time travel") {
    val root = tmpDir("delta_json")
    oneFile(Seq((1, "a"), (2, "b")).toDF("id", "name"),
      root.resolve("f1.parquet"))
    oneFile(Seq((3, "c")).toDF("id", "name"), root.resolve("f2.parquet"))
    oneFile(Seq((4, "d")).toDF("id", "name"), root.resolve("f3.parquet"))
    writeCommit(root, 0, Seq(protocolLine, metaLine(dataSchema, Nil),
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}""",
      """{"add":{"path":"f2.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    writeCommit(root, 1, Seq(
      """{"commitInfo":{"operation":"MERGE"}}""",
      """{"remove":{"path":"f2.parquet","deletionTimestamp":2,"dataChange":true}}""",
      """{"add":{"path":"f3.parquet","partitionValues":{},"size":1,"modificationTime":2,"dataChange":true}}"""))
    val latest = DeltaInterop.read(spark, root.toString)
    assert(latest.as[(Int, String)].collect().sorted.toSeq ==
      Seq((1, "a"), (2, "b"), (4, "d")))
    val v0 = DeltaInterop.read(spark, root.toString, Some(0L))
    assert(v0.as[(Int, String)].collect().sorted.toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("partition values reattach as typed columns, including nulls") {
    val root = tmpDir("delta_part")
    val schema = StructType(dataSchema.fields ++ Seq(
      StructField("pe", IntegerType), StructField("ps", StringType)))
    oneFile(Seq((1, "a")).toDF("id", "name"),
      root.resolve(Paths.get("pe=10", "ps=x y", "p1.parquet")))
    oneFile(Seq((2, "b")).toDF("id", "name"),
      root.resolve(Paths.get("pe=20", "ps=__HIVE_DEFAULT_PARTITION__", "p2.parquet")))
    writeCommit(root, 0, Seq(protocolLine, metaLine(schema, Seq("pe", "ps")),
      // delta percent-encodes the path; the space in "x y" becomes %20
      """{"add":{"path":"pe=10/ps=x%20y/p1.parquet","partitionValues":{"pe":"10","ps":"x y"},"size":1,"modificationTime":1,"dataChange":true}}""",
      """{"add":{"path":"pe=20/ps=__HIVE_DEFAULT_PARTITION__/p2.parquet","partitionValues":{"pe":"20","ps":null},"size":1,"modificationTime":1,"dataChange":true}}"""))
    val df = DeltaInterop.read(spark, root.toString)
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq("id" -> IntegerType, "name" -> StringType,
          "pe" -> IntegerType, "ps" -> StringType))
    val rows = df.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getInt(2),
        Option(r.get(3)).map(_.toString))).sorted
    assert(rows.toSeq == Seq((1, "a", 10, Some("x y")), (2, "b", 20, None)))
  }

  test("checkpoint parquet is the replay base; earlier json not needed") {
    val root = tmpDir("delta_ckpt")
    oneFile(Seq((1, "a")).toDF("id", "name"), root.resolve("c1.parquet"))
    oneFile(Seq((2, "b")).toDF("id", "name"), root.resolve("c2.parquet"))
    // checkpoint at version 1 carrying the full state: protocol, meta, c1
    val ck = Seq(
      CkRow(Some(CkProtocol(1, 2)), None, None),
      CkRow(None, Some(CkMeta("00000000-0000-0000-0000-000000000002",
        dataSchema.json, Nil, Map.empty, CkFormat("parquet"))), None),
      CkRow(None, None, Some(CkAdd("c1.parquet", Map.empty, 1L, 1L, true))))
    oneFile(ck.toDF(),
      root.resolve(Paths.get("_delta_log", f"${1L}%020d.checkpoint.parquet")))
    // only the post-checkpoint commit exists as json — replay must start
    // from the checkpoint, not demand versions 0..1
    writeCommit(root, 2, Seq(
      """{"add":{"path":"c2.parquet","partitionValues":{},"size":1,"modificationTime":3,"dataChange":true}}"""))
    val df = DeltaInterop.read(spark, root.toString)
    assert(df.as[(Int, String)].collect().sorted.toSeq ==
      Seq((1, "a"), (2, "b")))
    assert(DeltaInterop.snapshot(spark, root.toString).version == 2L)
  }

  test("unsupported reader protocol fails loudly, not wrong") {
    val root = tmpDir("delta_proto")
    writeCommit(root, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["someFutureFeature"]}}""",
      metaLine(dataSchema, Nil)))
    val e = intercept[IllegalArgumentException] {
      DeltaInterop.snapshot(spark, root.toString)
    }
    assert(e.getMessage.contains("someFutureFeature") ||
      e.getMessage.contains("unsupported"))
    // an unknown mapping mode is fatal
    val root2 = tmpDir("delta_proto2")
    writeCommit(root2, 0, Seq(protocolLine,
      """{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},"schemaString":"{\"type\":\"struct\",\"fields\":[]}","partitionColumns":[],"configuration":{"delta.columnMapping.mode":"hybrid"},"createdTime":1}}"""))
    intercept[IllegalArgumentException] {
      DeltaInterop.snapshot(spark, root2.toString)
    }
  }

  test("column mapping (id mode): columns resolve by parquet field id") {
    import org.apache.spark.sql.types.{Metadata, MetadataBuilder}
    val root = tmpDir("delta_cmid")
    def mapped(phys: String, id: Int): Metadata =
      new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id.toLong).build()
    val logical = StructType(Seq(
      StructField("id", IntegerType, nullable = true, mapped("col-aaaa", 1)),
      StructField("name", StringType, nullable = true, mapped("col-bbbb", 2))))
    // write the data file the way an id-mode writer does: physical column
    // names + parquet field ids embedded in the footer
    val writeSchema = StructType(Seq(
      StructField("col-aaaa", IntegerType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 1L).build()),
      StructField("col-bbbb", StringType, nullable = true,
        new MetadataBuilder().putLong("parquet.field.id", 2L).build())))
    val data = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1, "a"), org.apache.spark.sql.Row(2, "b")),
      writeSchema)
    val prior = spark.conf.getOption("spark.sql.parquet.fieldId.write.enabled")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    try oneFile(data, root.resolve("f1.parquet"))
    finally prior match {
      case Some(v) => spark.conf.set("spark.sql.parquet.fieldId.write.enabled", v)
      case None => spark.conf.unset("spark.sql.parquet.fieldId.write.enabled")
    }
    val metaJson = com.fasterxml.jackson.databind.json.JsonMapper.builder()
      .build().writeValueAsString(logical.json)
    writeCommit(root, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"m","format":{"provider":"parquet","options":{}},"schemaString":$metaJson,"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"id","delta.columnMapping.maxColumnId":"2"},"createdTime":1}}""",
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    val got = DeltaInterop.read(spark, root.toString)
    assert(got.columns.toSeq == Seq("id", "name"))
    assert(got.as[(Int, String)].collect().sorted.toSeq ==
      Seq((1, "a"), (2, "b")))
  }

  test("column mapping (name mode): physical names scan, logical names return") {
    import org.apache.spark.sql.types.{Metadata, MetadataBuilder}
    val root = tmpDir("delta_cmap")
    def mapped(name: String, phys: String, id: Int): Metadata =
      new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", id.toLong).build()
    val logical = StructType(Seq(
      StructField("id", IntegerType, nullable = true, mapped("id", "col-aaaa", 1)),
      StructField("name", StringType, nullable = true, mapped("name", "col-bbbb", 2)),
      StructField("pais", StringType, nullable = true, mapped("pais", "col-cccc", 3))))
    // data files carry the PHYSICAL column names, partition col excluded
    val df = Seq((1, "a"), (2, "b")).toDF("col-aaaa", "col-bbbb")
    oneFile(df, root.resolve("f1.parquet"))
    val metaJson = com.fasterxml.jackson.databind.json.JsonMapper.builder()
      .build().writeValueAsString(logical.json)
    writeCommit(root, 0, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"m","format":{"provider":"parquet","options":{}},"schemaString":$metaJson,"partitionColumns":["pais"],"configuration":{"delta.columnMapping.mode":"name","delta.columnMapping.maxColumnId":"3"},"createdTime":1}}""",
      // partitionValues keyed by the PHYSICAL partition column name
      """{"add":{"path":"f1.parquet","partitionValues":{"col-cccc":"PE"},"size":1,"modificationTime":1,"dataChange":true}}"""))
    val got = DeltaInterop.read(spark, root.toString)
    assert(got.columns.toSeq == Seq("id", "name", "pais"))
    assert(got.as[(Int, String, String)].collect().sorted.toSeq ==
      Seq((1, "a", "PE"), (2, "b", "PE")))
  }

  // --- deletion vectors (r6): serialize a RoaringBitmapArray exactly as
  // the protocol prescribes and read a DV'd table back correctly

  /** Portable RoaringBitmapArray bytes for 64-bit row indexes, matching
    * real Delta writers: only NON-EMPTY bitmaps are serialized, each
    * prefixed by its int32-LE key, in ascending key order. */
  private def dvBitmapBytes(rows: Seq[Long]): Array[Byte] = {
    val byHi = rows.groupBy(r => (r >>> 32).toInt)
    val keys = byHi.keys.toSeq.sorted
    val bms = keys.map { k =>
      val bm = new org.roaringbitmap.RoaringBitmap()
      byHi(k).foreach(r => bm.add(r.toInt))
      bm.runOptimize(); bm
    }
    val size = 4 + 8 + bms.map(4 + _.serializedSizeInBytes()).sum
    val bb = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1681511377)
    bb.putLong(keys.length.toLong)
    keys.zip(bms).foreach { case (k, bm) => bb.putInt(k); bm.serialize(bb) }
    bb.array()
  }

  /** Write a protocol-layout DV file: version byte 1, then
    * <int32-BE size><bitmap><int32-BE crc> at the returned offset. */
  private def writeDvFile(path: Path, bitmap: Array[Byte]): Int = {
    val crc = new java.util.zip.CRC32(); crc.update(bitmap)
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + bitmap.length + 4)
    bb.put(1.toByte)
    bb.putInt(bitmap.length)
    bb.put(bitmap)
    bb.putInt(crc.getValue.toInt)
    Files.createDirectories(path.getParent)
    Files.write(path, bb.array())
    1 // offset of the size int
  }

  private def z85enc(bytes: Array[Byte]): String = {
    val alpha = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
    require(bytes.length % 4 == 0)
    bytes.grouped(4).map { g =>
      var v = g.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
      val out = new Array[Char](5)
      (4 to 0 by -1).foreach { i => out(i) = alpha((v % 85).toInt); v /= 85 }
      new String(out)
    }.mkString
  }

  test("v2 checkpoint: parquet manifest + sidecar files reconstruct the state") {
    val root = tmpDir("delta_v2ckpt")
    oneFile(Seq((1, "a")).toDF("id", "name"), root.resolve("c1.parquet"))
    oneFile(Seq((2, "b")).toDF("id", "name"), root.resolve("c2.parquet"))
    oneFile(Seq((3, "c")).toDF("id", "name"), root.resolve("c3.parquet"))
    // the file actions live in a sidecar under _delta_log/_sidecars/
    val sc = Seq(
      SidecarRow(Some(CkAdd("c1.parquet", Map.empty, 1L, 1L, true)), None),
      SidecarRow(Some(CkAdd("c2.parquet", Map.empty, 1L, 1L, true)), None),
      SidecarRow(None, Some(CkRemove("gone.parquet", 1L, true))))
    oneFile(sc.toDF(),
      root.resolve(Paths.get("_delta_log", "_sidecars", "sc-1.parquet")))
    // UUID-named manifest: checkpointMetadata + sidecar pointer + the
    // non-file actions (protocol with the v2Checkpoint feature, metaData)
    val manifest = Seq(
      V2ManifestRow(Some(CkProtocolV2(3, 7, Seq("v2Checkpoint"),
        Seq("v2Checkpoint"))), None, None, None, None),
      V2ManifestRow(None, Some(CkMeta("00000000-0000-0000-0000-000000000003",
        dataSchema.json, Nil, Map.empty, CkFormat("parquet"))), None, None, None),
      V2ManifestRow(None, None, Some(CkCkptMeta(1L)), None, None),
      V2ManifestRow(None, None, None,
        Some(CkSidecar("sc-1.parquet", 1L, 1L)), None))
    oneFile(manifest.toDF(), root.resolve(Paths.get("_delta_log",
      f"${1L}%020d.checkpoint.80a083e8-7026-4e79-81be-64bd76c43a11.parquet")))
    // post-checkpoint commit still replays on top
    writeCommit(root, 2, Seq(
      """{"add":{"path":"c3.parquet","partitionValues":{},"size":1,"modificationTime":3,"dataChange":true}}"""))
    val df = DeltaInterop.read(spark, root.toString)
    assert(df.as[(Int, String)].collect().sorted.toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c")))
    assert(DeltaInterop.snapshot(spark, root.toString).version == 2L)
  }

  test("v2 checkpoint: json manifest variant, and version mismatch refuses") {
    val root = tmpDir("delta_v2ckpt_json")
    oneFile(Seq((1, "a")).toDF("id", "name"), root.resolve("c1.parquet"))
    val sc = Seq(
      SidecarRow(Some(CkAdd("c1.parquet", Map.empty, 1L, 1L, true)), None))
    oneFile(sc.toDF(),
      root.resolve(Paths.get("_delta_log", "_sidecars", "sc-9.parquet")))
    val dir = root.resolve("_delta_log")
    val metaJson = com.fasterxml.jackson.databind.json.JsonMapper.builder()
      .build().writeValueAsString(dataSchema.json)
    Files.write(dir.resolve(
      f"${0L}%020d.checkpoint.1b194bc9-10a4-4a37-962c-a0e39f3c2c32.json"), Seq(
      """{"checkpointMetadata":{"version":0}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""",
      s"""{"metaData":{"id":"m","format":{"provider":"parquet","options":{}},"schemaString":$metaJson,"partitionColumns":[],"configuration":{},"createdTime":1}}""",
      """{"sidecar":{"path":"sc-9.parquet","sizeInBytes":1,"modificationTime":1}}""").asJava)
    assert(DeltaInterop.read(spark, root.toString)
      .as[(Int, String)].collect().toSeq == Seq((1, "a")))
    // a manifest whose checkpointMetadata disagrees with its file name
    // must refuse, not silently read the wrong snapshot
    val root2 = tmpDir("delta_v2ckpt_bad")
    oneFile(Seq((1, "a")).toDF("id", "name"), root2.resolve("c1.parquet"))
    Files.createDirectories(root2.resolve("_delta_log"))
    Files.write(root2.resolve("_delta_log").resolve(
      f"${0L}%020d.checkpoint.1b194bc9-10a4-4a37-962c-a0e39f3c2c33.json"), Seq(
      """{"checkpointMetadata":{"version":7}}""",
      s"""{"metaData":{"id":"m","format":{"provider":"parquet","options":{}},"schemaString":$metaJson,"partitionColumns":[],"configuration":{},"createdTime":1}}""").asJava)
    val e = intercept[Exception](DeltaInterop.snapshot(spark, root2.toString))
    assert(e.getMessage.contains("claims version"))
  }

  test("deletion vectors: uuid-file DV drops exactly the flagged rows") {
    val root = tmpDir("delta_dv")
    val df = (0 until 10).map(i => (i, s"n$i")).toDF("id", "name")
    oneFile(df, root.resolve("f1.parquet"))
    // delete rows at file positions 1, 3, 7
    val uuid = java.util.UUID.fromString("a52eda8c-0a57-4636-814b-9c165388f7ca")
    val ub = java.nio.ByteBuffer.allocate(16)
    ub.putLong(uuid.getMostSignificantBits)
    ub.putLong(uuid.getLeastSignificantBits)
    val token = z85enc(ub.array())
    writeDvFile(root.resolve(s"deletion_vector_$uuid.bin"),
      dvBitmapBytes(Seq(1L, 3L, 7L)))
    writeCommit(root, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}""",
      metaLine(dataSchema, Nil),
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"$token","offset":1,"sizeInBytes":${dvBitmapBytes(Seq(1L, 3L, 7L)).length},"cardinality":3}}}"""))
    val got = DeltaInterop.read(spark, root.toString)
      .as[(Int, String)].collect().map(_._1).sorted.toSeq
    assert(got == Seq(0, 2, 4, 5, 6, 8, 9))
  }

  test("deletion vectors: sparse keys — empty bitmaps skipped, array sized by max key") {
    val root = tmpDir("delta_dv_sparse")
    // row indexes land in bitmaps 0 and 2; bitmap 1 is empty and must NOT
    // be serialized — real writers skip it and key the survivors
    val rows = Seq(5L, (2L << 32) | 7L, (2L << 32) | 9L)
    val bytes = dvBitmapBytes(rows)
    val uuid = java.util.UUID.fromString("b63feb9d-1b68-5747-925c-0d276499a8db")
    val ub = java.nio.ByteBuffer.allocate(16)
    ub.putLong(uuid.getMostSignificantBits)
    ub.putLong(uuid.getLeastSignificantBits)
    writeDvFile(root.resolve(s"deletion_vector_$uuid.bin"), bytes)
    val dv = DeltaInterop.loadDv(root.toString,
      DeltaInterop.DvDescriptor("u", z85enc(ub.array()), Some(1), bytes.length, 3))
    assert(rows.forall(dv.contains))
    assert(!dv.contains(1L << 32) && !dv.contains(6L) && !dv.contains((2L << 32) | 8L))
    assert(dv.cardinality == 3)
  }

  test("deletion vectors: inline DV and later DV update via re-add") {
    val root = tmpDir("delta_dv_inline")
    val df = (0 until 6).map(i => (i, s"n$i")).toDF("id", "name")
    oneFile(df, root.resolve("f1.parquet"))
    def addLine(deleted: Seq[Long]): String = {
      val b = dvBitmapBytes(deleted)
      val padded = b ++ Array.fill((4 - b.length % 4) % 4)(0.toByte)
      s"""{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"i","pathOrInlineDv":"${z85enc(padded)}","sizeInBytes":${b.length},"cardinality":${deleted.length}}}}"""
    }
    writeCommit(root, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"]}}""",
      metaLine(dataSchema, Nil),
      addLine(Seq(0L))))
    assert(DeltaInterop.read(spark, root.toString)
      .as[(Int, String)].collect().map(_._1).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    // a later DELETE grows the DV: protocol re-adds the same path with
    // the new descriptor; last add wins in state reconstruction
    writeCommit(root, 1, Seq(addLine(Seq(0L, 4L))))
    assert(DeltaInterop.read(spark, root.toString)
      .as[(Int, String)].collect().map(_._1).sorted.toSeq == Seq(1, 2, 3, 5))
    // and time travel still sees the version-0 view
    assert(DeltaInterop.read(spark, root.toString, Some(0L))
      .as[(Int, String)].collect().map(_._1).sorted.toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("txn table exports a delta history an external reader can replay") {
    val root = tmpDir("delta_export").resolve("t")
    val txn = TxnTable(spark, root.toString)
    txn.overwrite(Seq((1, "a", "10"), (2, "b", "20")).toDF("id", "name", "p"),
      partitionBy = Seq("p"))
    assert(DeltaInterop.exportTxn(txn) == 0L)
    val viaDelta0 = DeltaInterop.read(spark, root.toString)
    assert(viaDelta0.select("id", "name", "p").as[(Int, String, String)]
      .collect().sorted.toSeq == Seq((1, "a", "10"), (2, "b", "20")))
    // second txn commit -> second delta version, with removes for the
    // rewritten partition's old file
    txn.upsert(Seq((2, "B", "20"), (3, "c", "20")).toDF("id", "name", "p"),
      keys = Seq("id"), partitionBy = Seq("p"))
    assert(DeltaInterop.exportTxn(txn) == 1L)
    // up to date: no diff means no commit (delta forbids empty commits)
    assert(DeltaInterop.exportTxn(txn) == -1L)
    val viaDelta1 = DeltaInterop.read(spark, root.toString)
    val viaTxn = txn.read().select("id", "name", "p")
    assert(viaDelta1.select("id", "name", "p").as[(Int, String, String)]
      .collect().sorted.toSeq ==
      viaTxn.as[(Int, String, String)].collect().sorted.toSeq)
    // delta time travel still sees the first export
    val back = DeltaInterop.read(spark, root.toString, Some(0L))
    assert(back.select("id", "name", "p").as[(Int, String, String)]
      .collect().sorted.toSeq == Seq((1, "a", "10"), (2, "b", "20")))
  }

  test("LakeIO.read dispatches a _delta_log directory through the interop") {
    val lakeRoot = tmpDir("delta_lake")
    val lake = LakeIO(spark, lakeRoot.toString)
    val p = Paths.get(lake.tablePath(lake.layers.Stage, "m_delta"))
    oneFile(Seq((7, "z")).toDF("id", "name"), p.resolve("d1.parquet"))
    writeCommit(p, 0, Seq(protocolLine, metaLine(dataSchema, Nil),
      """{"add":{"path":"d1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""))
    assert(lake.read(lake.layers.Stage, "m_delta")
      .as[(Int, String)].collect().toSeq == Seq((7, "z")))
  }
}
