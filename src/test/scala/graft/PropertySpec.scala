package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.unsafe.types.UTF8String

/** Property tests pinning the native kernels to independent reference
  * implementations (regex engine, interpreted arithmetic). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 3 -> Gen.const(' '), 2 -> Gen.oneOf(".,!?;:-_()[]".toSeq),
      1 -> Gen.oneOf('\t', '\n'))).map(_.mkString)

  test("token_count kernel equals the regex engine on arbitrary ASCII text") {
    val re = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]".r
    check(Prop.forAll(asciiText) { s =>
      re.findAllIn(s).length ==
        graft.functions.VectorMath.tokenCount(UTF8String.fromString(s))
    })
  }

  test("token_count counts multi-byte characters like the regex does") {
    val re = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]".r
    val gen = Gen.listOf(Gen.oneOf("é", "中", "a", " ", "ü", ",", "🚀")).map(_.mkString)
    check(Prop.forAll(gen) { s =>
      re.findAllIn(s).length ==
        graft.functions.VectorMath.tokenCount(UTF8String.fromString(s))
    })
  }

  test("marker_count kernel equals the regex engine on marker-dense text") {
    import graft.llm.TextAnalysis
    val vocabularies = TextAnalysis.LangMarkers.map(_._2) :+ TextAnalysis.EnglishStopwords
    // text biased toward marker words, their prefixes/suffixes, and
    // multi-byte characters so both boundary directions get exercised
    val pieces = Gen.oneOf(
      Gen.oneOf(vocabularies.flatten), Gen.const("the"), Gen.const("theory"),
      Gen.const("a"), Gen.const("an"), Gen.const("中的"), Gen.const("a的b"),
      asciiText.map(_.take(8)))
    val gen = Gen.listOf(Gen.zip(pieces, Gen.oneOf(" ", "", ". ", "\t")))
      .map(_.map { case (a, b) => a + b }.mkString)
    vocabularies.foreach { words =>
      val p = java.util.regex.Pattern.compile("\\b(" + words.mkString("|") + ")\\b")
      val wb = words.map(_.getBytes("UTF-8")).toArray
      check(Prop.forAll(gen) { s =>
        val m = p.matcher(s)
        var n = 0
        while (m.find()) n += 1
        n == graft.functions.TextHash.markerCount(UTF8String.fromString(s), wb)
      })
    }
  }

  test("rolling min hash: deterministic, and window containment bounds the min") {
    check(Prop.forAll(asciiText.suchThat(_.nonEmpty), asciiText) { (core, pad) =>
      val a = UTF8String.fromString(core)
      val b = UTF8String.fromString(pad + core)
      val stable = graft.functions.RollingMinHash.compute(a, 16) ==
        graft.functions.RollingMinHash.compute(a, 16)
      val bounded =
        if (core.getBytes("UTF-8").length >= 16)
          graft.functions.RollingMinHash.compute(b, 16) <=
            graft.functions.RollingMinHash.compute(a, 16)
        else true
      stable && bounded
    })
  }

  test("dot kernel equals interpreted left-to-right sum") {
    val vec = Gen.listOfN(64, Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray)
    check(Prop.forAll(vec, vec) { (a, b) =>
      var acc = 0.0
      var i = 0
      while (i < 64) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      graft.functions.VectorMath.dotF(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b)) == acc
    })
  }

  test("int8 quantization: codes bounded, reconstruction within half a step") {
    // the q62 formula replayed in plain scala: per-vector abs-max scale,
    // floor(x/s*127 + 0.5). Codes stay in [-127, 127]; dequantized values
    // land within half a quantization step (plus fp slack) of the input.
    val vec = Gen.chooseNum(1, 96).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-50.0f, 50.0f)).map(_.toArray))
    check(Prop.forAll(vec) { v =>
      val s = v.map(x => math.abs(x.toDouble)).max
      s == 0.0 || v.forall { x =>
        val q = math.floor(x.toDouble / s * 127.0 + 0.5)
        math.abs(q) <= 127.0 &&
          math.abs(q * s / 127.0 - x.toDouble) <= s / 254.0 + 1e-9 * s
      }
    })
  }

  test("margin multiprobe: probe count monotone in the margin fraction") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val vec = Gen.chooseNum(1, 96).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-20.0f, 20.0f)).map(_.toArray))
    val frac = Gen.chooseNum(0.0, 3.0)
    check(Prop.forAll(vec, frac, frac) { (v, f1, f2) =>
      val (lo, hi) = if (f1 <= f2) (f1, f2) else (f2, f1)
      def probes(f: Double): Seq[Long] = {
        val a = graft.functions.TextHash.lshProbeBucketsMargin(
          ArrayData.toArrayData(v), 8, 8, f)
        (0 until a.numElements()).map(a.getLong)
      }
      val pLo = probes(lo)
      val pHi = probes(hi)
      // widening the margin can only extend the probe list, never reorder
      // it — the lower-margin list is a prefix of the higher-margin one
      pHi.take(pLo.size) == pLo
    })
  }

  test("media headers: synth/decode round-trip for arbitrary in-range dimensions") {
    import graft.llm.{MediaHeaders, MediaSynth}
    // ids cover all five format branches; dims are the synth's derived
    // pure functions, so the law is: decode(synth(id)) == predicted triple
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue / 16)) { id =>
      MediaHeaders.decode(MediaSynth.synth(id)) ==
        ((MediaSynth.widthOf(id), MediaSynth.heightOf(id), MediaSynth.formatOf(id)))
    })
  }

  test("media headers: arbitrary byte junk never throws and never claims media") {
    import graft.llm.MediaHeaders
    val junk = Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)
    check(Prop.forAll(junk) { bytes =>
      val (w, h, f) = MediaHeaders.decode(bytes)
      // total function; "unknown" always carries zero dims, and a claimed
      // format always carries positive dims
      (f == "unknown" && w == 0 && h == 0) || (f != "unknown" && w > 0 && h > 0)
    })
  }

  test("cdc boundaries: cover the text exactly, in order, ending at the length") {
    import graft.functions.CdcChunk
    check(Prop.forAll(asciiText) { s =>
      val b = CdcChunk.boundaries(UTF8String.fromString(s), 16, 64)
        .toIntArray().toSeq
      val n = s.getBytes("UTF-8").length
      b.nonEmpty && b.last == n && b == b.sorted && b.distinct == b &&
        b.forall(e => e >= 0 && e <= n)
    })
  }

  test("cdc boundaries are BYTE offsets: unicode text partitions its UTF-8 bytes") {
    import graft.functions.CdcChunk
    // arbitrary unicode (surrogate-free) — boundaries must partition the
    // byte stream; a boundary may legitimately split a code point (CDC is
    // a byte-stream algorithm, the r6 byte-safe q68 hashes byte spans)
    val uni = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('á', 'é', 'ß', 'ç', 'ñ', 'Ω', 'δ', '測', '試', '—'),
      1 -> Gen.const(' '))).map(_.mkString)
    check(Prop.forAll(uni) { s =>
      val bytes = s.getBytes("UTF-8")
      val b = CdcChunk.boundaries(UTF8String.fromString(s), 16, 64)
        .toIntArray().toSeq
      val spans = (0 +: b).zip(b)
      // spans reassemble the exact byte stream
      spans.flatMap { case (a, e) => bytes.slice(a, e) }.sameElements(bytes) &&
        b.last == bytes.length
    })
  }

  test("CompactLongSet matches Set[Long] under add/merge/serialize round-trips") {
    import graft.functions.CompactLongSet
    // keys biased toward collisions (small range + 0 sentinel + extremes)
    val key = Gen.frequency(
      6 -> Gen.chooseNum(-50L, 50L), 2 -> Gen.chooseNum(Long.MinValue, Long.MaxValue),
      1 -> Gen.const(0L), 1 -> Gen.const(Long.MinValue))
    check(Prop.forAll(Gen.listOf(key), Gen.listOf(key)) { (a, b) =>
      val sa = new CompactLongSet(); a.foreach(sa.add)
      val sb = new CompactLongSet(); b.foreach(sb.add)
      sb.foreachKey(sa.add) // merge
      var got = Set.empty[Long]
      sa.foreachKey(v => got += v)
      got == (a.toSet ++ b.toSet) && sa.size == got.size
    })
  }

  test("multi_distinct_count eval equals per-column distinct counts") {
    import graft.functions.MultiDistinctCount
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    val rowGen = Gen.listOf(Gen.zip(
      Gen.chooseNum(-20L, 20L), Gen.chooseNum(-5L, 5L)))
    check(Prop.forAll(rowGen, rowGen) { (part1, part2) =>
      val agg = MultiDistinctCount(Seq(
        BoundReference(0, LongType, nullable = false),
        BoundReference(1, LongType, nullable = false)))
      def partial(rows: Seq[(Long, Long)]) = {
        val buf = agg.createAggregationBuffer()
        rows.foreach { case (x, y) => agg.update(buf, InternalRow(x, y)) }
        // partial buffers cross the wire serialized — exercise that path
        agg.deserialize(agg.serialize(buf))
      }
      val merged = agg.merge(partial(part1), partial(part2))
      val counts = agg.eval(merged)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
      val all = part1 ++ part2
      counts == Seq(all.map(_._1).distinct.size.toLong, all.map(_._2).distinct.size.toLong)
    })
  }

  test("magic hora: integer round-trip for every second of the day") {
    // pure-scala replay of the Periods column formula (h*10000 + m*100 + s
    // and its seconds-of-day inverse) — total and bijective over [0, 86400);
    // the column-level parity with Periods.toMagicHora is in OperatorsSpec
    check(Prop.forAll(Gen.chooseNum(0, 86399)) { sec =>
      val h = sec / 3600; val m = (sec % 3600) / 60; val s = sec % 60
      val hora = h * 10000 + m * 100 + s
      val back = (hora / 10000) * 3600 + ((hora % 10000) / 100) * 60 + hora % 100
      back == sec
    })
  }
}
