package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.model.{HfpEnvelope, HfpPayload, HfpTopic}
import graft.operators.HfpFlatten
import graft.queries.HfpPipelineQueries

/**
 * Protobuf wire-path parity (reference O3, MessageProcessor.java:119):
 * the decoder is exercised against hand-assembled wire bytes (spec-level
 * golden test, independent of our encoder), the encoder→decoder
 * round-trip on every q21 fixture, and flatten-output equivalence of the
 * JSON and protobuf paths.
 */
class HfpProtobufSpec extends SparkSuite {
  import spark.implicits._

  private val topic = HfpTopic(1717574401500L, "/hfp/", "v2", "journey",
    "ongoing", Some("VP"), Some("bus"), 22, 854, "22/854", Some("2550"),
    Some(2), Some("Itakeskus(M)"), Some("08:29"), Some("1362148"), Some(4),
    Some(60.2), Some(25.0))
  private val payload = HfpPayload(Some("550"), Some("2"), Some(22), 854,
    "2024-06-05T08:00:01.412Z", 1717574401L, Some(8.49), Some(72),
    Some(60.229214), Some(25.007964), Some(0.63), Some(-25), Some(4927.0),
    Some("0"), Some("2024-06-05"), Some(812), Some(261), Some("08:29"),
    Some("GPS"), Some(1362148), Some("2550"), Some(0))

  test("golden bytes: hand-assembled wire record decodes per the public spec") {
    // Topic with every REQUIRED field (the decoder's presence mask
    // rejects a record missing any of them — proto3 zero-defaults must
    // not masquerade as values), assembled by hand from the encoding
    // spec:
    //   field 1, varint:  tag = 1<<3|0 = 0x08; 1 encodes as 0x01
    //   field 2, len:     tag = 2<<3|2 = 0x12; len 5; "/hfp/"
    //   field 3, len:     tag = 3<<3|2 = 0x1A; len 2; "v2"
    //   field 4, len:     tag = 4<<3|2 = 0x22; len 7; "journey"
    //   field 5, len:     tag = 5<<3|2 = 0x2A; len 7; "ongoing"
    //   field 8, varint:  tag = 8<<3|0 = 0x40; 22 = 0x16
    //   field 9, varint:  tag = 9<<3|0 = 0x48; 854 = 0xD6 0x06
    //   field 10, len:    tag = 10<<3|2 = 0x52; len 6; "22/854"
    val topicBytes = Array[Byte](0x08, 0x01) ++
      Array[Byte](0x12, 0x05) ++ "/hfp/".getBytes("UTF-8") ++
      Array[Byte](0x1A, 0x02) ++ "v2".getBytes("UTF-8") ++
      Array[Byte](0x22, 0x07) ++ "journey".getBytes("UTF-8") ++
      Array[Byte](0x2A, 0x07) ++ "ongoing".getBytes("UTF-8") ++
      Array[Byte](0x40, 0x16, 0x48, 0xD6.toByte, 0x06, 0x52, 0x06) ++
      "22/854".getBytes("UTF-8")
    // Payload { veh=4; tst=5; tsi=6 } with veh=300 (multi-byte varint
    // 0xAC 0x02), tst="t", tsi=1
    val payloadBytes = Array[Byte](0x20, 0xAC.toByte, 0x02, 0x2A, 0x01, 't',
      0x30, 0x01)
    // Data { topic=1 (len), payload=2 (len) }
    val data = Array[Byte](0x0A, topicBytes.length.toByte) ++ topicBytes ++
      Array[Byte](0x12, payloadBytes.length.toByte) ++ payloadBytes
    val env = HfpProtobuf.decode(data)
    assert(env.topic.received_at === 1L)
    assert(env.topic.topic_prefix === "/hfp/")
    assert(env.topic.topic_version === "v2")
    assert(env.topic.journey_type === "journey")
    assert(env.topic.temporal_type === "ongoing")
    assert(env.topic.operator_id === 22)
    assert(env.topic.vehicle_number === 854)
    assert(env.topic.unique_vehicle_id === "22/854")
    assert(env.topic.route_id === None)
    assert(env.payload.veh === 300)
    assert(env.payload.tst === "t")
    assert(env.payload.tsi === 1L)
    assert(env.payload.desi === None)
  }

  test("a wire record missing a required field is rejected, not zero-defaulted") {
    // the golden topic minus unique_vehicle_id; and a payload minus tst
    val topicNoUvid = Array[Byte](0x08, 0x01) ++
      Array[Byte](0x12, 0x05) ++ "/hfp/".getBytes("UTF-8") ++
      Array[Byte](0x1A, 0x02) ++ "v2".getBytes("UTF-8") ++
      Array[Byte](0x22, 0x07) ++ "journey".getBytes("UTF-8") ++
      Array[Byte](0x2A, 0x07) ++ "ongoing".getBytes("UTF-8") ++
      Array[Byte](0x40, 0x16, 0x48, 0xD6.toByte, 0x06)
    val goodPayload = Array[Byte](0x20, 0x01, 0x2A, 0x01, 't', 0x30, 0x01)
    val d1 = Array[Byte](0x0A, topicNoUvid.length.toByte) ++ topicNoUvid ++
      Array[Byte](0x12, goodPayload.length.toByte) ++ goodPayload
    val e1 = intercept[IllegalArgumentException](HfpProtobuf.decode(d1))
    assert(e1.getMessage.contains("required topic field"), e1.getMessage)

    val topicFull = topicNoUvid ++
      Array[Byte](0x52, 0x06) ++ "22/854".getBytes("UTF-8")
    val payloadNoTst = Array[Byte](0x20, 0x01, 0x30, 0x01) // veh=1, tsi=1
    val d2 = Array[Byte](0x0A, topicFull.length.toByte) ++ topicFull ++
      Array[Byte](0x12, payloadNoTst.length.toByte) ++ payloadNoTst
    val e2 = intercept[IllegalArgumentException](HfpProtobuf.decode(d2))
    assert(e2.getMessage.contains("required payload field"), e2.getMessage)
  }

  test("round-trip: encode then decode is identity on a fully-populated envelope") {
    val env = HfpEnvelope(topic, payload)
    assert(HfpProtobuf.decode(HfpProtobuf.encode(env)) === env)
  }

  test("round-trip preserves negative ints, doubles bit-exactly, and UTF-8") {
    val env = HfpEnvelope(
      topic.copy(headsign = Some("Itäkeskus(M) – täältä"), latitude = Some(-0.0)),
      payload.copy(dl = Some(-2147483648), acc = Some(java.lang.Double.MIN_VALUE),
        spd = Some(Double.NaN)))
    val back = HfpProtobuf.decode(HfpProtobuf.encode(env))
    assert(back.topic.headsign === Some("Itäkeskus(M) – täältä"))
    assert(java.lang.Double.doubleToRawLongBits(back.topic.latitude.get)
      === java.lang.Double.doubleToRawLongBits(-0.0))
    assert(back.payload.dl === Some(-2147483648))
    assert(back.payload.acc === Some(java.lang.Double.MIN_VALUE))
    assert(back.payload.spd.get.isNaN)
  }

  test("unknown fields are skipped (forward compatibility)") {
    val base = HfpProtobuf.encode(HfpEnvelope(topic, payload))
    // unknown field 99, varint:        tag = 99<<3|0 = 792 → varint 0x98 0x06
    // unknown field 98, len-delimited: tag = 98<<3|2 = 786 → varint 0x92 0x06
    val w = base ++ Array[Byte](0x98.toByte, 0x06, 0x07) ++
      Array[Byte](0x92.toByte, 0x06, 0x02, 'x', 'x')
    assert(HfpProtobuf.decode(w) === HfpEnvelope(topic, payload))
  }

  test("a known field with the wrong wire type is rejected, not mis-decoded") {
    // Topic.received_at (field 1) encoded as fixed64 instead of varint:
    // tag = 1<<3|1 = 0x09 + 8 bytes. Silent acceptance would misalign
    // every subsequent field.
    val badTopic = Array[Byte](0x09, 1, 0, 0, 0, 0, 0, 0, 0)
    val data = Array[Byte](0x0A, badTopic.length.toByte) ++ badTopic ++
      Array[Byte](0x12, 0x00) // empty payload submessage
    intercept[IllegalArgumentException](HfpProtobuf.decode(data))
  }

  test("a submessage length past the record end is rejected (bounds check)") {
    // Data.topic declares 100 bytes, record has 2
    val data = Array[Byte](0x0A, 100, 0x08, 0x01)
    intercept[IllegalArgumentException](HfpProtobuf.decode(data))
  }

  test("a 64-bit length that would truncate to a small int is rejected (ADVICE r3)") {
    // Data.topic length = 2^32 + 5 as varint (0x85 0x80 0x80 0x80 0x10):
    // a 32-bit truncation would read it as 5 and mis-decode garbage
    // instead of dead-lettering the record
    val data = Array[Byte](0x0A,
      0x85.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte, 0x10,
      1, 2, 3, 4, 5)
    val e = intercept[IllegalArgumentException](HfpProtobuf.decode(data))
    assert(e.getMessage.contains("bad field length"), e.getMessage)
  }

  test("property: decode after encode is identity over generated envelopes (SURVEY §5)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // NaN excluded: the wire canonicalizes NaN bit patterns and NaN != NaN
    // breaks case-class equality; every other double round-trips bit-exactly
    val strG = Gen.oneOf(Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.const(""), Gen.const("ä ö 漢字 🚌"), Gen.const("/hfp/v2/ä"))
    val dblG = Gen.oneOf(Gen.chooseNum(-1e12, 1e12), Gen.const(0.0),
      Gen.const(-0.0), Gen.const(Double.MaxValue),
      Gen.const(Double.MinPositiveValue), Gen.const(Double.NegativeInfinity))
    val intG = Gen.chooseNum(Int.MinValue, Int.MaxValue) // negative → 10-byte varint
    val longG = Gen.chooseNum(Long.MinValue, Long.MaxValue)
    val topicG = for {
      ra <- longG; pre <- strG; ver <- strG; jt <- strG; tt <- strG
      et <- Gen.option(strG); tm <- Gen.option(strG)
      op <- intG; vn <- intG; uv <- strG
      ri <- Gen.option(strG); di <- Gen.option(intG); hs <- Gen.option(strG)
      st <- Gen.option(strG); ns <- Gen.option(strG); gl <- Gen.option(intG)
      la <- Gen.option(dblG); lo <- Gen.option(dblG)
    } yield graft.model.HfpTopic(ra, pre, ver, jt, tt, et, tm, op, vn, uv,
      ri, di, hs, st, ns, gl, la, lo)
    val payloadG = for {
      de <- Gen.option(strG); di <- Gen.option(strG); op <- Gen.option(intG)
      veh <- intG; tst <- strG; tsi <- longG
      spd <- Gen.option(dblG); hdg <- Gen.option(intG); la <- Gen.option(dblG)
      lo <- Gen.option(dblG); acc <- Gen.option(dblG); dl <- Gen.option(intG)
      odo <- Gen.option(dblG); dr <- Gen.option(strG); od <- Gen.option(strG)
      jr <- Gen.option(intG); li <- Gen.option(intG); st <- Gen.option(strG)
      lc <- Gen.option(strG); sp <- Gen.option(intG); rt <- Gen.option(strG)
      oc <- Gen.option(intG)
    } yield graft.model.HfpPayload(de, di, op, veh, tst, tsi, spd, hdg, la,
      lo, acc, dl, odo, dr, od, jr, li, st, lc, sp, rt, oc)
    val envG = for { t <- topicG; p <- payloadG } yield HfpEnvelope(t, p)
    val envs = (0 until 300).flatMap(i =>
      envG.apply(Gen.Parameters.default, Seed(7L + i)))
    assert(envs.size > 250) // the generator rarely discards
    envs.foreach { e =>
      assert(HfpProtobuf.decode(HfpProtobuf.encode(e)) === e)
    }
  }

  test("malformed records are dropped by decodeEnvelopes, valid ones survive") {
    val good = HfpProtobuf.encode(HfpEnvelope(topic, payload))
    val bad = Array[Byte](0x0A, 0x7F, 0x01) // declares 127-byte submessage, has 1
    val out = HfpProtobuf.decodeEnvelopes(
      spark.createDataset(Seq(good, bad, good))).collect()
    assert(out.length === 2)
    assert(out.forall(_ === HfpEnvelope(topic, payload)))
  }

  test("JSON path and protobuf path produce identical envelopes and flat rows on q21 fixtures") {
    val envJson = HfpPipelineQueries.goodEnvelope(spark)
    val envProto = HfpProtobuf.decodeDataFrame(
      HfpProtobuf.asEnvelopes(envJson).map(HfpProtobuf.encode))
    val a = HfpProtobuf.asEnvelopes(envJson).collect().sortBy(_.topic.received_at)
    val b = HfpProtobuf.asEnvelopes(envProto).collect().sortBy(_.topic.received_at)
    assert(a.toSeq === b.toSeq)
    val flatA = HfpFlatten.flatten(envJson, strictTst = false)
      .orderBy("received_at", "veh").collect()
    val flatB = HfpFlatten.flatten(envProto, strictTst = false)
      .orderBy("received_at", "veh").collect()
    assert(flatA.toSeq === flatB.toSeq)
  }
}
