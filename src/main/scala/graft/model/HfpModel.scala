package graft.model

import org.apache.spark.sql.types._

/**
 * Data model of the HFP (High-Frequency Positioning) vehicle-observation
 * stream, re-expressed as Spark schemas.
 *
 * Derived from the reference's observable contract:
 *  - nested envelope `Hfp.Data { Topic topic; Payload payload }`
 *    (reference: MessageProcessor.java:119, QueueWriter.java:60,97)
 *  - flat 40-column `vehicles` relation, names/order per the INSERT list
 *    (reference: QueueWriter.java:37-44) and DDL (reference: run/init.sql:26-68)
 *
 * The schema is hand-declared, never inferred: the reference rejects
 * wrong-schema messages up front (MessageProcessor.java:118), and schema
 * inference on a stream is non-deterministic. At 100 TB a fixed schema also
 * guarantees stable column pruning and predicate pushdown on every scan.
 */
object HfpModel {

  // ---------------------------------------------------------------------
  // Enum domains (reference: run/init.sql:21-24). Kept as String columns +
  // validation guards (Spark has no enum type); `isin` filters are cheap
  // codegen'd expressions and replace the reference's server-side
  // `?::EVENT_TYPE` casts (QueueWriter.java:45-46).
  // ---------------------------------------------------------------------
  val JourneyTypes: Seq[String] = Seq("journey", "deadrun", "signoff")
  val EventTypes: Seq[String] = Seq(
    "VP", "DUE", "ARR", "ARS", "PDE", "DEP", "PAS", "WAIT", "DOO", "DOC",
    "TLR", "TLA", "DA", "DOUT", "BA", "BOUT", "VJA", "VJOUT")
  val TransportModes: Seq[String] = Seq("bus", "train", "tram", "metro", "ferry")
  val LocationQualityMethods: Seq[String] = Seq("GPS", "ODO", "MAN", "NA")
  val TemporalTypes: Seq[String] = Seq("ongoing", "upcoming")

  // ---------------------------------------------------------------------
  // Source (nested) schema — decoded HFP envelope, pre-flatten.
  // String-typed payload fields (`dir`, `drst`, `oday`, `start`, `tst`)
  // arrive as strings and are parsed downstream with null-on-error
  // semantics (reference: QueueWriter.java:88-132).
  // ---------------------------------------------------------------------
  val topicSchema: StructType = StructType(Seq(
    StructField("received_at", LongType, nullable = false), // epoch millis
    StructField("topic_prefix", StringType, nullable = false),
    StructField("topic_version", StringType, nullable = false),
    StructField("journey_type", StringType, nullable = false),
    StructField("temporal_type", StringType, nullable = false),
    StructField("event_type", StringType),       // v2 only
    StructField("transport_mode", StringType),
    StructField("operator_id", IntegerType, nullable = false),
    StructField("vehicle_number", IntegerType, nullable = false),
    StructField("unique_vehicle_id", StringType, nullable = false),
    StructField("route_id", StringType),
    StructField("direction_id", IntegerType),
    StructField("headsign", StringType),
    StructField("start_time", StringType),       // "HH:mm"
    StructField("next_stop", StringType),
    StructField("geohash_level", IntegerType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType)
  ))

  val payloadSchema: StructType = StructType(Seq(
    StructField("desi", StringType),
    StructField("dir", StringType),              // string! parsed to int
    StructField("oper", IntegerType),
    StructField("veh", IntegerType, nullable = false),
    StructField("tst", StringType, nullable = false), // ISO-8601; strict parse
    StructField("tsi", LongType, nullable = false),   // epoch seconds
    StructField("spd", DoubleType),
    StructField("hdg", IntegerType),
    StructField("lat", DoubleType),
    StructField("long", DoubleType),
    StructField("acc", DoubleType),
    StructField("dl", IntegerType),
    StructField("odo", DoubleType),
    StructField("drst", StringType),             // "0"|"1" → boolean
    StructField("oday", StringType),             // "yyyy-MM-dd"
    StructField("jrn", IntegerType),
    StructField("line", IntegerType),
    StructField("start", StringType),            // "HH:mm"
    StructField("loc", StringType),              // v2
    StructField("stop", IntegerType),            // v2
    StructField("route", StringType),            // v2
    StructField("occu", IntegerType)             // v2
  ))

  val envelopeSchema: StructType = StructType(Seq(
    StructField("topic", topicSchema, nullable = false),
    StructField("payload", payloadSchema, nullable = false)
  ))

  // ---------------------------------------------------------------------
  // Target (flat) schema — the 40-column `vehicles` relation in the exact
  // INSERT order of the reference (QueueWriter.java:37-44).
  //
  // Type mapping notes (SURVEY.md §1.2):
  //  - PG TIME columns (`journey_start_time`, `start`) have no Spark
  //    equivalent → Int seconds-since-midnight (SURVEY §7.4).
  //  - PG SMALLINT → ShortType.
  //  - `long` is a reserved word in several SQL dialects; Spark tolerates it
  //    as a plain column name, JDBC sinks must quote it.
  // ---------------------------------------------------------------------
  val vehiclesSchema: StructType = StructType(Seq(
    StructField("received_at", TimestampType, nullable = false),
    StructField("topic_prefix", StringType, nullable = false),
    StructField("topic_version", StringType, nullable = false),
    StructField("journey_type", StringType, nullable = false),
    StructField("is_ongoing", BooleanType, nullable = false),
    StructField("event_type", StringType),
    StructField("mode", StringType),
    StructField("owner_operator_id", ShortType, nullable = false),
    StructField("vehicle_number", IntegerType, nullable = false),
    StructField("unique_vehicle_id", StringType, nullable = false),
    StructField("route_id", StringType),
    StructField("direction_id", ShortType),
    StructField("headsign", StringType),
    StructField("journey_start_time", IntegerType), // seconds since midnight
    StructField("next_stop_id", StringType),
    StructField("geohash_level", ShortType),
    StructField("topic_latitude", DoubleType),
    StructField("topic_longitude", DoubleType),
    StructField("desi", StringType),
    StructField("dir", ShortType),
    StructField("oper", ShortType),
    StructField("veh", IntegerType, nullable = false),
    StructField("tst", TimestampType, nullable = false),
    StructField("tsi", LongType, nullable = false),
    StructField("spd", DoubleType),
    StructField("hdg", ShortType),
    StructField("lat", DoubleType),
    StructField("long", DoubleType),
    StructField("acc", DoubleType),
    StructField("dl", IntegerType),
    StructField("odo", DoubleType),
    StructField("drst", BooleanType),
    StructField("oday", DateType),
    StructField("jrn", IntegerType),
    StructField("line", ShortType),
    StructField("start", IntegerType),              // seconds since midnight
    StructField("loc", StringType),
    StructField("stop", IntegerType),
    StructField("route", StringType),
    StructField("occu", ShortType)
  ))

  /** Flat column names in reference INSERT order (QueueWriter.java:37-44). */
  val vehicleColumns: Seq[String] = vehiclesSchema.fieldNames.toSeq

  /** Columns the reference declares NOT NULL (run/init.sql:26-68). */
  val requiredColumns: Seq[String] = Seq(
    "received_at", "topic_prefix", "topic_version", "journey_type",
    "is_ongoing", "owner_operator_id", "vehicle_number", "unique_vehicle_id",
    "veh", "tst", "tsi")
}

// Typed API: case classes for Dataset[HfpRecord] users. Option[_] mirrors
// column nullability; `start` keeps the reference name, but the payload's
// `long` column must be `lng` here — Spark encoders reject Java keywords
// as field names — and is mapped back at the DataFrame boundary
// (HfpProtobuf.asEnvelopes / decodeDataFrame).
case class HfpTopic(
    received_at: Long,
    topic_prefix: String,
    topic_version: String,
    journey_type: String,
    temporal_type: String,
    event_type: Option[String],
    transport_mode: Option[String],
    operator_id: Int,
    vehicle_number: Int,
    unique_vehicle_id: String,
    route_id: Option[String],
    direction_id: Option[Int],
    headsign: Option[String],
    start_time: Option[String],
    next_stop: Option[String],
    geohash_level: Option[Int],
    latitude: Option[Double],
    longitude: Option[Double])

case class HfpPayload(
    desi: Option[String],
    dir: Option[String],
    oper: Option[Int],
    veh: Int,
    tst: String,
    tsi: Long,
    spd: Option[Double],
    hdg: Option[Int],
    lat: Option[Double],
    lng: Option[Double],
    acc: Option[Double],
    dl: Option[Int],
    odo: Option[Double],
    drst: Option[String],
    oday: Option[String],
    jrn: Option[Int],
    line: Option[Int],
    start: Option[String],
    loc: Option[String],
    stop: Option[Int],
    route: Option[String],
    occu: Option[Int])

case class HfpEnvelope(topic: HfpTopic, payload: HfpPayload)
