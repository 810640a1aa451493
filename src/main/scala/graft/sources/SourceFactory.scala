package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * O1 source seam: every supported wire-record source produces the SAME
 * three-column frame (`topic`, `payload`, `received_at` — the raw MQTT
 * record shape `HfpRawIngest` consumes), so the transform/sink plan below
 * is source-agnostic by construction. The reference's source is an Apache
 * Pulsar consumer (`PulsarApplication`, reference Main.java:15-23,
 * environment.conf:4-9); this offline environment has no broker and no
 * connector jar, so the pipeline is built against this seam instead of a
 * concrete source.
 *
 *  - [[SourceSpec.FileJson]]: JSON-lines directory stream — the test /
 *    backfill source. Rate-limited with `maxFilesPerTrigger` (the O4
 *    stand-in).
 *  - [[SourceSpec.FileBinary]]: parquet directory stream of BINARY wire
 *    records (`value: binary`, the shape a Pulsar/Kafka source delivers)
 *    feeding the protobuf decode path — the reference's actual hot path
 *    is protobuf-in-stream (`Hfp.Data.parseFrom(message.getData())`,
 *    MessageProcessor.java:119); this spec exercises that wire shape
 *    end-to-end without a broker.
 *  - [[SourceSpec.Rate]]: Spark's built-in `rate` source with synthesized
 *    deterministic wire records — load-testing the pipeline without any
 *    input data.
 *  - [[SourceSpec.Pulsar]]: the production source. Requires the
 *    StreamNative `pulsar-spark` connector (`format("pulsar")` with
 *    `service.url`/`admin.url`/`topic` options) on the classpath; absent
 *    here, so construction fails with an actionable message rather than a
 *    ClassNotFoundException from deep inside DataSource resolution. With a
 *    live broker carrying protobuf messages, set `binary = true`: the raw
 *    `value` bytes pass through as the binary wire shape and the pipeline
 *    routes them through [[HfpProtobuf.decodeDataFrame]].
 */
object SourceFactory {

  /** Text wire-record schema (one record per message): schema'd, never
    * inferred (SURVEY §1.1). */
  val wireSchema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("payload", StringType, nullable = true),
    StructField("received_at", LongType, nullable = false)))

  /** Binary wire-record schema: one protobuf `Hfp.Data` message per row,
    * the message-bus `value` column shape. `received_at` needs no wire
    * column — the protobuf Topic submessage carries it. */
  val binaryWireSchema: StructType = StructType(Seq(
    StructField("value", BinaryType, nullable = false)))

  /** True when a source frame carries binary wire records (the protobuf
    * decode path) rather than text ones. */
  def isBinaryWire(schema: StructType): Boolean =
    schema.fields.exists(f => f.name == "value" && f.dataType == BinaryType)

  sealed trait SourceSpec
  object SourceSpec {
    final case class FileJson(dir: String, maxFilesPerTrigger: Option[Int] = None)
        extends SourceSpec
    final case class FileBinary(dir: String, maxFilesPerTrigger: Option[Int] = None)
        extends SourceSpec
    final case class Rate(rowsPerSecond: Long) extends SourceSpec
    final case class Pulsar(serviceUrl: String, adminUrl: String, topic: String,
        binary: Boolean = false) extends SourceSpec
  }
  import SourceSpec._

  private val PulsarSourceClass = "org.apache.spark.sql.pulsar.PulsarProvider"

  def rawStream(spark: SparkSession, spec: SourceSpec): DataFrame = spec match {
    case FileJson(dir, maxFiles) =>
      val r = spark.readStream.schema(wireSchema)
      maxFiles.foreach(n => r.option("maxFilesPerTrigger", n))
      r.json(dir)

    case FileBinary(dir, maxFiles) =>
      val r = spark.readStream.schema(binaryWireSchema)
      maxFiles.foreach(n => r.option("maxFilesPerTrigger", n))
      r.parquet(dir)

    case Rate(rps) =>
      // deterministic synthetic wire records keyed by the rate source's
      // monotonically increasing `value`
      spark.readStream.format("rate")
        .option("rowsPerSecond", rps).load()
        .select(syntheticWireColumns(col("value"),
          unix_millis(col("timestamp"))): _*)

    case Pulsar(serviceUrl, adminUrl, topic, binary) =>
      if (!pulsarConnectorAvailable(spark))
        throw new IllegalStateException(
          "Pulsar source requested but the pulsar-spark connector is not on " +
            "the classpath; add the StreamNative pulsar-spark-connector jar " +
            s"(provides $PulsarSourceClass) to use SourceSpec.Pulsar")
      val loaded = spark.readStream.format("pulsar")
        .option("service.url", serviceUrl)
        .option("admin.url", adminUrl)
        .option("topic", topic)
        .load()
      if (binary)
        // protobuf messages (the reference's production wire,
        // MessageProcessor.java:119): raw bytes pass through untouched
        // and HfpStreamPipeline routes them through HfpProtobuf
        loaded.select(col("value").cast(BinaryType).as("value"))
      else
        // text wire: message bytes are the JSON payload, the MQTT topic
        // rides in message properties (public HFP/Pulsar feed shape)
        loaded.select(
          col("__properties").getItem("mqttTopic").cast(StringType).as("topic"),
          col("value").cast(StringType).as("payload"),
          unix_millis(col("__eventTime")).as("received_at"))
  }

  /** Deterministic synthetic wire-record columns keyed by a monotonically
    * increasing id — ONE generator shared by the rate source and the
    * bench's ingest slice, so both exercise the same record shape (a
    * wire-format change updates exactly one site). */
  def syntheticWireColumns(id: org.apache.spark.sql.Column,
      receivedAtMillis: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] = Seq(
    concat(lit("/hfp/v2/journey/ongoing/vp/bus/0022/"),
      lpad(pmod(id, lit(100000L)).cast(StringType), 5, "0"),
      lit("/2550/2/Itakeskus(M)/08:29/1362148/4/60;24/28/65/06")).as("topic"),
    concat(lit("""{"VP":{"desi":"550","dir":"2","oper":22,"veh":"""),
      pmod(id, lit(100000L)).cast(StringType),
      lit(""","tst":"2024-06-05T08:00:01.412Z","tsi":"""),
      (lit(1717574400L) + pmod(id, lit(86400L))).cast(StringType),
      lit(""","spd":8.49,"hdg":72,"lat":60.229214,"long":25.007964,"drst":0,"oday":"2024-06-05","start":"08:29","loc":"GPS","occu":0}}"""))
      .as("payload"),
    receivedAtMillis.as("received_at"))

  private[sources] def pulsarConnectorAvailable(spark: SparkSession,
      providerClass: String = PulsarSourceClass): Boolean =
    try { Class.forName(providerClass); true }
    catch { case _: ClassNotFoundException => false }
}
