package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.operators.HfpFlatten
import graft.sources.HfpRawIngest
import graft.SparkSuite

/** Stream-static enrichment and stream-stream interval join semantics
  * over the real wire→envelope→flatten stream. */
class StreamingJoinsSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(prefix: String): String = Files.createTempDirectory(prefix).toString

  private def topic(et: String, veh: Int) =
    s"/hfp/v2/journey/ongoing/$et/bus/0022/${"%05d".format(veh)}/2550/2/X/08:00/1/4/60;24/28/65/06"

  private def rec(et: String, tst: String, veh: Int): (String, String, Long) =
    (topic(et, veh),
      s"""{"${et.toUpperCase}":{"dir":"2","oper":22,"veh":$veh,"tst":"$tst","tsi":1,"route":"2550"}}""",
      1717574400000L)

  private def writeFile(dir: String, recs: Seq[(String, String, Long)]): Unit =
    recs.toDF("topic", "payload", "received_at")
      .coalesce(1).write.mode("append").json(dir)

  private def vehiclesStream(in: String): DataFrame =
    HfpFlatten.flatten(
      HfpRawIngest.toEnvelope(
        spark.readStream.schema(HfpStreamPipeline.wireSchema).json(in)),
      strictTst = false)

  private def runOnce(df: DataFrame, out: String, ckpt: String): Unit =
    df.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
      .awaitTermination()

  test("stream-static enrichment: dimension values ride along, unmatched rows survive") {
    val in = tmp("se_in_"); val out = tmp("se_out_"); val ckpt = tmp("se_ck_")
    writeFile(in, Seq(rec("vp", "2024-06-05T08:00:00Z", 854)))
    val routes = Seq(("2550", "Itakeskus - Westend"), ("9999", "unused"))
      .toDF("route_id", "route_name")
    val enriched = StreamingJoins.enrichRoutes(vehiclesStream(in), routes)
      .select("unique_vehicle_id", "route_id", "route_name")
    runOnce(enriched, out, ckpt)
    val rows = spark.read.parquet(out).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("route_name") === "Itakeskus - Westend")
  }

  test("stream-stream interval join: door dwell matches within the bound only") {
    val inO = tmp("dw_o_"); val inC = tmp("dw_c_")
    val out = tmp("dw_out_"); val ckpt = tmp("dw_ck_")
    // veh 854: open 08:00:00, close 08:00:45 → dwell 45 s
    // veh 855: open 08:01:00, close 08:20:00 → outside the 10 min bound
    // veh 900: close with no open → inner join drops it
    writeFile(inO, Seq(
      rec("doo", "2024-06-05T08:00:00Z", 854),
      rec("doo", "2024-06-05T08:01:00Z", 855)))
    writeFile(inC, Seq(
      rec("doc", "2024-06-05T08:00:45Z", 854),
      rec("doc", "2024-06-05T08:20:00Z", 855),
      rec("doc", "2024-06-05T08:00:30Z", 900)))
    val dwell = StreamingJoins.doorDwell(
      vehiclesStream(inO), vehiclesStream(inC), withinMinutes = 10)
    runOnce(dwell, out, ckpt)
    val rows = spark.read.parquet(out).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("unique_vehicle_id") === "22/854")
    assert(rows.head.getAs[Long]("dwell_us") === 45000000L)
  }

  test("left-outer interval join: unmatched open emits null dwell at watermark eviction") {
    val inO = tmp("dwo_o_"); val inC = tmp("dwo_c_")
    val out = tmp("dwo_out_"); val ckpt = tmp("dwo_ck_")
    def dwell = StreamingJoins.doorDwell(
      vehiclesStream(inO), vehiclesStream(inC),
      withinMinutes = 10, joinType = "left_outer")

    // run 1: veh 854 open 08:00:00 + close 08:00:45 (matched pair emits
    // immediately); veh 900 open 08:01:00 with NO close — watermark
    // (min over both inputs ≈ 07:51) is far before 900's interval bound
    // (08:11), so it sits in state, not in the output
    writeFile(inO, Seq(
      rec("doo", "2024-06-05T08:00:00Z", 854),
      rec("doo", "2024-06-05T08:01:00Z", 900)))
    writeFile(inC, Seq(rec("doc", "2024-06-05T08:00:45Z", 854)))
    runOnce(dwell, out, ckpt)
    val rows1 = spark.read.parquet(out).collect()
    assert(rows1.length === 1)
    assert(rows1.head.getAs[String]("unique_vehicle_id") === "22/854")

    // run 2: 09:00 events on BOTH inputs push the global watermark to
    // 08:50 — past 900's 08:11 bound — so eviction EMITS the unmatched
    // open with null dwell. The 09:00 open itself (veh 999) stays in
    // state: the watermark has not passed ITS interval.
    writeFile(inO, Seq(rec("doo", "2024-06-05T09:00:00Z", 999)))
    writeFile(inC, Seq(rec("doc", "2024-06-05T09:00:00Z", 998)))
    runOnce(dwell, out, ckpt)
    val byVeh = spark.read.parquet(out).collect()
      .map(r => r.getAs[String]("unique_vehicle_id") ->
        Option(r.getAs[java.lang.Long]("dwell_us"))).toMap
    assert(byVeh.keySet === Set("22/854", "22/900"))
    assert(byVeh("22/854") === Some(45000000L))
    assert(byVeh("22/900") === None)

    // the batch twin over the SAME inputs agrees row-for-row
    val batch = StreamingJoins.doorDwell(
      HfpFlatten.flatten(HfpRawIngest.toEnvelope(
        spark.read.schema(HfpStreamPipeline.wireSchema).json(inO)), strictTst = false),
      HfpFlatten.flatten(HfpRawIngest.toEnvelope(
        spark.read.schema(HfpStreamPipeline.wireSchema).json(inC)), strictTst = false),
      withinMinutes = 10, joinType = "left_outer")
      .collect()
      .map(r => r.getAs[String]("unique_vehicle_id") ->
        Option(r.getAs[java.lang.Long]("dwell_us"))).toMap
    // batch has no watermark: veh 999's unmatched open ALSO surfaces
    assert(batch === byVeh + ("22/999" -> None))
  }
}
