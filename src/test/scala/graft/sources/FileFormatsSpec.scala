package graft.sources

import java.nio.file.Files

import graft.SparkSuite
import graft.model.HfpModel
import graft.operators.HfpFlatten
import graft.queries.HfpPipelineQueries

/**
 * Batch file-format coverage (SURVEY §2.2 scans row): the 40-column
 * vehicles relation round-trips through parquet, ORC, AND csv with the
 * hand-declared schema — csv carries no types, so the explicit
 * `vehiclesSchema` must reconstruct timestamps, dates, booleans and
 * shorts exactly. (JSON is covered as the streaming wire format in
 * StreamPipelineSpec.)
 */
class FileFormatsSpec extends SparkSuite {

  test("vehicles relation round-trips through ORC (the other columnar at-rest format)") {
    val flat = HfpFlatten.flatten(HfpPipelineQueries.goodEnvelope(spark),
      strictTst = false)
    val want = flat.orderBy("received_at", "veh").collect().toSeq
    val orc = Files.createTempDirectory("veh_orc_").toString
    flat.write.mode("overwrite").orc(orc)
    val back = spark.read.orc(orc).orderBy("received_at", "veh").collect().toSeq
    assert(back === want)
    // names + types survive exactly (ORC, like every file reader,
    // reports all columns nullable — nullability is not round-trippable)
    assert(spark.read.orc(orc).schema.fields.map(f => (f.name, f.dataType)).toSeq
      === flat.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("vehicles relation round-trips through parquet and schema'd csv") {
    val flat = HfpFlatten.flatten(HfpPipelineQueries.goodEnvelope(spark),
      strictTst = false)
    val want = flat.orderBy("received_at", "veh").collect().toSeq

    val pq = Files.createTempDirectory("veh_pq_").toString
    flat.write.mode("overwrite").parquet(pq)
    val backPq = spark.read.parquet(pq).orderBy("received_at", "veh").collect().toSeq
    assert(backPq === want)

    val csv = Files.createTempDirectory("veh_csv_").toString
    flat.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(csv)
    val backCsv = spark.read
      .schema(HfpModel.vehiclesSchema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(csv)
      .orderBy("received_at", "veh").collect().toSeq
    assert(backCsv === want)
    assert(spark.read.option("header", "true").csv(csv).columns.length === 40)
  }
}
