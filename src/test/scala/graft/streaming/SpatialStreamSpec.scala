package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.SpatialJoin
import graft.SparkSuite

/** The streaming ε-proximity join (q108's live twin): windowed pair
  * detection on a point stream, proven equal to the batch grid join
  * per window and to the same operator body run in batch mode. */
class SpatialStreamSpec extends SparkSuite {
  import spark.implicits._

  private val Eps = 100L
  private val Schema = "ts TIMESTAMP, pid LONG, x LONG, y LONG"

  private def tmp(prefix: String): String = Files.createTempDirectory(prefix).toString

  // w1 [08:00, 08:01): (1,2) at dist² = 60²+80² = eps² exactly → in;
  //   3 isolated. w2 [08:01, 08:02): (4,5) at 5000 in, (5,6) at 7400 in,
  //   (4,6) at 14400 out.
  private val pts = Seq(
    ("2024-06-05T08:00:05.000Z", 1L, 0L, 0L),
    ("2024-06-05T08:00:10.000Z", 2L, 60L, 80L),
    ("2024-06-05T08:00:20.000Z", 3L, 1000L, 1000L),
    ("2024-06-05T08:01:05.000Z", 4L, 0L, 0L),
    ("2024-06-05T08:01:10.000Z", 5L, 50L, 50L),
    ("2024-06-05T08:01:15.000Z", 6L, 0L, 120L))

  private val W1 = 1717574400000000L // 2024-06-05T08:00:00Z in micros
  private val W2 = W1 + 60000000L

  private def expected = Set(
    (W1, 1L, 2L, 10000L), (W2, 4L, 5L, 5000L), (W2, 5L, 6L, 7400L))

  private def writePoints(dir: String): Unit =
    pts.toDF("ts", "pid", "x", "y")
      .coalesce(1).write.mode("append").json(dir)

  private def prox(df: DataFrame): DataFrame =
    StreamingJoins.proximityPairs(df, "pid", "x", "y", "ts", Eps)

  test("streamed windowed pairs equal the hand-computed set and the " +
    "batch-mode run of the same operator") {
    val in = tmp("px_in_"); val out = tmp("px_out_"); val ckpt = tmp("px_ck_")
    writePoints(in)
    val stream = prox(spark.readStream.schema(Schema).json(in))
    stream.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
      .awaitTermination()
    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed === expected)
    val batch = prox(spark.read.schema(Schema).json(in)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(batch === streamed, "batch-mode run of the same body diverges")
  }

  test("per-window streamed pairs equal the batch grid join on that " +
    "window's slice") {
    val in = tmp("pw_in_")
    writePoints(in)
    val batchAll = prox(spark.read.schema(Schema).json(in)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    for ((w, lo) <- Seq((W1, "08:00"), (W2, "08:01"))) {
      val slice = spark.read.schema(Schema).json(in)
        .where(unix_micros(col("ts")).between(w, w + 59999999L))
        .select(col("pid"), col("x"), col("y"))
      val grid = SpatialJoin.epsSelfJoin(slice, "pid", "x", "y", Eps)
        .collect().map(r => (w, r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(batchAll.filter(_._1 == w).toSet === grid,
        s"window $lo diverges from the batch grid join")
    }
  }
}
