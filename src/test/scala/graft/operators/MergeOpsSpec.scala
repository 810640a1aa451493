package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class MergeOpsSpec extends SparkSuite {
  import spark.implicits._

  private def target =
    Seq((1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0))
      .toDF("id", "name", "bal")

  test("replaceUpsert: source wins on collision, both sides' exclusives survive") {
    val source = Seq((2L, "bob2", 99.0), (4L, "dan", 5.0))
      .toDF("id", "name", "bal")
    val out = MergeOps.replaceUpsert(target, source, Seq("id"))
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out(1).getString(1) == "bob2" && out(1).getDouble(2) == 99.0)
    assert(out(3).getString(1) == "dan")
    assert(out(0).getString(1) == "alice")
  }

  test("mergeUpsert: matched update, source-only insert, target-only untouched") {
    val source = Seq((2L, 7.5), (4L, 1.5)).toDF("id", "delta")
    val out = MergeOps.mergeUpsert(
      target, source, Seq("id"),
      onMatch = Map("bal" -> (col("t.bal") + col("s.delta"))),
      onInsert = Map("name" -> lit("NEW"), "bal" -> col("s.delta")),
      outputCols = Seq("id", "name", "bal"))
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "alice", 10.0), (2L, "bob", 27.5), (3L, "carol", 30.0),
        (4L, "NEW", 1.5)))
  }

  test("mergeUpsert is idempotent for an empty source") {
    val source = Seq.empty[(Long, Double)].toDF("id", "delta")
    val out = MergeOps.mergeUpsert(
      target, source, Seq("id"),
      onMatch = Map("bal" -> (col("t.bal") + col("s.delta"))),
      onInsert = Map("name" -> lit("NEW"), "bal" -> col("s.delta")),
      outputCols = Seq("id", "name", "bal"))
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0)))
  }
}
