package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/**
 * prevBench's parse-fallback contract (the r14 close-gate finding):
 * close_gate's shell redirect creates the CURRENT round's output file
 * — zero bytes — before the JVM starts, so the newest NAME on disk is
 * unparseable and taking it verbatim silently disabled the retry pass
 * in every close-gate run. The newest PARSEABLE candidate must win.
 */
class BenchPrevSpec extends AnyFunSuite {

  private def write(dir: java.io.File, name: String, body: String): Unit =
    Files.writeString(new java.io.File(dir, name).toPath, body)

  test("prevBench falls through an empty newest file to the newest " +
      "parseable candidate, ordered by numeric round (r9 < r10)") {
    val dir = Files.createTempDirectory("benchprev_").toFile
    write(dir, "bench_local_r14_full.json", "")        // in-flight, empty
    write(dir, "bench_local_r9_full.json",
      """{"queries":{"q01":9.0}}""")
    write(dir, "bench_local_r13_full.json",
      """{"queries":{"q01":1.5,"q02":0.4}}""")
    val got = Bench.prevBench(dir)
    assert(got.map(_._1) === Some("bench_local_r13_full.json"))
    assert(got.map(_._2) === Some(Map("q01" -> 1.5, "q02" -> 0.4)))
  }

  test("prevBench prefers the newest round STRICTLY BELOW the highest " +
      "round on disk even when the highest round parses (r14 verdict " +
      "advisory #2: the driver's run must not self-shadow on the same " +
      "round's close-gate bench)") {
    val dir = Files.createTempDirectory("benchprev_").toFile
    write(dir, "bench_local_r15_full.json",
      """{"queries":{"q01":0.9}}""")                   // this round's close
    write(dir, "bench_local_r14_full.json",
      """{"queries":{"q01":1.1}}""")                   // previous round
    write(dir, "bench_local_r13_full.json",
      """{"queries":{"q01":1.5}}""")
    val got = Bench.prevBench(dir)
    assert(got.map(_._1) === Some("bench_local_r14_full.json"))
  }

  test("prevBench falls back to the highest round's own file when no " +
      "lower round parses (single-round directory)") {
    val dir = Files.createTempDirectory("benchprev_").toFile
    write(dir, "bench_local_r15_full.json",
      """{"queries":{"q01":0.9}}""")
    assert(Bench.prevBench(dir).map(_._1) ===
      Some("bench_local_r15_full.json"))
    val dir2 = Files.createTempDirectory("benchprev_").toFile
    write(dir2, "bench_local_r15_full.json",
      """{"queries":{"q01":0.9}}""")
    write(dir2, "bench_local_r14_full.json", "")       // lower, unparseable
    assert(Bench.prevBench(dir2).map(_._1) ===
      Some("bench_local_r15_full.json"))
  }

  test("prevBench reads None when no candidate parses, and skips " +
      "files whose queries field is missing or non-object") {
    val dir = Files.createTempDirectory("benchprev_").toFile
    write(dir, "bench_local_r14_full.json", "")
    write(dir, "bench_local_r13_full.json", """{"metric":"total"}""")
    assert(Bench.prevBench(dir).isEmpty)
    val dir2 = Files.createTempDirectory("benchprev_").toFile
    assert(Bench.prevBench(dir2).isEmpty)
  }
}
