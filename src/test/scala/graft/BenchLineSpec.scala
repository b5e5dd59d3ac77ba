package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout contract (round-14 self-contained-artifact item):
  * the driver's per-round artifact stores only the LAST 2,000 stdout
  * bytes, and sbt's `[success] Total time …` epilogue (~75 bytes)
  * lands after our line — so the compact JSON line must stay ≤ 1,900
  * bytes even in the worst case (every query at a 5-char "99.99"
  * value) for BENCH_r{N}.json to hold the whole per-query map. This
  * budget FAILS the build when a round's headline additions overflow
  * the window, instead of silently truncating the next artifact: the
  * fix is to retire a redundant headline entry (the documented list at
  * the top of [[Bench.headline]]), never to let the line grow.
  */
class BenchLineSpec extends AnyFunSuite {

  test("headline names are declared queries") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"unknown headline queries: $missing")
  }

  test("worst-case compact stdout line fits the driver tail window") {
    val worst = Bench.headline.map(n => (n, 99.99, 99.99))
    val line = Bench.compactJson(worst, "/root/testdata/sf0.1")
    assert(line.getBytes("UTF-8").length <= 1900,
      s"compact bench line is ${line.length} bytes — retire a redundant " +
        "headline entry (see the round-14 pruning note in Bench.headline)")
  }

  test("compact line is valid JSON shape with the contract keys") {
    val line = Bench.compactJson(
      Seq(("a_query", 0.123456, 0.2), ("b_query", -1.0, -1.0)), "/x/sf0.1")
    // contract keys present, sf reduced to basename, failure listed
    assert(line.startsWith("{\"metric\":\"total\",\"value\":"))
    assert(line.contains("\"unit\":\"sec\""))
    assert(line.contains("\"a_query\":0.12"))
    assert(line.contains("\"b_query\":-1"))
    assert(line.contains("\"failed\":[\"b_query\"]"))
    assert(line.endsWith("\"sf\":\"sf0.1\"}"))
  }
}
