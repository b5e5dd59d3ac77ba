package graft

import graft.operators.TextOps

/** Pins boilerplate_strip against an independent plain-Scala recompute
  * of the CCNet-style repeated-span removal: chunking mirrors
  * chunks10's semantics (split-keep-trailing-empties, stride 10, short
  * last chunk), boilerplate = chunk present in >1 DISTINCT doc, and
  * kept_tokens sums surviving chunks' whitespace token counts. The
  * DuckDB oracle checks the same numbers a third way at driver time. */
class BoilerplateStripSpec extends SparkSuite {

  private def chunksOf(text: String): Seq[String] = {
    // Spark split(text, " ") == Java split with limit -1 (trailing
    // empties kept); sequence(0, greatest(size-1, 0), 10)
    val toks = text.split(" ", -1)
    (0 to math.max(toks.length - 1, 0) by 10)
      .map(i => toks.slice(i, math.min(i + 10, toks.length)).mkString(" "))
  }

  private def tokCount(chunk: String): Long =
    chunk.count(_ == ' ') + 1L

  test("boilerplate_strip matches a driver-Scala reference on the fixture") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))

    val chunks: Map[Long, Seq[String]] =
      docs.map { case (id, t) => id -> chunksOf(t) }.toMap
    val docFreq: Map[String, Int] = chunks.toSeq
      .flatMap { case (id, cs) => cs.distinct.map(c => (c, id)) }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).distinct.size }

    val expected = chunks.map { case (id, cs) =>
      val boiler = cs.count(c => docFreq(c) > 1).toLong
      val kept = cs.filter(c => docFreq(c) <= 1).map(tokCount).sum
      id -> (cs.length.toLong, boiler, kept, boiler * 1000000L / cs.length)
    }

    val got = TextOps.boilerplateStrip(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    assert(got.keySet == expected.keySet, "doc coverage differs")
    expected.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: got ${got(id)}, expected $e")
    }

    // the fixture genuinely exercises both branches
    val anyBoiler = expected.values.exists(_._2 > 0)
    val anyClean = expected.values.exists(_._2 == 0)
    assert(anyBoiler, "fixture has no boilerplate chunks — test is vacuous")
    assert(anyClean, "every doc is all-boilerplate — test is degenerate")
  }

  test("boilerplate_strip agrees with chunk_dedup on which docs carry dups") {
    // chunk_dedup flags chunks with COUNT(*) > 1 (incl. intra-doc
    // repeats); boilerplate uses DISTINCT-doc frequency. Every
    // boilerplate doc must therefore contain some chunk_dedup-flagged
    // chunk (the converse need not hold).
    val dupFps = TextOps.chunkDedup(spark, sf).select("fp")
      .collect().map(_.getString(0)).toSet
    val strip = TextOps.boilerplateStrip(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    docs.foreach { case (id, t) =>
      val cs = t.split(" ", -1)
      val chunkFps = (0 to math.max(cs.length - 1, 0) by 10)
        .map(i => md5hex(cs.slice(i, math.min(i + 10, cs.length)).mkString(" ")))
      if (strip(id) > 0)
        assert(chunkFps.exists(dupFps), s"doc $id boilerplate w/o dup chunk")
    }
  }
}
