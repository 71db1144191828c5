package graft

import org.apache.spark.sql.functions._
import graft.ops.Corpus

/** Corpus-assembly operators: sequence packing, PII redaction,
  * weighted domain sampling. */
class CorpusSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  test("packSequences: concat-and-chunk in order, chunk = floor(tokens-before/budget)") {
    // tokens: 3, 4, 2, 5 — budget 6: cum-before 0,3,7,9 → chunks 0,0,1,1
    val d = docs(Seq(
      (1L, "a b c", "en"),
      (2L, "a b c d", "en"),
      (3L, "a b", "en"),
      (4L, "a b c d e", "en")))
    val p = Corpus.packSequences(d, "text", budget = 6,
      strata = Seq("lang"), orderCol = "doc_id")
      .select("doc_id", "n_tokens", "chunk").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(p(1L) == ((3, 0L)) && p(2L) == ((4, 0L)))
    assert(p(3L) == ((2, 1L)) && p(4L) == ((5, 1L)))
  }

  test("packSequences: strata pack independently (no cross-lang bleed)") {
    val d = docs(Seq(
      (1L, "a b c d e", "en"), (2L, "a b c", "en"),
      (10L, "x y z w v", "de"), (11L, "x y", "de")))
    val p = Corpus.packSequences(d, "text", budget = 5,
      strata = Seq("lang"), orderCol = "doc_id")
    // each lang starts its own chunk 0; second doc starts at cum 5 → chunk 1
    val chunks = p.select("doc_id", "chunk").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks == Map(1L -> 0L, 2L -> 1L, 10L -> 0L, 11L -> 1L))
  }

  test("packSequences: an oversized document overflows its chunk but is never split") {
    val d = docs(Seq((1L, ("w " * 9).trim, "en"), (2L, "a b", "en")))
    val p = Corpus.packSequences(d, "text", budget = 4,
      strata = Seq("lang"), orderCol = "doc_id")
      .select("doc_id", "chunk").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p(1L) == 0L)       // starts at 0, overflows
    assert(p(2L) == 2L)       // next doc starts at token 9 → chunk 2
  }

  test("redactPii replaces every email and phone and counts matches") {
    import spark.implicits._
    val d = Seq(
      (1L, "mail a.b+c@foo.example.org and x@y.io call +1-555-123-4567 done"),
      (2L, "no pii here at all"))
      .toDF("doc_id", "text")
    val r = Corpus.redactPii(d, "text").collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Int]("n_emails"), x.getAs[Int]("n_phones"),
          x.getAs[String]("text_redacted")))).toMap
    assert(r(1L)._1 == 2 && r(1L)._2 == 1)
    assert(r(1L)._3 == "mail <EMAIL> and <EMAIL> call <PHONE> done")
    assert(r(2L) == ((0, 0, "no pii here at all")))
  }

  test("repetitionSignals: duplicated word/bigram fractions, short-doc guard") {
    import spark.implicits._
    val d = Seq(
      (1L, "a a a a"),          // 4 words 1 distinct → dwf 0.75; bigrams "a a"×3 → dbf 2/3
      (2L, "x y z w"),          // all distinct → 0.0; bigrams distinct → 0.0
      (3L, "solo"))             // 1 word → dwf 0.0, no bigrams → dbf 0.0
      .toDF("doc_id", "text")
    val r = graft.ops.Corpus.repetitionSignals(d, "text").collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Double]("dup_word_frac"), x.getAs[Double]("dup_bigram_frac")))).toMap
    assert(r(1L) == ((0.75, 0.666667)))
    assert(r(2L) == ((0.0, 0.0)))
    assert(r(3L) == ((0.0, 0.0)))
  }

  test("weightedSample: deterministic, rate-monotone, unlisted domains untouched") {
    import spark.implicits._
    val d = (0L until 2000L).map(i => (i, s"src${i % 4}")).toDF("id", "domain")
    def kept(rates: Map[String, Double]) =
      Corpus.weightedSample(d, "id", "domain", rates)
        .groupBy("domain").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = kept(Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.1))
    assert(k("src0") == 500, "rate 1.0 keeps everything")
    assert(k("src3") == 500, "unlisted domain keeps everything")
    assert(math.abs(k("src1") - 250) < 60, s"rate 0.5 ≈ half, got ${k("src1")}")
    assert(k("src2") < k("src1"), "lower rate keeps fewer")
    // reproducible: same input → identical sample
    assert(kept(Map("src1" -> 0.5))("src1") == k("src1"))
  }

  test("splitAssign: deterministic, proportional, stable under growth") {
    import spark.implicits._
    val d = (0L until 2000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val counts = Corpus.splitAssign(d, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(math.abs(counts("train") - 1600) < 120, s"train ${counts("train")}")
    assert(math.abs(counts("val") - 200) < 80, s"val ${counts("val")}")
    assert(math.abs(counts("test") - 200) < 80, s"test ${counts("test")}")
    // stability: a row's split never changes when the table grows —
    // the rolling-ingest contract (random() splits fail this)
    val small = Corpus.splitAssign(d.where($"doc_id" < 500), "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = Corpus.splitAssign(d, "doc_id")
      .where($"doc_id" < 500)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small == full)
    // custom fractions + validation
    val two = Corpus.splitAssign(d, "doc_id", Seq(("a", 0.5), ("b", 0.5)))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(two.keySet == Set("a", "b"))
    intercept[IllegalArgumentException] {
      Corpus.splitAssign(d, "doc_id", Seq(("a", 0.5), ("b", 0.2)))
    }
  }

  test("qualityGate: first failing rule names the reason") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four five six seven"),          // keep
      (2L, "too short"),                                   // too_short
      (3L, "a b c d e f"),                                 // word_len (mean 1.0)
      (4L, "@@@@ #### $$$$ %%%% ^^^^ &&&&"),               // word_len? mean 4... symbol_ratio
      (5L, "spam spam spam spam spam spam spam spam"),     // repetition
      (6L, ""))                                            // empty
      .toDF("doc_id", "text")
    val byName = graft.ops.Corpus.qualityGate(docs, "text")
      .select("doc_id", "keep", "reason").collect()
      .map(x => x.getLong(0) -> ((x.getBoolean(1), Option(x.getString(2))))).toMap
    assert(byName(1L) == ((true, None)))
    assert(byName(2L) == ((false, Some("too_short"))))
    assert(byName(3L) == ((false, Some("word_len"))))
    assert(byName(4L) == ((false, Some("symbol_ratio"))))
    assert(byName(5L) == ((false, Some("repetition"))))
    assert(byName(6L) == ((false, Some("empty"))))
  }

  test("chunkDocuments: full token coverage, fixed stride, no " +
      "pure-overlap tail, map-only plan") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 130 tokens → starts 0, 48, 96 (96+16 < 130 keeps the tail);
    // 110 tokens → 96+16 > 110 would make start 96 pure overlap of
    // 48..111? no — 96..109 is NOT contained in 48..111; the rule is
    // start+overlap < n: 96+16=112 > 110 → start 96 dropped;
    // 20 tokens → one chunk of 20
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, words(130)), (2L, words(110)), (3L, words(20)))
      .toDF("doc_id", "text")
    val out = Corpus.chunkDocuments(docs, maxTokens = 64, overlap = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      (1L, 0, 0, 64), (1L, 1, 48, 64), (1L, 2, 96, 34),
      (2L, 0, 0, 64), (2L, 1, 48, 62),
      (3L, 0, 0, 20)), out.toSeq)
    // coverage: every token index of doc 2 falls inside some chunk —
    // the dropped start-96 window loses nothing (48..109 covers it)
    assert(out.filter(_._1 == 2L).map(c => (c._3, c._3 + c._4))
      .foldLeft(0)((covered, w) =>
        if (w._1 <= covered) math.max(covered, w._2) else covered) == 110)
    // identical text → identical chunk hashes (the chunk-dedup hook)
    val twin = Seq((7L, words(130)), (8L, words(130))).toDF("doc_id", "text")
    val h = Corpus.chunkDocuments(twin).select("chunk_idx", "chunk_hash")
      .collect().groupBy(_.getInt(0)).view.mapValues(_.map(_.getString(1)).toSet)
    assert(h.values.forall(_.size == 1))
    // map-only: no join/aggregate/shuffle below the gate's ordering
    val plan = Corpus.chunkDocuments(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Aggregate"), plan)
  }
}
