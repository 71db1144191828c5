package graft

import org.apache.spark.sql.functions._

import graft.functions.BpeModel
import graft.ops.Bpe

/** Deterministic character-level BPE (t14): training greedy, encode
  * semantics (rank order, left-to-right non-overlapping passes),
  * out-of-vocab behavior, persistence roundtrip. */
class BpeSpec extends SparkSpec {

  test("training learns highest-frequency pairs first, deterministically") {
    // 'ab' appears in every word of the dominant corpus half
    val wf = Seq(("abab", 10L), ("abc", 5L), ("xy", 1L))
    val m1 = BpeModel.train(wf, nMerges = 3)
    val m2 = BpeModel.train(wf, nMerges = 3)
    assert(m1.merges.toSeq == m2.merges.toSeq, "training must be deterministic")
    assert(m1.merges.head == ("a", "b"),
      s"most frequent pair first, got ${m1.merges.head}")
  }

  test("encode: rank-ordered passes, left-to-right non-overlap on runs") {
    // merges: (a,a) only — 'aaa' must merge leftmost-first: (aa)(a)
    val m = new BpeModel(Array(("a", "a")))
    assert(m.encodeWord("aaa").toSeq == Seq("aa", "a", BpeModel.EndMark))
    assert(m.encodeWord("aaaa").toSeq == Seq("aa", "aa", BpeModel.EndMark))
    // out-of-vocab symbols stay as single code points
    assert(m.encodeWord("xy").toSeq == Seq("x", "y", BpeModel.EndMark))
    // later ranks see earlier merges' output
    val m2 = new BpeModel(Array(("a", "a"), ("aa", BpeModel.EndMark)))
    assert(m2.encodeWord("aa").toSeq == Seq("aa" + BpeModel.EndMark))
  }

  test("classic equivalence: fully-trained model collapses training words") {
    val wf = Seq(("hello", 5L), ("help", 3L), ("world", 2L))
    val m = BpeModel.train(wf, nMerges = 100)
    // enough merges: every training word becomes ONE token
    assert(m.encodeWord("hello").length == 1)
    assert(m.encodeWord("help").length == 1)
    // a novel word built from shared prefixes splits into learned pieces
    val pieces = m.encodeWord("helpo")
    assert(pieces.length > 1 && pieces.forall(_.nonEmpty))
  }

  test("save/load roundtrip preserves encoding; kernel matches driver") {
    import spark.implicits._
    val docs = Seq((1L, "the cat sat on the mat"), (2L, "the cat ran"))
      .toDF("doc_id", "text")
    val trained = Bpe.train(docs, nMerges = 10)
    val dir = graft.streaming.EventsStream.scratchDir("bpe_rt")
    Bpe.save(spark, trained, dir)
    val loaded = Bpe.load(spark, dir)
    assert(loaded.merges.toSeq == trained.merges.toSeq)
    // kernel expression output == driver-side encodeWord
    val viaKernel = docs
      .select(explode(split(col("text"), " ")).as("w")).distinct()
      .select(col("w"), Bpe.encodeWord(col("w"), loaded).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    viaKernel.foreach { case (w, p) =>
      assert(p == trained.encodeWord(w).toSeq, s"kernel mismatch on $w")
    }
    // doc-level count == sum of word piece counts
    val counts = docs
      .select(col("doc_id"), Bpe.tokenCount(col("text"), loaded).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expect1 = "the cat sat on the mat".split(" ")
      .map(trained.encodeWord(_).length).sum
    assert(counts(1L) == expect1)
  }
}
