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

  test("GPT-2 interchange: byte map anchors, hand-pinned encodes, " +
      "vocab/merges cross-validation") {
    // the PUBLISHED bytes-to-unicode anchors: printable bytes map to
    // themselves, excluded bytes to U+0100+n in exclusion order
    val vocab =
      """{"h":0,"e":1,"l":2,"o":3,"Ġ":4,"he":5,"ll":6,"hell":7,"Ġh":8}"""
    val merges = "#version: 0.2\nh e\nl l\nhe ll\nĠ h\n"
    val (m, ids) = BpeModel.load(merges, vocab)
    assert(m.byteLevel)
    assert(ids("hell") == 7 && ids("Ġ") == 4)
    // hand-computed byte-level encodes: NO end marker, space = Ġ
    assert(m.encodeWord("hello").toSeq == Seq("hell", "o"))
    // rank order: (h,e) fires before (Ġ,h) can — GPT-2's
    // min-rank-first greedy, reproduced by rank-ascending passes
    assert(m.encodeWord(" hello").toSeq == Seq("Ġ", "hell", "o"))
    assert(m.encodeWord("A\n").toSeq == Seq("A", "Ċ"),
      "byte 0x0A maps to U+010A (Ċ) per the published table")
    assert(m.encodeWord("\u0000").toSeq == Seq("Ā"),
      "byte 0x00 maps to U+0100 per the published table")
    // a merges/vocab pair that disagrees is refused, not mis-loaded
    val bad = intercept[IllegalArgumentException] {
      BpeModel.load("#version: 0.2\nx y\n", """{"x":0,"y":1}""")
    }
    assert(bad.getMessage.contains("xy"))
  }

  test("GPT-2 export ∘ load round-trips BOTH model kinds bit-for-bit") {
    // native char-level model (the t14 trainer's output)
    val native = BpeModel.train(
      Seq(("hello", 5L), ("help", 3L), ("world", 2L)), nMerges = 20)
    val (mt, vt) = BpeModel.exportGpt2(native)
    val (back, vocabBack) = BpeModel.load(mt, vt)
    assert(!back.byteLevel, "char-level survives the format round-trip")
    assert(back.merges.toSeq == native.merges.toSeq)
    for (w <- Seq("hello", "help", "world", "helpo", "xyz"))
      assert(back.encodeWord(w).toSeq == native.encodeWord(w).toSeq, w)
    assert(vocabBack.values.toSeq.distinct.size == vocabBack.size,
      "ids are unique")
    // byte-level model round-trips too
    val bl = new BpeModel(Array(("h", "e"), ("l", "l")), byteLevel = true)
    val (mt2, vt2) = BpeModel.exportGpt2(bl)
    val (back2, _) = BpeModel.load(mt2, vt2)
    assert(back2.byteLevel && back2.merges.toSeq == bl.merges.toSeq)
    assert(back2.encodeWord("hello").toSeq == bl.encodeWord("hello").toSeq)
  }
}
