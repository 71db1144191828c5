package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic character-level BPE model (Sennrich et al. 2016, the
  * subword-tokenization step every LLM pretraining pipeline runs
  * between cleaned text and token ids).
  *
  * Model = an ordered merge list. Encoding applies merges in RANK
  * order, one left-to-right non-overlapping pass per rank, over the
  * word's code points plus a final end-of-word marker symbol
  * ([[BpeModel.EndMark]]). Rank order is equivalent to the classic
  * min-rank-first greedy: a pair a merge can CREATE contains a symbol
  * that only exists after that merge ran during training, so any such
  * pair was learned later and has a higher rank — rank-ascending is a
  * topological order (the HuggingFace tokenizers discipline).
  *
  * Every step is expressible in pure SQL over the persisted merges
  * table (symbols joined as ' sym ' runs; one `replace()` per rank —
  * SQL replace is left-to-right non-overlapping, exactly this pass),
  * which is what makes the DuckDB oracle a zero-drift replay.
  *
  * The model is merge-list-sized and ships to executors inside the
  * serialized plan (`ctx.addReferenceObj`, the [[CentroidIndex]]
  * discipline); a bounded per-JVM memo makes repeated words O(1) —
  * natural-language corpora are Zipfian, so the memo hit rate at
  * scale is the vocabulary hit rate. */
final class BpeModel(val merges: Array[(String, String)],
    val byteLevel: Boolean = false)
    extends Serializable {

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  /** Initial symbol sequence. Native models: code points + end
    * marker. BYTE-LEVEL models (the GPT-2 interchange convention):
    * the word's UTF-8 bytes through the published bytes-to-unicode
    * table, NO end marker — spaces arrive as 'Ġ' from the
    * pre-tokenizer side, exactly as in the loaded `merges.txt`. */
  private def initial(word: String): Array[String] = {
    if (byteLevel) {
      val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val a = new Array[String](bytes.length)
      var i = 0
      while (i < bytes.length) {
        a(i) = BpeModel.byteSymbol(bytes(i) & 0xff); i += 1
      }
      return a
    }
    val cps = word.codePoints().toArray
    val a = new Array[String](cps.length + 1)
    var i = 0
    while (i < cps.length) {
      a(i) = new String(Character.toChars(cps(i))); i += 1
    }
    a(cps.length) = BpeModel.EndMark
    a
  }

  /** One left-to-right non-overlapping merge pass (SQL `replace`
    * semantics over the delimited-symbol string). */
  private def mergePass(syms: Array[String], l: String, r: String)
      : Array[String] = {
    var i = 0; var found = false
    while (i + 1 < syms.length && !found) {
      if (syms(i) == l && syms(i + 1) == r) found = true else i += 1
    }
    if (!found) return syms
    val out = Array.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
        out += (l + r); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  def encodeWord(word: String): Array[String] = {
    val cached = memo.get(word)
    if (cached != null) return cached
    var syms = initial(word)
    var r = 0
    while (r < merges.length) {
      val m = merges(r)
      syms = mergePass(syms, m._1, m._2)
      r += 1
    }
    if (memo.size() < BpeModel.MemoCap) memo.put(word, syms)
    syms
  }

  /** Kernel entry for the encode expression. */
  def encodeData(word: UTF8String): ArrayData =
    new GenericArrayData(
      encodeWord(word.toString).map(UTF8String.fromString(_): Any))

  /** Kernel entry for the count expression: total BPE pieces over a
    * whitespace-token array. */
  def countTokens(tokens: ArrayData): Int = {
    var total = 0
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      total += encodeWord(tokens.getUTF8String(i).toString).length
      i += 1
    }
    total
  }
}

object BpeModel {
  /** End-of-word marker symbol (the sentencepiece '▁'); words
    * containing it would alias the marker — the trainer refuses such
    * corpora rather than silently mis-tokenize. */
  val EndMark = "▁"
  val MemoCap = 1 << 16

  /** Deterministic greedy training over a word-frequency table (the
    * driver-side half: the DISTRIBUTED work is the word count that
    * produced `wordFreq`; the merge loop touches only the bounded
    * vocabulary — the standard split even at corpus scale). Ties
    * break by lexicographic pair order, so the model is a pure
    * function of the word-frequency table. */
  def train(wordFreq: Seq[(String, Long)], nMerges: Int): BpeModel = {
    require(wordFreq.forall(!_._1.contains(EndMark)),
      s"BPE corpus contains the reserved end-marker $EndMark")
    var words: Array[(Array[String], Long)] = wordFreq.toArray.map {
      case (w, f) =>
        val cps = w.codePoints().toArray
        val a = new Array[String](cps.length + 1)
        var i = 0
        while (i < cps.length) {
          a(i) = new String(Character.toChars(cps(i))); i += 1
        }
        a(cps.length) = EndMark
        (a, f)
    }
    val merges = Array.newBuilder[(String, String)]
    var step = 0
    var done = false
    while (step < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // deterministic argmax: count desc, then pair asc
        var best: ((String, String), Long) = null
        counts.foreach { kv =>
          if (best == null || kv._2 > best._2 ||
              (kv._2 == best._2 &&
                implicitly[Ordering[(String, String)]]
                  .lt(kv._1, best._1))) best = kv
        }
        val (l, r) = best._1
        merges += best._1
        words = words.map { case (syms, f) =>
          // inline merge pass (same left-to-right rule as encode)
          val out = Array.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
              out += (l + r); j += 2
            } else { out += syms(j); j += 1 }
          }
          (out.result(), f)
        }
        step += 1
      }
    }
    new BpeModel(merges.result())
  }

  // ---- GPT-2-format interchange (vocab.json + merges.txt) -----------
  // The file pair every framework dumps (HuggingFace `save_pretrained`,
  // the original GPT-2 release, tiktoken's exports) — loading it makes
  // the t14/t3 token operators run a PUBLISHED tokenizer instead of
  // only natively-trained ones, mirroring t17's loaded-weights step.

  /** The published GPT-2 bytes→unicode map: printable latin-1 bytes
    * map to themselves, every other byte b to U+0100+n in exclusion
    * order — a bijection so byte-level BPE stays lossless text. */
  private val ByteToChar: Array[String] = {
    val direct = (33 to 126) ++ (161 to 172) ++ (174 to 255)
    val isDirect = direct.toSet
    val out = new Array[String](256)
    var n = 0
    (0 to 255).foreach { b =>
      if (isDirect(b)) out(b) = new String(Character.toChars(b))
      else { out(b) = new String(Character.toChars(256 + n)); n += 1 }
    }
    out
  }

  private[functions] def byteSymbol(b: Int): String = ByteToChar(b)

  /** Parse the `merges.txt` + `vocab.json` pair into a BYTE-LEVEL
    * model plus its id table. Validates the pair against each other:
    * every merge product must be a vocab entry (a mismatched pair is
    * a corrupt export — refused, never a silently different
    * tokenizer). */
  def load(mergesText: String, vocabJson: String): (BpeModel, Map[String, Int]) = {
    // the GPT-2 format implies byte-level semantics; a native
    // char-level export self-identifies via a comment header so the
    // round-trip is exact
    val charLevel = mergesText.split("\n")
      .exists(_.trim == "#graft: char-level")
    val merges = mergesText.split("\n").iterator
      .map(_.stripSuffix("\r"))
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map { l =>
        val sp = l.indexOf(' ')
        require(sp > 0 && l.indexOf(' ', sp + 1) < 0,
          s"merges.txt line is not 'left right': '$l'")
        (l.substring(0, sp), l.substring(sp + 1))
      }.toArray
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(vocabJson)
    require(node.isObject, "vocab.json must be a string->id object")
    val vocab = {
      val b = Map.newBuilder[String, Int]
      val it = node.fields()
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asInt() }
      b.result()
    }
    merges.foreach { case (l, r) =>
      require(vocab.contains(l + r),
        s"merge '$l $r' produces '${l + r}' which vocab.json lacks — " +
          "mismatched vocab/merges pair")
    }
    (new BpeModel(merges, byteLevel = !charLevel), vocab)
  }

  /** Export a model as the same interchange pair ([[load]]'s inverse):
    * `merges.txt` is the rank-ordered merge list under the standard
    * version header; `vocab.json` ids the base symbols (sorted) then
    * the merge products in rank order — deterministic, so export ∘
    * load round-trips bit-for-bit. Works for BOTH byte-level and the
    * native char-level models (the marker symbol is just another
    * vocab entry). */
  def exportGpt2(m: BpeModel): (String, String) = {
    val mergesTxt = "#version: 0.2\n" +
      (if (m.byteLevel) "" else "#graft: char-level\n") +
      m.merges.map { case (l, r) => s"$l $r" }.mkString("\n") + "\n"
    val base = scala.collection.immutable.SortedSet.newBuilder[String]
    if (!m.byteLevel) base += EndMark
    m.merges.foreach { case (l, r) => base += l; base += r }
    val products = m.merges.map { case (l, r) => l + r }
    val baseOnly = base.result().toSeq.filterNot(products.toSet)
    val entries = (if (m.byteLevel)
        (0 to 255).map(byteSymbol).filterNot(products.toSet)
      else baseOnly) ++ products
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.createObjectNode()
    entries.zipWithIndex.foreach { case (s, i) => node.put(s, i) }
    (mergesTxt, om.writeValueAsString(node))
  }
}
