package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for training-data pipelines — the steps
  * between a cleaned document table and a tokenizer-ready dataset
  * (the reference's pipelines stop at cleaned parquet; these are the
  * standard downstream moves every large pretraining corpus needs).
  *
  * All three are built from codegen'd built-ins with DuckDB-twin
  * semantics, so each carries an exact SQL oracle:
  *
  *   - [[packSequences]]: concat-and-chunk sequence packing. Documents
  *     are laid head-to-tail in a deterministic order and cut into
  *     fixed token-budget chunks; a document belongs to the chunk
  *     where its first token lands. Packing runs INSIDE bounded
  *     strata (e.g. language × contiguous doc_id band), so the window
  *     state per task is bounded and strata pack in parallel — the
  *     per-shard packing real pipelines use, not a global sort.
  *   - [[redactPii]]: email/phone redaction with per-document match
  *     counts — one map-side projection, zero shuffle.
  *   - [[weightedSample]]: per-domain deterministic rate sampling (the
  *     domain-mixing step): keep a document iff a multiplicative mix
  *     of its id falls under the domain's rate. Embarrassingly
  *     parallel — a scan-side filter, no shuffle, reproducible across
  *     runs and engines. (A production variant would swap the mixer
  *     for xxhash64 — same shape, no SQL twin; the c3 precedent.)
  */
object Corpus {

  /** Whitespace token count — the packing currency. Single-space
    * tokenization matches the fixture corpus and the DuckDB twin
    * (`len(string_split(text, ' '))`). */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** Assign each document to its packed chunk: within each stratum
    * (the partition keys), documents concatenate in `orderCol` order
    * and chunk `k` holds tokens `[k·budget, (k+1)·budget)`; a document
    * lands in the chunk containing its FIRST token. Adds
    * `n_tokens` and `chunk`. Long documents may overflow their chunk
    * (they are not split — the document-level packing contract);
    * `budget` should exceed the longest document. */
  def packSequences(docs: DataFrame, textCol: String, budget: Int,
      strata: Seq[String], orderCol: String,
      counter: Column => Column = tokenCount): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tokens", counter(col(textCol)))
      .withColumn("chunk",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budget))
  }

  /** Email + phone-number redaction: returns the frame with
    * `<textCol>_redacted`, `n_emails`, `n_phones`. Patterns are in the
    * RE2 ∩ Java-regex common subset, so the DuckDB oracle applies the
    * SAME expressions — the redacted text is bit-identical across
    * engines. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9-]{7,}[0-9]"

  /** T23 — context-window CHUNKING with overlap: split every document
    * into ≤ `maxTokens`-token windows advancing by
    * `maxTokens − overlap`, the preprocessing step every pretraining /
    * RAG pipeline runs between cleaning and tokenization (reference
    * scope: its pipelines stop at document granularity —
    * ascii-hydra pipes/queries.py — so this extends the surface the
    * way t8's sequence packing does, one level below the document).
    *
    * Deterministic and fully relational: window starts are a
    * `sequence` + `filter` (a trailing window that would be PURE
    * overlap of the previous one is dropped — `start + overlap <
    * n_tokens` — so chunk sets are a function of the token count
    * alone), the chunk is an array `slice`, and identity is
    * (doc_id, chunk_idx). One projection + one explode: no shuffle at
    * all until a consumer aggregates — at 100 TB this is a map-only
    * pass whatever the corpus size. `chunk_hash` (md5 of the joined
    * window) rides along so downstream exact-dedup of chunks needs no
    * re-join to the text. */
  def chunkDocuments(docs: DataFrame, textCol: String = "text",
      maxTokens: Int = 64, overlap: Int = 16): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got ($maxTokens, $overlap)")
    val stride = maxTokens - overlap
    val toks = split(col(textCol), " ")
    val starts = filter(
      sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(stride)),
      s => (s === 0) || (s + lit(overlap) < size(toks)))
    docs
      .select(col("doc_id"), toks.as("__toks"),
        posexplode(starts).as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx"),
        col("start"),
        slice(col("__toks"), col("start") + 1, lit(maxTokens)).as("__chunk"))
      .select(col("doc_id"), col("chunk_idx"), col("start"),
        size(col("__chunk")).as("n_tokens"),
        md5(array_join(col("__chunk"), " ")).as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")
  }

  def redactPii(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0))))
      .withColumn("n_phones",
        size(regexp_extract_all(
          regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
          lit(PhonePattern), lit(0))))
      .withColumn(s"${textCol}_redacted",
        regexp_replace(
          regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
          PhonePattern, "<PHONE>"))

  /** Deterministic per-domain rate sampling (domain mixing): keep a
    * row iff `mix(id) mod 1000 < rate·1000` for its domain's rate
    * (domains absent from `rates` keep everything). The mixer is a
    * fixed odd-multiplier congruential hash — reproducible, order-
    * free, and expressible in ANSI SQL, so the oracle replays it
    * exactly. One scan, no shuffle: each task filters its own rows. */
  val MixMultiplier = 2654435761L // Knuth's 2^32/φ, odd → mod-1000 mixing
  val MixSalt = 12345L

  def mixBucket(id: Column): Column =
    pmod(id * MixMultiplier + MixSalt, lit(1000L))

  /** Repetition quality signals (the Gopher-rule family): fraction of
    * duplicated words and duplicated word-bigrams per document — high
    * values mark boilerplate/spam for downstream filtering. Pure
    * higher-order array functions over the token list: one map-side
    * projection, zero shuffle, zero UDF; a DuckDB list-lambda replay
    * is bit-identical. Adds `dup_word_frac` / `dup_bigram_frac`
    * (0.0 for docs too short to have bigrams). */
  def repetitionSignals(df: DataFrame, textCol: String): DataFrame = {
    val words = split(col(textCol), " ")
    val n = size(words)
    val bigrams = zip_with(
      slice(words, lit(1), n - 1), slice(words, lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
    df.withColumn("dup_word_frac",
        round(lit(1.0) - size(array_distinct(words)).cast("double") /
          n.cast("double"), 6))
      .withColumn("dup_bigram_frac",
        when(n < 2, lit(0.0)).otherwise(
          round(lit(1.0) - size(array_distinct(bigrams)).cast("double") /
            (n - 1).cast("double"), 6)))
  }

  /** Deterministic train/val/test split assignment: each row's split
    * comes from [[mixBucket]] of its id against cumulative per-mille
    * thresholds — order-free, shuffle-free, reproducible across runs,
    * engines, and table growth (a row's split never changes when new
    * rows arrive — the property a rolling-ingest corpus needs; a
    * random() split reassigns everything every run). Adds `split`. */
  def splitAssign(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)] =
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val b = mixBucket(col(idCol))
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.round(c * 1000))
    val expr = splits.init.zip(cum.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), hi), acc) =>
      when(b < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Composite document quality gate (the Gopher-rule battery,
    * Rae et al. 2021 §A1.1 — public): token-count window, mean word
    * length window, symbol ratio, duplicated-word fraction. First
    * failing rule names the `reason` (null = keep) so corpus triage
    * can histogram WHY documents die, not just how many — the shape
    * every production cleaning pipeline reports. One map-side
    * projection over codegen'd built-ins, zero shuffle; every signal
    * is integer/double arithmetic a DuckDB twin replays exactly. */
  def qualityGate(df: DataFrame, textCol: String,
      minTokens: Int = 5, maxTokens: Int = 10000,
      minWordLen: Double = 2.0, maxWordLen: Double = 12.0,
      maxSymbolRatio: Double = 0.25, maxDupWordFrac: Double = 0.5): DataFrame = {
    val text = col(textCol)
    val words = split(text, " ")
    val n = size(words)
    val meanLen = (length(text) - (n - lit(1))).cast("double") / n
    val symRatio = (length(text) -
      length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))).cast("double") /
      length(text)
    val dupFrac = round(lit(1.0) -
      size(array_distinct(words)).cast("double") / n.cast("double"), 6)
    val reason = when(length(text) === 0, "empty")
      .when(n < minTokens, "too_short")
      .when(n > maxTokens, "too_long")
      .when(meanLen < minWordLen || meanLen > maxWordLen, "word_len")
      .when(symRatio > maxSymbolRatio, "symbol_ratio")
      .when(dupFrac > maxDupWordFrac, "repetition")
    df.withColumn("reason", reason)
      .withColumn("keep", reason.isNull)
  }

  def weightedSample(df: DataFrame, idCol: String, domainCol: String,
      rates: Map[String, Double]): DataFrame = {
    val keep = rates.foldLeft(lit(1000L): Column) {
      case (acc, (domain, rate)) =>
        when(col(domainCol) === domain, lit((rate * 1000).toLong))
          .otherwise(acc)
    }
    df.where(mixBucket(col(idCol)) < keep)
  }
}
