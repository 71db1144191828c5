package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operator family — the LLM-training-data extension
  * surface (BASELINE.json north_star; motivated by the reference's
  * Common Crawl workload, ascii-hydra
  * `papers/multi_platform_orchestration/paper.md:141-144` "seed nodes
  * free of common problems" cleanup).
  *
  * All operators are declarative DataFrame programs built from
  * codegen'd built-ins and higher-order functions (`transform` /
  * `aggregate` / `array_*`) — zero UDFs, so whole-stage codegen spans
  * the hot path.
  *
  * Scale posture (100 TB): every candidate-generation step shuffles on
  * a *content-derived key* (hash / band / shingle), never on doc_id —
  * so the work distributes by data, and AQE handles skewed buckets.
  * The one known hazard is ultra-hot shingles/bands (stop-word-like
  * shingles shared by millions of docs); [[shingles]] callers can cap
  * candidate fan-out with `maxDocFreq` (drop shingles present in more
  * than that many docs — standard df-filtering, loses only pairs whose
  * *every* shared shingle is that common).
  */
object Dedup {

  /** Distinct word n-gram shingles as `array<string>`.
    * Docs shorter than n words get an empty array. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    val m = size(toks) - (n - 1) // shingle count
    when(m <= 0, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), m - lit(1)),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
  }

  /** C1 — exact dedup via content hash: group on sha2(text) so the
    * shuffle key is a fixed-width 256-bit digest, not the full text
    * (at 100 TB the shuffle moves 32-byte keys + partial counts, and
    * map-side partial aggregation collapses intra-partition dups
    * before the exchange). Emits one row per distinct content with
    * the surviving doc_id (min) and the multiplicity. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .select("keep_doc_id", "n_copies")
      .orderBy("keep_doc_id")

  /** C4 — exact n-gram Jaccard near-dup pairs.
    *
    * Candidate generation is an inverted-index self-join: explode
    * distinct shingles, join docs sharing at least one shingle (pairs
    * with zero shared shingles have Jaccard 0 and can never pass the
    * threshold, so recall is exactly 1). Then Jaccard =
    * |∩| / (|A|+|B|−|∩|) from the per-pair co-occurrence count and
    * per-doc shingle counts — no second pass over text.
    *
    * Scale: the shuffle key is the shingle; `maxDocFreq` (df cap)
    * bounds the quadratic fan-out of hot shingles. */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
      maxDocFreq: Option[Int] = None): DataFrame = {
    val sh0 = docs
      .select(col("doc_id"), explode(shingles(col("text"), n)).as("s"))
    val sh = maxDocFreq match {
      case Some(cap) =>
        val hot = sh0.groupBy("s").agg(count(lit(1)).as("df"))
          .where(col("df") > cap).select("s")
        sh0.join(hot, Seq("s"), "left_anti")
      case None => sh0
    }
    val sizes = sh0.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val co = sh.as("a")
      .join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    co
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
      .withColumn("jaccard",
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** C2 — MinHash + LSH near-dup pairs (the subquadratic scale path
    * for C4's semantics).
    *
    * shingle → 128 min-hashes (xxhash64 seeded by position — a
    * `transform` over the signature index, `array_min` over shingle
    * hashes; all codegen'd, no explode of the shingle×perm cross
    * product) → 32 bands × 4 rows → bucket-join on (band, bandHash)
    * → candidate pairs → *exact* Jaccard verification on the shingle
    * arrays (so precision is exact; only recall is probabilistic:
    * P(miss) = (1−J⁴)³² ≈ 5e-8 at J = 0.8, ~0 at the fixture's
    * planted J ≈ 0.99).
    *
    * Scale: signatures are 128 longs/doc regardless of doc size; the
    * only shuffles are the band bucket-join (key = band hash) and the
    * verification joins (key = doc_id). Hot buckets (identical
    * boilerplate docs) are exactly the dup clusters we're hunting —
    * AQE skew-join handles them. */
  def minHashLshPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
      numHashes: Int = 128, bands: Int = 32): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSh = docs
      .select(col("doc_id"), shingles(col("text"), n).as("sh"))
      .where(size(col("sh")) > 0)
    // Band hashes built so every minhash subexpression is referenced
    // exactly once, in ONE projection. (The tempting two-step — a
    // `sig` array column sliced per band — gets CollapseProject'd:
    // the signature is statically referenced once inside the banding
    // lambda, Catalyst inlines it, and the runtime then recomputes
    // all 128 minhashes per band = 32×. Measured 134 s vs ~1 s on the
    // sf0.01 fixture.)
    def mh(i: Int): Column =
      array_min(transform(col("sh"), s => xxhash64(lit(i), s)))
    val bandCols = (0 until bands).map { b =>
      xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand).map(mh): _*)
    }
    val banded = withSh.select(
      col("doc_id"),
      posexplode(array(bandCols: _*)).as(Seq("band", "band_hash")))
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(withSh.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(withSh.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb"))), 6))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash of the token stream (frequency-weighted bit
    * votes), as a column. Classic Charikar fingerprint: bit j of the
    * output is 1 iff the sum over tokens of ±1 (sign = bit j of the
    * token's xxhash64) is positive. Expressed as nested higher-order
    * functions — one pass over tokens per document. */
  /** Per-bit vote counts (array of 64 ints) — one pass over tokens. */
  private def simHashVotes(text: Column): Column =
    aggregate(
      split(text, " "),
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h = xxhash64(t)
        // getbit via call_function: the DSL's shiftright only takes a
        // literal shift, but here the bit position is the lambda index.
        transform(acc, (v, j) =>
          v + when(call_function("getbit", h, j) === 1, 1).otherwise(-1))
      })

  /** Pack positive votes into a 64-bit fingerprint (j is a Scala
    * literal, so the shifts are constants). Keep `votes` a
    * materialized column so the token pass isn't repeated 64×. */
  private def votesToLong(votes: Column): Column =
    (0 until 64)
      .map(j => when(element_at(votes, j + 1) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))

  def simHash(text: Column): Column = votesToLong(simHashVotes(text))

  /** C3 — SimHash near-dup pairs at Hamming distance ≤ maxHamming.
    *
    * Candidate generation by the pigeonhole principle: split the
    * 64-bit fingerprint into (maxHamming+1) chunks — any pair within
    * maxHamming must agree on at least one chunk, so bucket-joining on
    * (chunkIdx, chunkValue) has recall exactly 1. Verification is
    * exact Hamming via bit_count(xor). Deterministic end-to-end.
    *
    * Scale: one 8-byte fingerprint per doc; shuffle key = 16-bit
    * chunk value + index. (Not DuckDB-expressible — xxhash64 — so the
    * correctness gate records rows-only; ScalaTest covers semantics.) */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPerChunk = 64 / chunks
    val fp = docs
      .select(col("doc_id"), simHashVotes(col("text")).as("votes"))
      .select(col("doc_id"), votesToLong(col("votes")).as("fp"))
    val banded = fp.select(
      col("doc_id"), col("fp"),
      posexplode(transform(sequence(lit(0), lit(chunks - 1)),
        c => call_function("shiftright", col("fp"), c * lit(bitsPerChunk))
          .bitwiseAND(lit((1L << bitsPerChunk) - 1))))
        .as(Seq("chunk", "chunk_val")))
    banded.as("x")
      .join(banded.as("y"),
        col("x.chunk") === col("y.chunk") &&
          col("x.chunk_val") === col("y.chunk_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.fp").bitwiseXOR(col("y.fp"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }
}
