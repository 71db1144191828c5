package graft.steps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BpeModel
import graft.ops.{Bpe, Corpus, Dedup, TextOps}

/** P2 — the end-to-end PRETRAINING corpus pipeline, composed from the
  * round-7 operator family (the production chain between a cleaned
  * document table and tokenizer-ready shards):
  *
  *   1. substring-level exact dedup ([[Dedup.dedupSpans]]): duplicated
  *      20-token runs removed corpus-wide, fully-emptied docs dropped;
  *   2. LM-perplexity filter ([[TextOps.lmPerplexity]], CCNet):
  *      bigram LM on the doc_id%7 reference slice of the CLEANED
  *      corpus; docs above the NLL ceiling (junk) drop, docs too
  *      short to score drop with them;
  *   3. deterministic split assignment ([[Corpus.splitAssign]]):
  *      hash-bucketed train/val/test, stable under corpus growth;
  *   4. sequence packing ([[Corpus.packSequences]]) with REAL BPE
  *      token budgets ([[Bpe.tokenCount]]) per bounded
  *      (split × lang × doc-band) stratum.
  *
  * Every stage is individually gated (c17/t15/t12/t8); this step
  * gates the COMPOSITION — one dataflow, each stage feeding the next
  * without materialization, the multi-hop shape the reference chains
  * assets for. Scale posture inherits from the stages: span-dedup
  * shuffle ∝ duplicated mass, the LM broadcasts, split/pack are
  * scan-side + bounded windows. */
object PretrainCorpus {
  def run(docs: DataFrame, model: BpeModel, budget: Int = 2048,
      nllMax: Double = 3.8): DataFrame = {
    val cleaned = Dedup.dedupSpans(docs.select(col("doc_id"), col("text")), 20)
      .where(col("tokens_after") > 0)
      .select("doc_id", "text")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val scored = TextOps.lmPerplexity(cleaned,
      cleaned.where(col("doc_id") % 7 === 0))
    val kept = cleaned.join(
      scored.where(col("avg_nll") <= nllMax).select("doc_id"), "doc_id")
    val split = Corpus.splitAssign(kept, "doc_id")
      .withColumn("band", floor(col("doc_id") / 1000))
    val packed = Corpus.packSequences(split, "text", budget,
      strata = Seq("split", "lang", "band"), orderCol = "doc_id",
      counter = t => Bpe.tokenCount(t, model).cast("long"))
    packed.groupBy("split", "lang", "band", "chunk")
      .agg(count(lit(1)).as("dc"), sum(col("n_tokens")).as("ct"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("dc")).as("n_docs"),
        sum(col("ct")).as("n_tokens"))
      .orderBy("split", "lang")
  }
}
