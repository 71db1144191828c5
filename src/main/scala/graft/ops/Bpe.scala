package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{BpeModel, GraftFunctions}

/** Corpus-trained deterministic BPE (t14): the subword-tokenization
  * step between cleaned text and token budgets. The DISTRIBUTED half
  * is the word-frequency count (one shuffle over the corpus — the
  * only part that sees all the data); the greedy merge loop runs on
  * the driver over the bounded vocabulary table, which is the
  * standard split at any corpus size (tokenizer training is
  * vocabulary-sized, not corpus-sized). The model persists as a
  * (rank, left, right) parquet table so the DuckDB oracle can replay
  * encoding exactly — one `replace()` per rank over delimited-symbol
  * strings (see [[graft.functions.BpeModel]]). */
object Bpe {

  /** Train on the corpus's word-frequency table: top `maxWords` words
    * by (freq desc, word asc) — a deterministic, model-sized driver
    * collect (the c10 probe-id discipline). */
  def train(docs: DataFrame, textCol: String = "text",
      nMerges: Int = 200, maxWords: Int = 5000): BpeModel = {
    val wf = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    BpeModel.train(wf, nMerges)
  }

  /** Persist merges as (rank, left, right) — the oracle seam. */
  def save(spark: SparkSession, model: BpeModel, dir: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }.toSeq
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  def load(spark: SparkSession, dir: String): BpeModel =
    new BpeModel(spark.read.parquet(dir)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))))

  /** BPE token count of a text column — the packing currency when
    * budgets are counted in subword tokens, not words. */
  def tokenCount(text: Column, model: BpeModel): Column =
    GraftFunctions.bpeCountTokens(split(text, " "), model)

  /** Per-word subword pieces. */
  def encodeWord(word: Column, model: BpeModel): Column =
    GraftFunctions.bpeEncodeWord(word, model)
}
