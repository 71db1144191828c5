package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, LinearModel}

/** Model-inference column operators (t17) — the role spark-nlp plays
  * on the reference's clusters (reference resources/spark.py:67,
  * resources/emr.py:78): score every row of a corpus with a trained
  * model, as one more column in the dataflow.
  *
  * Architecture, not weights, is the point: the model head is a
  * broadcast-weights object riding the PLAN (`ctx.addReferenceObj`,
  * the [[graft.functions.CentroidIndex]] discipline), the scoring is
  * a codegen'd fused multiply-accumulate per row — map-side only,
  * zero shuffle, one corpus pass however many classes. At 100 TB the
  * cost is exactly the scan plus `nClasses × dim` FLOPs per row;
  * nothing about the operator is corpus-size-dependent. A real
  * trained head (exported ONNX/linear weights) constructs the same
  * [[LinearModel]]; the deterministic hash head exists so the gate
  * has a bit-reproducible oracle (the t1 langid precedent).
  */
object Inference {

  /** Score `emb`'s embedding column with a linear classifier head:
    * per-class logits + argmax label, one pass. Logits surface
    * rounded to 6dp (display stability); the label argmaxes the FULL-
    * precision logits. */
  def classifyEmbeddings(emb: DataFrame, model: LinearModel): DataFrame = {
    val logits = GraftFunctions.modelLogits(col("embedding"), model)
    emb.select(
      col("vec_id") +:
        (0 until model.nClasses).map(c =>
          round(element_at(logits, c + 1), 6).as(s"logit_$c")) :+
        GraftFunctions.modelPredict(col("embedding"), model).as("pred"): _*)
      .orderBy("vec_id")
  }
}
