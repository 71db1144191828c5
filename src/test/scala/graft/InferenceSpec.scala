package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{GraftFunctions, LinearModel}
import graft.ops.Inference

/** t17 — the inference-model column operator: a broadcast-weights
  * linear head scored by a codegen'd fused multiply-accumulate. */
class InferenceSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)
    .select("vec_id", "embedding")

  test("kernel logits match an independent HOF recomputation bit-for-bit") {
    val model = LinearModel.hashHead(3, 64)
    // independent spelling: zip_with + aggregate reproduce the same
    // sequential double accumulation the kernel runs
    def hofLogit(c: Int) = {
      val w = array(model.weights(c).map(lit): _*)
      aggregate(
        zip_with(col("embedding"), w, (x, wi) => x.cast("double") * wi),
        lit(0.0), (acc, t) => acc + t) + lit(model.bias(c))
    }
    val both = emb.limit(200).select(
      GraftFunctions.modelLogits(col("embedding"), model).as("k"),
      array((0 until 3).map(hofLogit): _*).as("h"))
    assert(both.where(col("k") =!= col("h")).count() == 0,
      "codegen kernel and HOF spelling must agree exactly")
  }

  test("classifyEmbeddings: per-class logit columns + first-max-wins argmax") {
    val model = LinearModel.hashHead(3, 64)
    val out = Inference.classifyEmbeddings(emb, model)
    assert(out.columns.toSeq ==
      Seq("vec_id", "logit_0", "logit_1", "logit_2", "pred"))
    assert(out.count() == emb.count())
    // pred agrees with the argmax of the (rounded) logit columns up
    // to rounding ties: recompute from full precision instead
    val full = emb.select(col("vec_id"),
      GraftFunctions.modelLogits(col("embedding"), model).as("l"),
      GraftFunctions.modelPredict(col("embedding"), model).as("p"))
    val bad = full.where(
      element_at(col("l"), col("p") + 1) < array_max(col("l"))).count()
    assert(bad == 0, s"$bad rows where pred is not a maximum")
    // every class appears (the hash head is not degenerate on fixtures)
    assert(out.select("pred").distinct().count() == 3)
  }

  test("load(): an exported JSON head scores bit-identically to its arrays") {
    val trained = LinearModel.hashHead(4, 64) // stand-in for a real export
    // export the way a training job would: one json.dump of weights+bias
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.createObjectNode()
    val wArr = node.putArray("weights")
    trained.weights.foreach { row =>
      val r = wArr.addArray(); row.foreach(r.add)
    }
    val bArr = node.putArray("bias")
    trained.bias.foreach(bArr.add)
    val dir = java.nio.file.Files.createTempDirectory("graft-head").toString
    val path = s"$dir/head.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      om.writeValueAsBytes(node))

    val loaded = LinearModel.load(path, spark.sparkContext.hadoopConfiguration)
    assert(loaded.nClasses == 4 && loaded.dim == 64)
    assert(loaded.weights.zip(trained.weights).forall {
      case (a, b) => java.util.Arrays.equals(a, b) },
      "JSON round-trip must preserve weights bit-for-bit")
    assert(java.util.Arrays.equals(loaded.bias, trained.bias))
    // kernel on the LOADED head == kernel on the in-memory head, exactly
    val both = emb.limit(100).select(
      GraftFunctions.modelLogits(col("embedding"), loaded).as("l"),
      GraftFunctions.modelLogits(col("embedding"), trained).as("t"))
    assert(both.where(col("l") =!= col("t")).count() == 0)
  }

  test("load(): malformed exports refuse loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-head").toString
    def write(name: String, json: String): String = {
      val p = s"$dir/$name"
      java.nio.file.Files.write(java.nio.file.Paths.get(p), json.getBytes)
      p
    }
    val conf = spark.sparkContext.hadoopConfiguration
    intercept[IllegalArgumentException] {
      LinearModel.load(write("nw.json", """{"bias": [0.1]}"""), conf)
    }
    intercept[IllegalArgumentException] { // bias length mismatch
      LinearModel.load(
        write("bl.json", """{"weights": [[1.0, 2.0]], "bias": [0.1, 0.2]}"""),
        conf)
    }
    intercept[IllegalArgumentException] { // ragged weight rows
      LinearModel.load(
        write("rg.json",
          """{"weights": [[1.0, 2.0], [3.0]], "bias": [0.1, 0.2]}"""), conf)
    }
  }

  test("a mistyped embedding column fails ANALYSIS, not silently misreads") {
    val model = LinearModel.hashHead(3, 64)
    val doubles = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      doubles.select(
        GraftFunctions.modelLogits(col("embedding"), model)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<float>"),
      s"error must name the required type: ${e.getMessage}")
    intercept[org.apache.spark.sql.AnalysisException] {
      doubles.select(
        GraftFunctions.modelPredict(col("embedding"), model)).collect()
    }
  }

  test("the model rides the PLAN: one scan, zero shuffle, codegen'd") {
    val model = LinearModel.hashHead(5, 64)
    // scoring itself (no display sort): pure map over the scan
    val proj = emb.select(col("vec_id"),
      GraftFunctions.modelLogits(col("embedding"), model).as("l"),
      GraftFunctions.modelPredict(col("embedding"), model).as("p"))
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"inference must be map-side, zero shuffle:\n$plan")
    // the `*(n)` prefix is the whole-stage-codegen marker in
    // simpleString form
    assert(plan.contains("*(1)"), s"scoring must codegen:\n$plan")
    // the full operator adds only the presentation sort
    val full = Inference.classifyEmbeddings(emb, model)
      .queryExecution.executedPlan.toString
    assert(!full.replace("rangepartitioning", "").contains("partitioning("),
      s"only the orderBy exchange is allowed:\n$full")
  }
}
