package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Similarity
import graft.functions.{GraftFunctions, PqCodebook, VectorKernels}
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Product-quantization ANN (c13): codebook training, the encode /
  * lut / adc kernel contracts, the compression claim, and the recall
  * the driver gate bounds. */
class PqSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf)
  private lazy val unit = Similarity.unitVectors(emb)
  private lazy val cb = Similarity.pqTrainCodebook(unit, m = 16)

  test("codebook shape: m subspaces x ksub centroids x dsub dims") {
    assert(cb.m == 16 && cb.ksub == 16 && cb.dsub == 4)
    assert(cb.flat.length == 16 * 16 * 4)
    assert(cb.counts.forall(_ == 16))
  }

  test("encode: m codes per vector, all within [0, ksub)") {
    val codes = Similarity.pqEncode(unit, cb)
      .select(col("codes"), size(col("codes")).as("m")).collect()
    assert(codes.nonEmpty)
    assert(codes.forall(_.getInt(1) == 16))
    assert(codes.forall(_.getSeq[Int](0).forall(c => c >= 0 && c < 16)))
    // compression: 16 1-byte codes stand in for 64 * 4 float bytes
    assert(16.0 / (64 * 4) <= 1.0 / 16)
  }

  test("encode is the L2-argmin over each subspace (driver replay)") {
    val rows = unit.orderBy("vec_id").limit(5)
      .select(col("embedding"),
        GraftFunctions.pqEncode(col("embedding"), cb).as("codes"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0).toArray
      val codes = r.getSeq[Int](1)
      for (sub <- 0 until cb.m) {
        val d2 = (0 until cb.ksub).map { c =>
          (0 until cb.dsub).map { i =>
            val x = v(sub * cb.dsub + i).toDouble -
              cb.flat((sub * cb.ksub + c) * cb.dsub + i).toDouble
            x * x
          }.sum
        }
        assert(d2(codes(sub)) == d2.min, s"sub $sub: not the argmin")
      }
    }
  }

  test("adcDot == lut-sum replay; approximates the true unit dot") {
    val rows = unit.where(col("vec_id") % 50 === 0)
      .select(col("vec_id"), col("embedding"),
        GraftFunctions.pqEncode(col("embedding"), cb).as("codes"),
        GraftFunctions.pqLut(col("embedding"), cb).as("lut"))
      .collect()
    assert(rows.length >= 2)
    // self-ADC of vector v (its own lut x its own codes) estimates
    // dot(v, v) = 1 for unit vectors: quantization error must be
    // bounded well away from random (< 0.5 absolute)
    rows.foreach { r =>
      val codes = r.getSeq[Int](2)
      val lut = r.getSeq[Double](3)
      val adc = VectorKernels.adcDot(
        new GenericArrayData(codes.toArray),
        new GenericArrayData(lut.toArray), cb.ksub)
      val replay = codes.zipWithIndex
        .map { case (c, sub) => lut(sub * cb.ksub + c) }.sum
      assert(math.abs(adc - replay) < 1e-12)
      assert(math.abs(adc - 1.0) < 0.5, s"self-ADC $adc far from 1.0")
    }
  }

  test("recall vs exact top-k clears the gate bound with margin") {
    val exact = Similarity.annTopK(emb)
    val approx = Similarity.annTopKPq(emb, codebookOverride = Some(cb))
    val r = exact.select("query_id", "neighbor_id")
      .join(approx.select(col("query_id"), col("neighbor_id"),
        lit(1).as("hit")), Seq("query_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("total"),
        sum(coalesce(col("hit"), lit(0))).as("hits")).head()
    val recall = r.getLong(1).toDouble / r.getLong(0)
    assert(recall >= 0.7, s"recall $recall below spec floor 0.7")
  }

  test("re-ranked scores are bit-identical to the exact path's") {
    // every (query, neighbor) the PQ path emits that the exact top-k
    // also contains must carry the SAME rounded cosine — the refine
    // step scores with the exact expression
    val exact = Similarity.annTopK(emb)
      .select(col("query_id"), col("neighbor_id"),
        col("cosine").as("exact_cos"))
    val approx = Similarity.annTopKPq(emb, codebookOverride = Some(cb))
    val joined = approx.join(exact, Seq("query_id", "neighbor_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Double]("cosine") == r.getAs[Double]("exact_cos"))
    }
  }

  test("training is deterministic for a fixed input") {
    val cb2 = Similarity.pqTrainCodebook(unit, m = 16)
    // seeding is strided and Lloyd means are averaged per cell; the
    // cell sets are identical, so coordinates agree to FP noise
    assert(cb2.flat.length == cb.flat.length)
    cb.flat.zip(cb2.flat).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-4f)
    }
  }

  test("persisted IVF-PQ: probes prune partitions, recall clears the bound") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    val centroids = emb.where(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    val (idx, cb2) = Similarity.buildIvfPqIndex(emb, centroids, dir, m = 16)
    // index layout: one partition dir per inverted list, codes only
    val listDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("centroid_id="))
    assert(listDirs.nonEmpty)
    val queries = emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val approx = Similarity.annTopKIvfPqFromIndex(spark, dir, queries,
      idx, cb2, emb, nProbe = 6)
    // partition pruning reaches the code scan: the probed-id filter
    // must appear as PartitionFilters in the executed plan
    val plan = approx.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("centroid_id"), "probe scan must partition-prune")
    val exact = Similarity.annTopK(emb)
    val r = exact.select("query_id", "neighbor_id")
      .join(approx.select(col("query_id"), col("neighbor_id"),
        lit(1).as("hit")), Seq("query_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("total"),
        sum(coalesce(col("hit"), lit(0))).as("hits")).head()
    val recall = r.getLong(1).toDouble / r.getLong(0)
    assert(recall >= 0.6, s"ivfpq recall $recall below spec floor 0.6")
  }

  test("codebook JSON save/load roundtrips exactly") {
    val f = java.nio.file.Files.createTempDirectory("pqcb").toString + "/cb.json"
    Similarity.savePqCodebook(spark, cb, f)
    val back = Similarity.loadPqCodebook(spark, f)
    assert(back.m == cb.m && back.ksub == cb.ksub && back.dsub == cb.dsub)
    assert(back.counts.toSeq == cb.counts.toSeq)
    assert(back.flat.toSeq == cb.flat.toSeq)
  }
}
