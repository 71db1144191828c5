package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sessions

/** Materialize an N×-scaled fixture (default 10× of sf0.1 ≈ sf1) by
  * DETERMINISTIC mass replication with consistent foreign-key shifts —
  * the sf-point the per-round bench can't see: O(n²) cliffs, driver
  * constants, and shuffle growth all surface at 10× while zone-map/
  * layout properties stay realistic (replica keys are disjoint
  * ranges, joins stay linear). Dimension tables (region/nation)
  * carry unreplicated, like a real scale-up.
  *
  * Usage: tools/run.sh graft.tools.MakeScaled [SRC_SF_DIR] [DST_DIR] [N]
  * then:  SPARK_GRAFT_SF_DIR=DST_DIR tools/run.sh graft.Bench
  *
  * A 4th arg `linear` switches to the OUTPUT-LINEAR near-dup fixture
  * (documents + embeddings only): verbatim replication makes every
  * cross-replica pair a true near-dup, so the c4/c18 OUTPUT grows
  * quadratically and any probe of those operators conflates operator
  * scaling with output scaling. Linear mode passes each replica
  * through a similarity-breaking bijection — token-suffixing for
  * text (n-gram sets map 1:1, so intra-replica Jaccard is EXACTLY
  * preserved), a per-replica deterministic sign-flip pattern for
  * embeddings (an isometry: intra-replica cosines exactly preserved;
  * cross-replica cosine ≈ Σ±x²/‖x‖² ≈ 0, far below any near-dup
  * threshold) — so true pair count grows exactly n×: the operator's
  * own scaling is what the probe then measures. */
object MakeScaled {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.drop(1).headOption.getOrElse("/tmp/graft_sf1")
    val n = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val linear = args.drop(3).headOption.contains("linear")
    val spark = Sessions.local()
    if (linear) scaleLinear(spark, src, dst, n)
    else scale(spark, src, dst, n)
    println(s"[make-scaled] wrote ${n}x${if (linear) " (output-linear)"
      else ""} of $src to $dst")
    spark.stop()
  }

  /** The output-linear near-dup fixture: documents/embeddings
    * replicated through per-replica similarity-breaking bijections
    * (see object doc), dims carried. */
  def scaleLinear(spark: SparkSession, src: String, dst: String,
      n: Int): Unit = {
    Seq("region", "nation").foreach { t =>
      val p = s"$src/$t.parquet"
      if (new java.io.File(p).exists())
        spark.read.parquet(p).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    val docs = spark.read.parquet(s"$src/documents.parquet")
    (1 until n).foldLeft(docs) { (acc, i) =>
      // suffix every token: shingle sets map bijectively (intra-replica
      // Jaccard unchanged), cross-replica overlap = 0
      acc.unionAll(docs
        .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        .withColumn("text", array_join(
          transform(split(col("text"), " "), t => concat(t, lit(s"_r$i"))),
          " ")))
    }.write.mode("overwrite").parquet(s"$dst/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    (1 until n).foldLeft(emb) { (acc, i) =>
      // deterministic per-replica sign-flip: an orthogonal transform —
      // intra-replica geometry is preserved EXACTLY, cross-replica
      // cosines collapse to ~0
      acc.unionAll(emb
        .withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
        .withColumn("embedding", transform(col("embedding"),
          (x, j) => when(pmod(xxhash64(lit(i), j), lit(2)) === 1,
            -x).otherwise(x).cast("float"))))
    }.write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
  }

  /** Key shifts per replica i — disjoint ranges, FK-consistent:
    * lineitem.l_orderkey shifts with orders.o_orderkey, o_custkey
    * with c_custkey, l_partkey/l_suppkey with part/supplier. */
  private val shifts: Map[String, Long] = Map(
    "o_orderkey" -> 1000000000L, "l_orderkey" -> 1000000000L,
    "c_custkey" -> 100000000L, "o_custkey" -> 100000000L,
    "s_suppkey" -> 10000000L, "l_suppkey" -> 10000000L,
    "p_partkey" -> 10000000L, "l_partkey" -> 10000000L,
    "ps_partkey" -> 10000000L, "ps_suppkey" -> 10000000L,
    "event_id" -> 1000000000L, "user_id" -> 1000000L,
    "doc_id" -> 10000000L, "vec_id" -> 10000000L)

  def scale(spark: SparkSession, src: String, dst: String, n: Int): Unit = {
    val replicated = Seq("customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
    val carried = Seq("region", "nation")
    def replicate(df: DataFrame): DataFrame = {
      val keyed = df.columns.filter(shifts.contains)
      (1 until n).foldLeft(df) { (acc, i) =>
        acc.unionAll(keyed.foldLeft(df)((d, c) =>
          d.withColumn(c, col(c) + lit(i * shifts(c)))))
      }
    }
    carried.foreach { t =>
      val p = s"$src/$t.parquet"
      if (new java.io.File(p).exists())
        spark.read.parquet(p).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    replicated.foreach { t =>
      val p = s"$src/$t.parquet"
      if (new java.io.File(p).exists())
        replicate(spark.read.parquet(p))
          .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
  }
}
