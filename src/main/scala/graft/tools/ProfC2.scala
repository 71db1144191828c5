package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.core.{Sessions, Tables}
import graft.ops.Dedup

/** Dev-only stage profiler for minHashLshPairs at a given SF. */
object ProfC2 {
  def t[A](l: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    val docs = Tables.documents(spark, d)
    val withSh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
    t("shingle stats") {
      withSh.agg(count(lit(1)), sum(size(col("sh"))), max(size(col("sh")))).show()
    }
    def mh(i: Int): Column = array_min(transform(col("sh"), s => xxhash64(lit(i), s)))
    val bandCols = (0 until 32).map { b =>
      xxhash64((b * 4 until (b + 1) * 4).map(mh): _*)
    }
    val banded = withSh.select(col("doc_id"),
      posexplode(array(bandCols: _*)).as(Seq("band", "band_hash")))
    t("banded count")(println(banded.count()))
    val cand = banded.as("x").join(banded.as("y"),
      col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash")
        && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    t("cand count")(println(cand.count()))
    t("hot buckets") {
      banded.groupBy("band", "band_hash").count().orderBy(desc("count")).show(5)
    }
    t("full")(println(Dedup.minHashLshPairs(docs).count()))
    spark.stop()
  }
}
