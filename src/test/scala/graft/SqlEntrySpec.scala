package graft

import graft.core.{ExecutionMode, Sampling, Tables}

/** The SQL-string entry point: temp-view catalog + the custom
  * kernels registered as SQL functions via SparkSessionExtensions. */
class SqlEntrySpec extends SparkSpec {

  test("registerAll exposes every fixture table to spark.sql") {
    Tables.registerAll(spark, sf)
    val n = spark.sql(
      """SELECT count(*) FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey""".stripMargin)
      .collect()(0).getLong(0)
    assert(n > 0)
    assert(spark.sql("SELECT max(ts) FROM events").collect()(0)
      .get(0) != null) // nanos→timestamp conversion applied in the view
  }

  test("custom kernels callable from SQL (SparkSessionExtensions)") {
    Tables.registerAll(spark, sf)
    val row = spark.sql(
      """SELECT graft_cosine(a.embedding, b.embedding) AS c,
        |       graft_dot(a.embedding, a.embedding) AS d,
        |       graft_simhash(split('the quick fox', ' ')) AS s
        |FROM embeddings a JOIN embeddings b
        |  ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin).collect()(0)
    assert(math.abs(row.getAs[Double]("c")) <= 1.0)
    assert(row.getAs[Double]("d") > 0.0)
    // deterministic fingerprint
    val s2 = spark.sql("SELECT graft_simhash(split('the quick fox', ' ')) AS s")
      .collect()(0).getLong(0)
    assert(row.getAs[Long]("s") == s2)
    // vector kernels: l2norm² == self-dot, sum matches aggregate
    val v = spark.sql(
      """SELECT graft_vec_l2norm(embedding) AS n,
        |       graft_dot(embedding, embedding) AS d,
        |       graft_vec_sum(embedding) AS su,
        |       aggregate(embedding, 0.0D, (a, x) -> a + x) AS su2
        |FROM embeddings WHERE vec_id = 0""".stripMargin).collect()(0)
    assert(math.abs(v.getAs[Double]("n") * v.getAs[Double]("n") -
      v.getAs[Double]("d")) < 1e-9)
    assert(math.abs(v.getAs[Double]("su") - v.getAs[Double]("su2")) < 1e-6)
  }

  test("mode-based sampling: dev modes sample, Full passes through") {
    val docs = Tables.documents(spark, sf)
    assert(Sampling.forMode(docs, ExecutionMode.Full).count() == docs.count())
    val sampled = Sampling.forMode(docs, ExecutionMode.SmallDevSampleLocal)
    assert(sampled.count() < docs.count())
    // seeded → deterministic
    assert(Sampling.forMode(docs, ExecutionMode.SmallDevSampleLocal).count()
      == sampled.count())
  }
}
