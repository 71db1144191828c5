package graft

import graft.ops.Relational
import graft.core.Tables

/** Operator sanity + physical-plan assertions at sf0.001. Value-level
  * correctness is the driver's DuckDB gate (t2); here we pin the
  * *plans* — broadcast where intended, pushdown reaching the scan —
  * because those are the properties that decide 100 TB behavior. */
class OperatorSpec extends SparkSpec {

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("every declared query returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
    }
  }

  test("anti join semantics on constructed data (non-vacuous)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // q09's fixture gate used to pass on an empty anti set; pin the
    // semantics here with planted matched/unmatched/null keys
    val cust = Seq((1L, "kept-no-orders"), (2L, "dropped-has-big"),
      (3L, "kept-only-small"), (4L, "kept-null-side")).toDF("k", "tag")
    val ords = Seq((2L, 400000.0), (3L, 100.0), (999L, 500000.0))
      .toDF("ok", "price")
    val anti = cust.join(ords.where(col("price") > 300000),
      col("k") === col("ok"), "left_anti")
    assert(anti.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L))
    // and the gated query itself is non-empty on the fixture
    assert(Relational.q09AntiJoin(spark, sf).count() > 0)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q01 projection prunes columns at the scan") {
    val plan = physicalPlan(Relational.q01ScanProject(spark, sf))
    assert(plan.contains("ReadSchema"))
    // only the three projected columns reach the reader
    val read = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("l_orderkey") && read.contains("l_quantity"))
    assert(!read.contains("l_extendedprice"))
  }

  test("q02 predicates are pushed to parquet") {
    val plan = physicalPlan(Relational.q02Filter(spark, sf))
    assert(plan.contains("PushedFilters: ["))
    assert(plan.contains("LessThan(l_shipdate") || plan.contains("l_shipdate)"))
  }

  test("q06/q07 use broadcast joins for dimensions") {
    assert(physicalPlan(Relational.q06BroadcastJoin(spark, sf))
      .contains("BroadcastHashJoin"))
    val star = physicalPlan(Relational.q07StarJoin(spark, sf))
    // customer/nation/region all broadcast; no shuffle of lineitem for them
    assert("BroadcastHashJoin".r.findAllIn(star).size >= 3)
  }

  test("q13 top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = physicalPlan(Relational.q13TopK(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q05 aggregates partially before the shuffle") {
    val plan = physicalPlan(Relational.q05GroupbyAgg(spark, sf))
    assert("HashAggregate".r.findAllIn(plan).size >= 2) // partial + final
  }

  test("q31 sketch-union estimate within 5% of exact global distinct") {
    val row = Relational.q31HllUnion(spark, sf).collect()(0)
    assert(row.getAs[Boolean]("within_5pct"),
      s"HLL union estimate out of tolerance vs exact " +
        s"${row.getAs[Long]("exact_global_users")}")
  }

  test("oracle coverage: every query has an oracle — no_oracle count is ZERO") {
    // q18/q31/c7/c10 graduated to tolerance/recall-bound hash gates
    // in round 5; m1/m3 and c8 in round 6; and in round 7 the last
    // holdout c3 graduated too — its gate emits the kernel's
    // token→xxhash64 vocabulary as a shared parquet asset and the
    // DuckDB twin reconstructs the fingerprints from it (the t1
    // generated-oracle precedent), so no rows-only gates remain.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"unexpected rows-only: $missing")
    // and no orphan oracles
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("q20 batch time bucket covers all events") {
    val total = Relational.q20TimeBucket(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("graft_normalize: all four forms match java.text.Normalizer, codegen and SQL") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // combining sequence, precomposed, ligature (NFKC-only fold),
    // fullwidth digits, already-clean ASCII, empty
    val combining   = "e\u0301clair"
    val precomposed = "\u00e9clair"
    val tricky = Seq(combining, precomposed, "ﬁle", "１２３", "plain", "")
    val df = tricky.toDF("s")
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val want = tricky.map(t =>
        java.text.Normalizer.normalize(t, java.text.Normalizer.Form.valueOf(form)))
      val got = df.select(graft.functions.GraftFunctions
        .unicodeNormalize(col("s"), form).as("n"))
        .collect().map(_.getString(0)).toSeq
      assert(got == want, s"form $form")
    }
    // NFC folds the combining pair to the precomposed char; NFKC also
    // folds compatibility forms — pin the semantic difference
    assert(df.select(graft.functions.GraftFunctions
      .unicodeNormalize(col("s")).as("n")).collect().map(_.getString(0))
      .count(_ == precomposed) == 2)
    // SQL registration, optional form argument, null propagation
    df.createOrReplaceTempView("norm_in")
    assert(spark.sql("SELECT graft_normalize(s) AS n FROM norm_in WHERE s = 'plain'")
      .head.getString(0) == "plain")
    assert(spark.sql("SELECT graft_normalize('ﬁle', 'NFKC') AS n")
      .head.getString(0) == "file")
    assert(spark.sql("SELECT graft_normalize(CAST(NULL AS STRING)) AS n")
      .head.isNullAt(0))
  }
}
