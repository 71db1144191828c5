package graft

/** CBO statistics feeding: catalog tables + ANALYZE give the
  * optimizer real row/column stats, and the un-hinted star join
  * (q34) must find the broadcast-star plan from them — the last gap
  * between "plans with my hints" and "plans the optimizer finds"
  * (the reference's cbo.joinReorder tuning presumes exactly this). */
class CboSpec extends SparkSpec {

  test("catalog registration feeds row and column statistics to the optimizer") {
    graft.core.Tables.registerCatalog(spark, sf)
    val st = spark.table("graft_stats.lineitem").queryExecution.optimizedPlan.stats
    assert(st.rowCount.isDefined && st.rowCount.get > 0,
      s"no rowCount statistic on graft.lineitem: $st")
    assert(st.attributeStats.nonEmpty,
      "no column-level statistics on graft.lineitem")
    // histograms are a deliberate OPT-IN (deserialized+walked in the
    // optimizer on every planning pass — ~1.2 s/query measured, with
    // identical join plans for this workload): default registration
    // must NOT carry them, the opt-in path must
    assert(!st.attributeStats.exists(_._2.histogram.isDefined),
      "default registration unexpectedly computed histograms")
    graft.core.Tables.registerCatalog(spark, sf, db = "graft_hist",
      histograms = true)
    val sth = spark.table("graft_hist.lineitem")
      .queryExecution.optimizedPlan.stats
    assert(sth.attributeStats.exists(_._2.histogram.isDefined),
      "no equi-height histograms on graft_hist.lineitem (selectivity path)")
    // registration is cached per (session, dir, db, histograms)
    graft.core.Tables.registerCatalog(spark, sf)
  }

  test("named txtable relations carry manifest rowCount — CBO broadcast " +
      "with no hints and no ANALYZE") {
    import org.apache.spark.sql.functions._
    import graft.core.TxTable
    import graft.streaming.EventsStream
    val (bigDir, smallDir) = (EventsStream.scratchDir("cbo_tx_big") + "/t",
      EventsStream.scratchDir("cbo_tx_small") + "/t")
    TxTable(spark, bigDir).overwrite(
      graft.core.Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"))
    TxTable(spark, smallDir).overwrite(
      graft.core.Tables.orders(spark, sf)
        .where(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_totalprice"))
    Seq("cbo_tx_big", "cbo_tx_small").foreach(n =>
      spark.sql(s"DROP TABLE IF EXISTS $n"))
    spark.sql(s"CREATE TABLE cbo_tx_big USING txtable LOCATION '$bigDir'")
    spark.sql(s"CREATE TABLE cbo_tx_small USING txtable LOCATION '$smallDir'")
    // the manifest's EXACT count surfaces as plan statistics — no
    // ANALYZE ran on either table
    val expect = TxTable(spark, smallDir).read().count()
    val st = spark.sql("SELECT * FROM cbo_tx_small")
      .queryExecution.optimizedPlan.stats
    assert(st.rowCount.contains(BigInt(expect)),
      s"manifest rowCount missing from plan stats: $st")
    // and the un-hinted fact ⋈ dim join broadcasts the small side
    val j = spark.sql("SELECT b.l_orderkey, s.o_totalprice FROM cbo_tx_big b " +
      "JOIN cbo_tx_small s ON b.l_orderkey = s.o_orderkey")
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(j.count() > 0)
    Seq("cbo_tx_big", "cbo_tx_small").foreach(n => spark.sql(s"DROP TABLE $n"))
  }

  test("manifest column stats: range-filter selectivity with zero ANALYZE") {
    import org.apache.spark.sql.functions._
    import graft.core.TxTable
    import graft.streaming.EventsStream
    val dir = EventsStream.scratchDir("cbo_colstats") + "/t"
    TxTable(spark, dir).overwrite(
      graft.core.Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_quantity", "l_shipdate"))
    // numeric column stats ride the relation straight from the
    // manifest's zone maps — nobody ran ANALYZE on this table
    val full = spark.sql(s"SELECT * FROM txtable.`$dir`")
      .queryExecution.optimizedPlan.stats
    assert(full.rowCount.isDefined && full.rowCount.get > 0)
    val byName = full.attributeStats.map { case (a, s) => a.name -> s }
    assert(byName.get("l_orderkey").exists(s =>
      s.min.isDefined && s.max.isDefined),
      s"no manifest min/max on l_orderkey: $full")
    // FilterEstimation interpolates the range predicate over min/max:
    // a 1%-of-keyspace filter must shrink the estimated rows hard —
    // the signal CBO needs to flip a shuffled join to broadcast
    val loKey = TxTable(spark, dir).read()
      .agg(min(col("l_orderkey"))).head.getLong(0)
    val hiKey = TxTable(spark, dir).read()
      .agg(max(col("l_orderkey"))).head.getLong(0)
    val cut = loKey + math.max(1L, (hiKey - loKey) / 100)
    val filtered = spark.sql(
      s"SELECT * FROM txtable.`$dir` WHERE l_orderkey <= $cut")
      .queryExecution.optimizedPlan.stats
    assert(filtered.rowCount.isDefined &&
      filtered.rowCount.get * 5 < full.rowCount.get,
      s"range filter not estimated selective: $filtered vs $full")
  }

  test("V2 catalog scans report column stats: selectivity on graft.* reads too") {
    import org.apache.spark.sql.functions._
    import graft.core.TxTable
    import graft.streaming.EventsStream
    val dir = EventsStream.scratchDir("cbo_v2stats") + "/t"
    TxTable(spark, dir).overwrite(
      graft.core.Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"))
    spark.sql("DROP TABLE IF EXISTS cbo_v2stats")
    spark.sql(s"CREATE TABLE cbo_v2stats USING txtable LOCATION '$dir'")
    val full = spark.sql("SELECT * FROM graft.default.cbo_v2stats")
      .queryExecution.optimizedPlan.stats
    assert(full.rowCount.isDefined && full.rowCount.get > 0, s"$full")
    val byName = full.attributeStats.map { case (a, s) => a.name -> s }
    assert(byName.get("l_orderkey").exists(s =>
      s.min.isDefined && s.max.isDefined && s.distinctCount.isDefined),
      s"V2 scan reported no column stats: $full")
    val filtered = spark.sql(
      "SELECT * FROM graft.default.cbo_v2stats WHERE l_orderkey <= 60")
      .queryExecution.optimizedPlan.stats
    assert(filtered.rowCount.isDefined &&
      filtered.rowCount.get * 5 < full.rowCount.get,
      s"V2 range filter not estimated selective: $filtered vs $full")
    spark.sql("DROP TABLE cbo_v2stats")
  }

  test("hint-free star join broadcasts every dimension from stats alone") {
    val q = graft.ops.Relational.q34CboStarUnhinted(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("un-hinted CBO plan returns exactly the hinted q07 result") {
    val unhinted = graft.ops.Relational.q34CboStarUnhinted(spark, sf).collect().toSeq
    val hinted = graft.ops.Relational.q07StarJoin(spark, sf).collect().toSeq
    assert(unhinted == hinted)
  }

  test("runtime bloom filter prunes the fact side of a selective shuffled join") {
    // the 100 TB story behind Spark's InjectRuntimeFilter: when a
    // dimension carries a selective predicate and the join must
    // shuffle (too big to broadcast), a bloom filter built from the
    // creation side is pushed into the fact side's scan stage so
    // non-matching fact rows die before the exchange. Fixture tables
    // are below the default size thresholds, so the test lowers them
    // (a real warehouse hits the defaults) and forces the shuffle
    // join by disabling auto-broadcast.
    import org.apache.spark.sql.functions._
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.core.Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_quantity")
      val sel = graft.core.Tables.orders(spark, sf)
        .where(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderpriority")
      val j = li.join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom runtime filter injected:\n$optimized")
      // and the filtered plan still answers correctly
      val n = j.collect().map(_.getLong(1)).sum
      val expected = li.join(sel, col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
