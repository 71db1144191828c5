package graft

import org.apache.spark.sql.functions._

import graft.core.{TxCatalog, TxTable}
import graft.streaming.EventsStream

/** Named-catalog txtable tables: `CREATE TABLE name USING txtable
  * LOCATION ...` registers a name every SQL verb then resolves —
  * SELECT / time travel / INSERT / UPDATE / DELETE / MERGE /
  * maintenance verbs address the table BI-style, by name instead of
  * path (the reference's session-catalog Delta usage,
  * resources/spark.py:65-67). External-table semantics: DROP TABLE
  * unregisters the name, data stays. */
class TxCatalogSpec extends SparkSpec {

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"name_$i", i * 10.0)).toDF("id", "name", "score")
  }

  test("register + SELECT/INSERT/DML/maintenance by name; DROP keeps data") {
    val dir = EventsStream.scratchDir("txcat_basic") + "/t"
    TxTable(spark, dir).overwrite(df(0 until 100))
    spark.sql(s"CREATE TABLE cat_events USING txtable LOCATION '$dir'")
    // SELECT by name hits the manifest-planned relation
    assert(spark.sql("SELECT count(*) AS n FROM cat_events").head.getLong(0) == 100)
    // INSERT INTO by name commits through the log
    spark.sql("INSERT INTO cat_events SELECT 1000, 'new', 1.5")
    assert(spark.sql("SELECT count(*) AS n FROM cat_events").head.getLong(0) == 101)
    // time travel by name
    assert(spark.sql("SELECT count(*) AS n FROM cat_events VERSION AS OF 0")
      .head.getLong(0) == 100)
    // predicate DML by name
    spark.sql("UPDATE cat_events SET name = 'X' WHERE id = 7")
    assert(spark.sql("SELECT name FROM cat_events WHERE id = 7")
      .head.getString(0) == "X")
    spark.sql("DELETE FROM cat_events WHERE id >= 990 AND id <= 1000")
    assert(spark.sql("SELECT count(*) AS n FROM cat_events").head.getLong(0) == 100)
    // maintenance verbs by name
    assert(spark.sql("DESCRIBE HISTORY cat_events").count() >= 4)
    spark.sql("OPTIMIZE cat_events")
    assert(spark.sql("DESCRIBE DETAIL cat_events")
      .select("location").head.getString(0) == dir)
    // MERGE by name (non-bucketed file-granular core)
    import spark.implicits._
    Seq((7L, "MERGED", -1.0), (5000L, "INS", 2.0))
      .toDF("id", "name", "score").createOrReplaceTempView("cat_src")
    spark.sql("MERGE INTO cat_events t USING cat_src s ON t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(spark.sql("SELECT name FROM cat_events WHERE id = 7")
      .head.getString(0) == "MERGED")
    assert(spark.sql("SELECT count(*) AS n FROM cat_events").head.getLong(0) == 101)
    // DROP unregisters the NAME; the data and log stay (external rule)
    spark.sql("DROP TABLE cat_events")
    assert(TxCatalog(spark).lookup("cat_events").isEmpty)
    assert(TxTable(spark, dir).read().count() == 101)
    // the name no longer resolves through our seam
    intercept[Exception] { spark.sql("SELECT * FROM cat_events").collect() }
  }

  test("CTAS by name (default warehouse location) + db.name + IF NOT EXISTS") {
    spark.sql("DROP TABLE IF EXISTS graftdb.cat_ctas")
    spark.sql("CREATE TABLE graftdb.cat_ctas USING txtable AS " +
      "SELECT id, id * 2 AS twice FROM range(50)")
    assert(spark.sql("SELECT sum(twice) AS s FROM graftdb.cat_ctas")
      .head.getLong(0) == 2450)
    // IF NOT EXISTS is a no-op on the registered name
    spark.sql("CREATE TABLE IF NOT EXISTS graftdb.cat_ctas USING txtable AS " +
      "SELECT id, id AS twice FROM range(1)")
    assert(spark.sql("SELECT count(*) AS n FROM graftdb.cat_ctas")
      .head.getLong(0) == 50)
    val loc = TxCatalog(spark).lookup("graftdb.cat_ctas").get
    assert(loc.contains("graftdb"), s"default location should derive from db.name: $loc")
    spark.sql("DROP TABLE graftdb.cat_ctas")
  }

  test("CREATE with column list on a fresh location commits an empty v0") {
    val dir = EventsStream.scratchDir("txcat_fresh") + "/t"
    spark.sql("CREATE TABLE cat_fresh (k BIGINT, part STRING, v DOUBLE) " +
      s"USING txtable PARTITIONED BY (part) LOCATION '$dir'")
    assert(spark.sql("SELECT count(*) AS n FROM cat_fresh").head.getLong(0) == 0)
    spark.sql("INSERT INTO cat_fresh VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    assert(spark.sql("SELECT count(*) AS n FROM cat_fresh").head.getLong(0) == 2)
    // hive layout honored from the declared PARTITIONED BY
    assert(TxTable(spark, dir).partitionColumns == Seq("part"))
    assert(spark.sql("SHOW PARTITIONS cat_fresh").count() == 2)
    spark.sql("DROP TABLE cat_fresh")
  }

  test("unregistered names fall through; temp views are never shadowed") {
    import spark.implicits._
    Seq((1, "tv")).toDF("id", "tag").createOrReplaceTempView("cat_not_ours")
    assert(spark.sql("SELECT tag FROM cat_not_ours").head.getString(0) == "tv")
  }

  test("concurrent CREATEs of DIFFERENT names both register (no lost update)") {
    val base = EventsStream.scratchDir("txcat_race")
    val names = (0 until 8).map(i => s"cat_race_$i")
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
    (0 until 8).foreach { i =>
      TxTable(spark, s"$base/t$i").overwrite(df(0 until 5))
    }
    // 8 threads register 8 different names through the same registry
    // file — the old last-write-wins publish silently dropped losers
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = (0 until 8).map { i =>
        pool.submit(new Runnable {
          def run(): Unit =
            spark.sql(s"CREATE TABLE ${names(i)} USING txtable LOCATION '$base/t$i'")
        })
      }
      futs.foreach(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val cat = TxCatalog(spark)
    names.foreach { n =>
      assert(cat.lookup(n).isDefined, s"registration of $n was lost")
      assert(spark.sql(s"SELECT count(*) AS n FROM $n").head.getLong(0) == 5)
    }
    names.foreach(n => spark.sql(s"DROP TABLE $n"))
  }

  test("SHOW PARTITIONS on a non-txtable table delegates to Spark") {
    // SHOW PARTITIONS exists in Spark's own grammar — a bare name that
    // is NOT a registered txtable must reach the delegate, not error
    spark.sql("DROP TABLE IF EXISTS cat_plain_part")
    spark.sql("CREATE TABLE cat_plain_part (id BIGINT, p STRING) " +
      "USING parquet PARTITIONED BY (p)")
    spark.sql("INSERT INTO cat_plain_part VALUES (1, 'a'), (2, 'b')")
    val parts = spark.sql("SHOW PARTITIONS cat_plain_part")
      .collect().map(_.getString(0)).sorted
    assert(parts.toSeq == Seq("p=a", "p=b"))
    spark.sql("DROP TABLE cat_plain_part")
  }

  test("time travel and RESTORE resolve a timestamp literal identically") {
    val dir = EventsStream.scratchDir("txcat_ts") + "/t"
    val t = TxTable(spark, dir)
    t.overwrite(df(0 until 3))            // v0
    Thread.sleep(1100)
    val mid = System.currentTimeMillis()  // strictly after v0's publish
    Thread.sleep(1100)
    t.append(df(100 until 102))           // v1 — strictly after mid
    spark.sql("DROP TABLE IF EXISTS cat_ts")
    spark.sql(s"CREATE TABLE cat_ts USING txtable LOCATION '$dir'")
    // the mid-instant rendered in the SESSION zone
    val zone = java.time.ZoneId.of(
      spark.sessionState.conf.sessionLocalTimeZone)
    val lit = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(zone)
      .format(java.time.Instant.ofEpochMilli(mid))
    // SELECT ... TIMESTAMP AS OF — must see only v0 (3 rows)
    assert(spark.sql(
      s"SELECT count(*) AS n FROM cat_ts TIMESTAMP AS OF '$lit'")
      .head.getLong(0) == 3)
    // RESTORE ... TIMESTAMP AS OF the same literal → same version
    spark.sql(s"RESTORE TABLE cat_ts TO TIMESTAMP AS OF '$lit'")
    assert(spark.sql("SELECT count(*) AS n FROM cat_ts").head.getLong(0) == 3)
    spark.sql("DROP TABLE cat_ts")
  }

  test("maintenance verbs accept the catalog-qualified spelling") {
    val dir = EventsStream.scratchDir("txcat_verbq") + "/t"
    TxTable(spark, dir).overwrite(df(0 until 30).repartition(4))
    spark.sql("DROP TABLE IF EXISTS cat_verbq")
    spark.sql(s"CREATE TABLE cat_verbq USING txtable LOCATION '$dir'")
    // OPTIMIZE / DESCRIBE HISTORY / SHOW PARTITIONS via graft.default.<n>
    spark.sql("OPTIMIZE graft.default.cat_verbq")
    assert(TxTable(spark, dir).history().last._2 == "compact")
    assert(spark.sql("DESCRIBE HISTORY graft.default.cat_verbq").count() >= 2)
    assert(spark.sql("DESCRIBE DETAIL graft.default.cat_verbq")
      .select("location").head.getString(0) == dir)
    assert(spark.sql("SHOW PARTITIONS graft.default.cat_verbq").count() == 1)
    spark.sql("DROP TABLE cat_verbq")
  }

  test("named CLONE registers the target at a warehouse location") {
    val dir = EventsStream.scratchDir("txcat_clone") + "/t"
    TxTable(spark, dir).overwrite(df(0 until 10))
    spark.sql("DROP TABLE IF EXISTS cat_clone_src")
    spark.sql(s"CREATE TABLE cat_clone_src USING txtable LOCATION '$dir'")
    spark.sql("DROP TABLE IF EXISTS cat_clone_dst")
    spark.sql("CREATE TABLE cat_clone_dst SHALLOW CLONE cat_clone_src")
    assert(spark.sql("SELECT count(*) AS n FROM cat_clone_dst").head.getLong(0) == 10)
    // clone is independent: writes to the clone never touch the source
    spark.sql("INSERT INTO cat_clone_dst SELECT 99, 'c', 0.0")
    assert(spark.sql("SELECT count(*) AS n FROM cat_clone_src").head.getLong(0) == 10)
    spark.sql("DROP TABLE cat_clone_dst")
    spark.sql("DROP TABLE cat_clone_src")
  }

  test("table_changes TVF: the CDF surface as a FROM-clause relation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = graft.streaming.EventsStream.scratchDir("cat_tvf") + "/t"
    val t = graft.core.TxTable(spark, dir, changeDataFeed = true)
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))      // v0
    t.append(Seq((3L, "c")).toDF("k", "v"))                    // v1
    t.deleteWhere(col("k") === 1L)                             // v2
    spark.sql("DROP TABLE IF EXISTS cat_tvf")
    spark.sql(s"CREATE TABLE cat_tvf USING txtable LOCATION '$dir'")
    // name spelling ≡ the Scala API
    val viaSql = spark.sql(
      "SELECT _change_type, count(*) AS n FROM table_changes('cat_tvf', 0) " +
        "GROUP BY 1").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaApi = t.changeFeed(0).groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql == viaApi, s"$viaSql vs $viaApi")
    assert(viaSql.getOrElse("delete", 0L) == 1L)
    // catalog-qualified and bare-path spellings resolve too; the end
    // version bounds the window; the relation composes (filter+join)
    assert(spark.sql(
      "SELECT count(*) FROM table_changes('graft.default.cat_tvf', 0, 1)")
      .head.getLong(0) == t.changeFeed(0, Some(1)).count())
    assert(spark.sql(
      s"SELECT count(*) FROM table_changes('$dir', 0, 1) c " +
        "JOIN cat_tvf x ON c.k = x.k WHERE c._change_type = 'insert'")
      .head.getLong(0) == 1L)
    // unregistered names refuse loudly
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('nope_missing', 0)").collect()
    }
    assert(err.getMessage.contains("not a registered"), err.getMessage)
    spark.sql("DROP TABLE cat_tvf")
  }
}
