package graft

import org.apache.spark.sql.functions._
import graft.core.TxTable
import graft.streaming.EventsStream

/** CHECK constraints on TxTable — write invariants enforced inside
  * the write job (the Delta constraint discipline): ADD validates
  * existing rows, every later write through ANY handle raises on a
  * violating row before anything commits, NULL conditions pass. */
class ConstraintSpec extends SparkSpec {

  private def freshTable(name: String): (TxTable, String) = {
    val dir = EventsStream.scratchDir(name) + "/t"
    (TxTable(spark, dir), dir)
  }

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"name_$i", i * 10.0)).toDF("id", "name", "score")
  }

  test("add validates existing rows; violating appends fail before committing") {
    val (t, _) = freshTable("ck_basic")
    t.overwrite(df(0 until 10))
    t.addCheckConstraint("score_nonneg", "score >= 0")
    assert(t.constraints == Map("score_nonneg" -> "score >= 0"))
    val vBefore = t.latestVersion.get
    import spark.implicits._
    val bad = Seq((99L, "bad", -5.0)).toDF("id", "name", "score")
    val e = intercept[Exception] { t.append(bad) }
    assert(e.getMessage.contains("score_nonneg"),
      s"violation must name the constraint — got ${e.getMessage}")
    assert(t.latestVersion.get == vBefore, "failed write must not commit")
    assert(t.read().count() == 10)
    // a clean append still lands
    t.append(df(10 until 12))
    assert(t.read().count() == 12)
  }

  test("adding a constraint existing rows violate refuses") {
    val (t, _) = freshTable("ck_preexisting")
    t.overwrite(df(0 until 10))
    val e = intercept[IllegalArgumentException] {
      t.addCheckConstraint("id_small", "id < 5")
    }
    assert(e.getMessage.contains("existing rows violate"))
    assert(t.constraints.isEmpty)
  }

  test("NULL conditions pass (SQL CHECK semantics); updates and merges enforce too") {
    import spark.implicits._
    val (t, _) = freshTable("ck_null")
    t.overwrite(Seq((1L, Some(5.0)), (2L, None)).toDF("id", "v"))
    t.addCheckConstraint("v_pos", "v > 0") // NULL v passes
    t.append(Seq((3L, None: Option[Double])).toDF("id", "v"))
    assert(t.read().count() == 3)
    // updateWhere producing a violation fails
    val e = intercept[Exception] {
      t.updateWhere(col("id") === 1L, Map("v" -> lit(-1.0)))
    }
    assert(e.getMessage.contains("v_pos"))
    assert(t.read().where(col("v") === 5.0).count() == 1, "update rolled back")
  }

  test("constraint binds every writer via the property, not the handle") {
    val (t, dir) = freshTable("ck_handle")
    t.overwrite(df(0 until 5))
    t.addCheckConstraint("score_nonneg", "score >= 0")
    // an unrelated fresh handle enforces it too
    val other = TxTable(spark, dir)
    import spark.implicits._
    val e = intercept[Exception] {
      other.append(Seq((9L, "x", -1.0)).toDF("id", "name", "score"))
    }
    assert(e.getMessage.contains("score_nonneg"))
  }

  test("rename/drop of a constrained column refuses; dropping the constraint frees it") {
    val (t, _) = freshTable("ck_colguard")
    t.overwrite(df(0 until 5))
    t.addCheckConstraint("score_nonneg", "score >= 0")
    assert(intercept[IllegalArgumentException] {
      t.renameColumn("score", "points")
    }.getMessage.contains("score_nonneg"))
    assert(intercept[IllegalArgumentException] {
      t.dropColumn("score")
    }.getMessage.contains("score_nonneg"))
    t.dropConstraint("score_nonneg")
    t.renameColumn("score", "points")
    assert(t.read().columns.contains("points"))
  }

  test("SQL verbs: ADD CONSTRAINT CHECK enforces, DROP CONSTRAINT releases") {
    val (t, dir) = freshTable("ck_sql")
    t.overwrite(df(0 until 5))
    spark.sql(s"ALTER TABLE txtable.`$dir` ADD CONSTRAINT id_pos CHECK (id >= 0)")
    assert(t.constraints.contains("id_pos"))
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO txtable.`$dir` VALUES (-1, 'neg', 0.0)")
    }
    assert(e.getMessage.contains("id_pos"))
    spark.sql(s"ALTER TABLE txtable.`$dir` DROP CONSTRAINT id_pos")
    spark.sql(s"INSERT INTO txtable.`$dir` VALUES (-1, 'neg', 0.0)")
    assert(t.read().count() == 6)
    // dropping a missing constraint without IF EXISTS refuses
    assert(intercept[Exception] {
      spark.sql(s"ALTER TABLE txtable.`$dir` DROP CONSTRAINT nosuch")
    }.getMessage.contains("no constraint"))
  }

  test("NOT NULL: SET validates existing rows, writes enforce, DROP frees") {
    import spark.implicits._
    val (t, dir) = freshTable("nn_basic")
    t.overwrite(df(0 until 10))
    // SQL verb on the path-addressed table
    spark.sql(s"ALTER TABLE txtable.`$dir` ALTER COLUMN name SET NOT NULL")
    assert(t.notNullColumns == Seq("name"))
    val vBefore = t.latestVersion.get
    val bad = Seq((99L, null.asInstanceOf[String], 1.0))
      .toDF("id", "name", "score")
    val e = intercept[Exception] { t.append(bad) }
    assert(e.getMessage.contains("NOT NULL") && e.getMessage.contains("name"),
      s"violation must name the column — got ${e.getMessage}")
    assert(t.latestVersion.get == vBefore, "failed write must not commit")
    // a frame MISSING the column refuses outright (null backfill
    // would violate silently)
    val missing = Seq((100L, 2.0)).toDF("id", "score")
    assert(intercept[Exception] { t.append(missing) }
      .getMessage.contains("NOT NULL"))
    // SQL INSERT with an explicit NULL fails; clean insert lands
    assert(intercept[Exception] {
      spark.sql(s"INSERT INTO txtable.`$dir` VALUES (7, NULL, 0.5)")
    }.getMessage.contains("NOT NULL"))
    spark.sql(s"INSERT INTO txtable.`$dir` VALUES (7, 'ok', 0.5)")
    assert(t.read().count() == 11)
    // rename/drop of the constrained column refuses until DROP NOT NULL
    assert(intercept[IllegalArgumentException] { t.dropColumn("name") }
      .getMessage.contains("NOT NULL"))
    spark.sql(s"ALTER TABLE txtable.`$dir` ALTER COLUMN name DROP NOT NULL")
    assert(t.notNullColumns.isEmpty)
    t.append(Seq((101L, null.asInstanceOf[String], 3.0))
      .toDF("id", "name", "score"))
    assert(t.read().where(col("name").isNull).count() == 1)
  }

  test("SET NOT NULL on a column holding nulls refuses") {
    import spark.implicits._
    val (t, _) = freshTable("nn_preexisting")
    t.overwrite(Seq((1L, Some(1.0)), (2L, None)).toDF("id", "v"))
    assert(intercept[IllegalArgumentException] { t.setNotNull("v") }
      .getMessage.contains("NULL"))
    assert(t.notNullColumns.isEmpty)
  }

  test("generated column: compute-if-absent, enforce-if-supplied") {
    import spark.implicits._
    val (t, _) = freshTable("gen_basic")
    t.overwrite(Seq((1L, 10.0, 20.0), (2L, 5.0, 10.0))
      .toDF("id", "score", "twice"))
    t.addGeneratedColumn("twice", "score * 2")
    assert(t.generatedColumns == Map("twice" -> "score * 2"))
    // a write omitting the column gets it computed inside the job
    t.append(Seq((3L, 7.0)).toDF("id", "score"))
    assert(t.read().where(col("id") === 3L).head.getDouble(2) == 14.0)
    // supplying the correct value passes; a wrong one refuses
    t.append(Seq((4L, 1.0, 2.0)).toDF("id", "score", "twice"))
    val e = intercept[Exception] {
      t.append(Seq((5L, 1.0, 99.0)).toDF("id", "score", "twice"))
    }
    assert(e.getMessage.contains("generated column"), e.getMessage)
    assert(t.read().count() == 4)
    // the generation SOURCE column is rename/drop-protected
    assert(intercept[IllegalArgumentException] { t.renameColumn("score", "s2") }
      .getMessage.contains("generated"))
    t.dropGeneratedColumn("twice")
    t.append(Seq((6L, 1.0, 99.0)).toDF("id", "score", "twice"))
    assert(t.read().count() == 5)
  }

  test("declaring a generated column existing rows violate refuses") {
    import spark.implicits._
    val (t, _) = freshTable("gen_preexisting")
    t.overwrite(Seq((1L, 10.0, 21.0)).toDF("id", "score", "twice"))
    assert(intercept[IllegalArgumentException] {
      t.addGeneratedColumn("twice", "score * 2")
    }.getMessage.contains("violate"))
    assert(t.generatedColumns.isEmpty)
  }

  test("identity column: mint-if-absent, supplied passes, high water advances") {
    import spark.implicits._
    val (t, _) = freshTable("ident_basic")
    t.overwrite(Seq((5L, "seed")).toDF("id", "v"))
    t.addIdentityColumn("id", start = 1, step = 1)
    // seeded from the data: next mints must clear the existing max
    assert(t.identityColumns("id")._3 == 5L)
    // a frame OMITTING the column gets minted values
    t.append(Seq("a", "b", "c").toDF("v"))
    val afterMint = t.read().select("id").collect().map(_.getLong(0)).toSeq
    assert(afterMint.length == 4 && afterMint.distinct.length == 4)
    assert(afterMint.filter(_ != 5L).forall(_ > 5L), afterMint)
    val high1 = t.identityColumns("id")._3
    assert(high1 == afterMint.max)
    // BY DEFAULT: supplied values pass, and their max folds into the
    // high water so later mints cannot collide
    t.append(Seq((high1 + 1000L, "explicit")).toDF("id", "v"))
    assert(t.identityColumns("id")._3 == high1 + 1000L)
    t.append(Seq("d").toDF("v"))
    val all = t.read().select("id").collect().map(_.getLong(0)).toSeq
    assert(all.distinct.length == all.length)
    assert(all.max > high1 + 1000L)
    // internal rewrites carry ids untouched
    val before = t.read().where(col("v") =!= "a")
      .select("id").collect().map(_.getLong(0)).toSet
    t.deleteWhere(col("v") === "a")
    assert(t.read().select("id").collect().map(_.getLong(0)).toSet == before)
    // identity column is rename/drop-protected until dropped
    assert(intercept[IllegalArgumentException] { t.renameColumn("id", "id2") }
      .getMessage.contains("identity"))
    t.dropIdentityColumn("id")
    assert(t.identityColumns.isEmpty)
  }

  test("identity declarations: BIGINT only, positive step, not on generated") {
    import spark.implicits._
    val (t, _) = freshTable("ident_refuse")
    t.overwrite(Seq((1, 2.0)).toDF("n", "score"))
    assert(intercept[Exception] { t.addIdentityColumn("n") }
      .getMessage.contains("BIGINT"))
    assert(intercept[Exception] { t.addIdentityColumn("missing") }
      .getMessage.contains("no column"))
    val (t2, _) = freshTable("ident_refuse2")
    t2.overwrite(Seq((1L, 2.0)).toDF("id", "score"))
    assert(intercept[Exception] { t2.addIdentityColumn("id", step = 0) }
      .getMessage.contains("positive"))
  }

  test("identity SQL verbs: SET IDENTITY mints on INSERT, DROP IDENTITY frees") {
    import spark.implicits._
    val (t, dir) = freshTable("ident_sql")
    t.overwrite(Seq((100L, "seed")).toDF("id", "v"))
    spark.sql(s"ALTER TABLE txtable.`$dir` SET IDENTITY id START WITH 1 STEP 2")
    assert(t.identityColumns("id") == ((1L, 2L, 100L)))
    // an INSERT that omits the identity column mints through the seam
    Seq("x", "y").toDF("v").createOrReplaceTempView("ident_sql_src")
    spark.sql(s"INSERT INTO txtable.`$dir` (v) SELECT v FROM ident_sql_src")
    val ids = spark.sql(s"SELECT id FROM txtable.`$dir`")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.length == 3 && ids.distinct.length == 3)
    assert(ids.filter(_ != 100L).forall(_ > 100L), ids)
    spark.sql(s"ALTER TABLE txtable.`$dir` DROP IDENTITY id")
    assert(TxTable(spark, dir).identityColumns.isEmpty)
  }

  test("concurrent identity mints never produce duplicate ids") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val (t, dir) = freshTable("ident_race")
    t.overwrite(Seq((0L, "seed")).toDF("id", "v"))
    t.addIdentityColumn("id")
    // two handles minting in parallel: either they serialize (both
    // land, disjoint ids) or the loser's commit detects the stale
    // mint base and fails LOUDLY — silent duplication never happens
    val fs = (1 to 2).map { i =>
      Future {
        try { TxTable(spark, dir).append(
          Seq(s"w${i}a", s"w${i}b").toDF("v")); None }
        catch { case e: Exception => Some(e.getMessage) }
      }
    }
    val errs = fs.map(Await.result(_, 120.seconds)).flatten
    errs.foreach(m => assert(m.contains("concurrent identity"), m))
    val ids = TxTable(spark, dir).read().select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.distinct.length == ids.length, s"duplicate ids: $ids")
    assert(ids.length == 1 + (2 - errs.length) * 2)
  }
}
