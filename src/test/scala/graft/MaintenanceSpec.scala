package graft

import org.apache.spark.sql.functions._
import graft.core.ParquetIOManager

/** Parquet-dir maintenance: compact crash recovery, orphan GC, and
  * age-based retention — the plain-parquet equivalent of the
  * reference's Delta vacuum/retention story (B10). */
class MaintenanceSpec extends SparkSpec {

  private def io = new ParquetIOManager(spark)
  private def fixture(dir: String, n: Int = 100): Unit = {
    io.write(spark.range(n).select(col("id"), (col("id") * 2).as("v")), dir)
    ()
  }
  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def tmpdir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString + "/data"

  test("recoverCompact: crash before swap drops the incomplete tmp") {
    val dir = tmpdir("rc1")
    fixture(dir)
    // plant an incomplete rewrite
    io.write(spark.range(10).select(col("id"), (col("id") * 2).as("v")),
      dir + "._compact_tmp")
    val actions = io.recoverCompact(dir)
    assert(actions.exists(_.contains("incomplete")), actions)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "._compact_tmp")))
    assert(io.read(dir).count() == 100)
  }

  test("recoverCompact: crash between renames promotes the complete tmp") {
    val dir = tmpdir("rc2")
    fixture(dir)
    // simulate: rewrite complete in tmp, source renamed to old, then crash
    io.write(io.read(dir).repartition(1), dir + "._compact_tmp")
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "._compact_old")))
    val actions = io.recoverCompact(dir)
    assert(actions.exists(_.contains("promoted")), actions)
    assert(io.read(dir).count() == 100)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "._compact_old")))
  }

  test("recoverCompact: crash after swap drops the superseded old copy") {
    val dir = tmpdir("rc3")
    fixture(dir)
    io.write(spark.range(5).select(col("id"), (col("id") * 2).as("v")),
      dir + "._compact_old")
    val actions = io.recoverCompact(dir)
    assert(actions.exists(_.contains("superseded")), actions)
    assert(io.read(dir).count() == 100)
  }

  test("recoverCompact: old-only state rolls back to the source") {
    val dir = tmpdir("rc4")
    fixture(dir)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "._compact_old")))
    val actions = io.recoverCompact(dir)
    assert(actions.exists(_.contains("rolled back")), actions)
    assert(io.read(dir).count() == 100)
  }

  test("gcOrphans removes crashed-write staging and keeps data intact") {
    val dir = tmpdir("gc1")
    fixture(dir)
    // plant a crashed write attempt's staging tree
    val staging = new org.apache.hadoop.fs.Path(dir + "/_temporary/0/task_1")
    fs.mkdirs(staging)
    val out = fs.create(new org.apache.hadoop.fs.Path(staging, "part-001.parquet"))
    out.write(Array.fill[Byte](16)(1)); out.close()
    val removed = io.gcOrphans(dir)
    assert(removed.exists(_.contains("_temporary")), removed)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "/_temporary")))
    assert(io.read(dir).count() == 100)
    assert(io.gcOrphans(dir).isEmpty) // idempotent: second sweep is a no-op
  }

  test("retentionSweep drops expired partitions, keeps the rest readable") {
    val dir = tmpdir("ret1")
    val df = spark.range(30).select(col("id"),
      concat(lit("2026-08-"), lpad((col("id") % 3 + 9).cast("string"), 2, "0"))
        .as("ds"))
    io.write(df, dir, partitionBy = Seq("ds"))
    val dropped = io.retentionSweep(dir, "ds", cutoff = "2026-08-10")
    assert(dropped.size == 1 && dropped.head.contains("ds=2026-08-09"), dropped)
    val left = io.readPartitioned(dir)
    // partition values come back type-inferred (dates here)
    assert(left.select("ds").distinct().collect().map(_.get(0).toString)
      .sorted.toSeq == Seq("2026-08-10", "2026-08-11"))
    assert(left.count() == 20)
  }
}
