package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Tables, TxTable}

/** Itemized wall-clock of the TxTable per-commit driver constant —
  * the s8 (streaming upsert microbatch) and x23-cold (4-commit CDC
  * asset) shapes. Prints one line per phase so the top cost is a
  * fact, not a guess. Run:
  *
  *   SPARK_GRAFT_CPUS=8 tools/run.sh graft.tools.CommitProfile /root/testdata/sf0.1
  */
object CommitProfile {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROFILE $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val scratch = graft.streaming.EventsStream.scratchDir("commit_profile")

    // ---- shape 1: the s8 microbatch (bucketed upsert, stats off) ----
    val o = Tables.orders(spark, d)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val t1 = TxTable(spark, s"$scratch/t1", statsOnWrite = false)
    t("s8-ish: seed overwriteBucketed(16)") {
      t1.overwriteBucketed(o, Seq("o_orderkey"), 16)
    }
    val batch = t("batch materialize (2%)") {
      val b = o.where(col("o_orderkey") % 50 === 0)
        .withColumn("o_orderpriority", lit("UP"))
      b.cache().count(); b
    }
    (1 to 3).foreach { i =>
      t(s"upsert #$i (pinned, stats off)") {
        t1.upsert(batch, sourceIsPinned = true)
      }
    }

    // ---- shape 2: x23-cold (CDF handle, stats ON default) ----
    val t2 = TxTable(spark, s"$scratch/t2", changeDataFeed = true)
    t("x23: overwriteBucketed base (2/3 rows)") {
      t2.overwriteBucketed(o.where(col("o_orderkey") % 3 =!= 0),
        Seq("o_orderkey"), 16)
    }
    t("x23: append (1/3 rows)") {
      t2.append(o.where(col("o_orderkey") % 3 === 0))
    }
    t("x23: upsert (1/2 rows, CDC)") {
      t2.upsert(o.where(col("o_orderkey") % 2 === 0)
        .withColumn("o_orderpriority", lit("MERGED")))
    }
    t("x23: deleteKeys (1/7, CDC)") {
      t2.deleteKeys(o.where(col("o_orderkey") % 7 === 0)
        .select("o_orderkey"))
    }
    t("x23: table_changes read") {
      spark.sql(s"SELECT count(*) FROM table_changes('$scratch/t2', 0)")
        .collect()
    }
    spark.stop()
  }
}
