package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver fixtures (`/root/testdata/sf*`).
  *
  * Mirrors the reference's parquet-scan entry point
  * (ascii-hydra `pipeline_example/step_2.py:23`,
  * `resources/parquet_io_manager.py:70`): every table is a plain
  * parquet directory/file read with schema inferred from footers.
  * Column pruning + predicate pushdown then happen in Catalyst — at
  * 100 TB the scan must only read the columns/row-groups a query
  * touches, so downstream operators always `select` before shuffles.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects. Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see
    * [[graft.core.Sessions]]) so it arrives as a long; truncate to
    * microseconds — Spark's native timestamp precision. */
  private def withEventTs(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts DIV 1000)"))
    else df

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame =
    withEventTs(table(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every fixture table as a temp view so `spark.sql(...)`
    * works against the same data the DataFrame operators read (the
    * reference's users drive Spark SQL through DataFrames only; this
    * adds the SQL-string entry point a query engine owes its users). */
  def registerAll(s: SparkSession, d: String): Unit = names.foreach { n =>
    val df = if (n == "events") events(s, d) else table(s, d, n)
    df.createOrReplaceTempView(n)
  }
}
