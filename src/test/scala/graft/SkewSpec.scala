package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling — the conf surface the reference turns on
  * (resources/spark.py:38) actually firing: a synthetic hot key
  * forces one shuffle partition ~100× the median, and AQE splits it
  * (skew=true in the final SMJ) with thresholds scaled to test size. */
class SkewSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of left rows share key 0; payload stays referenced so the
      // hot shuffle partition carries incompressible bytes (a single
      // repeated key alone compresses below any skew threshold)
      val left = spark.range(200000).select(
        when(col("id") < 180000, 0L).otherwise(col("id") % 1000).as("k"),
        pmod(xxhash64(col("id")), lit(1000000)).as("payload"))
      val right = spark.range(1000).select(col("id").as("k"),
        (col("id") * 2).as("rv"))
      val joined = left.join(right, "k")
        .select(sum(col("rv") + col("payload")).as("s"))
      joined.queryExecution.toRdd.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(1200))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
