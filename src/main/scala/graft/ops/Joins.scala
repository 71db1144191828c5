package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities beyond stock strategies — the explicit skew
  * handling the reference turns on via AQE
  * (ascii-hydra `resources/spark.py:38`), for the cases AQE can't
  * fix: a *logical* hot key (one customer with 10⁸ rows) skews the
  * build of a single shuffle partition no matter how AQE splits
  * files.
  */
object Joins {

  /** Salted equi join for a skewed LEFT side: left rows get a
    * deterministic salt in [0, salts) (hashed from the whole row via
    * a monotonic per-row component so hot keys spread evenly), the
    * right side is replicated `salts` times, and the join key becomes
    * (key, salt) — splitting each hot key across `salts` reducers.
    *
    * Equivalent to `left.join(right, key)` for any 1:N key
    * relationship (the right replication is keyed, not cross).
    * Cost: right side × salts — use when right is dimension-sized
    * and a left key is pathological.
    *
    * Only left-preserving join types are accepted: the right side is
    * replicated `salts` times, so right/full outer (and right semi/
    * anti) would emit `salts` duplicate copies of unmatched right
    * rows. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 8, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val allowed = Set("inner", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "semi", "leftanti", "left_anti", "anti")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin is only correct for left-preserving joins, got $joinType")
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft
      .join(replicatedRight, Seq(key, "_salt"), joinType)
      .drop("_salt")
  }

  /** Range join reduced to an equi join by bucketing: pairs (point ∈
    * [start, end]) match only within the same coarse bucket or its
    * neighbor, so instead of a O(n·m) broadcast-nested-loop the
    * planner gets an equi key. `bucketWidth` must be ≥ the maximum
    * interval length (every interval then spans ≤ 2 buckets). */
  def bucketedRangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    val pb = points.withColumn("_bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val ib = intervals.withColumn("_bucket", explode(sequence(
      floor(col(startCol) / bucketWidth).cast("long"),
      floor(col(endCol) / bucketWidth).cast("long"))))
    pb.join(ib, Seq("_bucket"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bucket")
  }
}
