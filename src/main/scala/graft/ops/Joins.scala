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

  /** As-of join: for each left row, the single right row with the
    * greatest `rightTime` ≤ the left row's `leftTime` within the same
    * `key` (DuckDB/kdb ASOF JOIN semantics, left-outer: unmatched
    * left rows keep null right columns).
    *
    * Implemented as union + ordered window carry, NOT a range
    * self-join: both sides shuffle ONCE on `key`, the per-key window
    * carries the latest right row forward with `last(_, ignoreNulls)`
    * over an unbounded-preceding frame, and left rows project it out.
    * At 100 TB that is one exchange per side + a per-key sort — no
    * candidate blowup, no broadcast requirement. Ties at equal
    * timestamps resolve to the right row (right rows sort before left
    * at the same instant, matching ASOF's ≤), and among equal right
    * timestamps the highest `rightOrd` wins.
    *
    * Output: all left columns plus the requested right columns
    * (renamed via `rightCols` mapping rightName -> outName). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[(String, String)], rightOrd: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val leftCols = left.columns.toSeq
    // the whole right payload rides in ONE struct so every projected
    // right column comes from the same matched row
    val rPayload = struct(rightCols.map { case (rc, out) => col(rc).as(out) }: _*)
    val r = right.select(col(key).as("_k"), col(rightTime).as("_t"),
      lit(0).as("_side"), col(rightOrd).as("_ord"), rPayload.as("_r"))
    val lAligned = left
      .select((Seq(col(key).as("_k"), col(leftTime).as("_t"),
        lit(1).as("_side"),
        lit(null).cast(r.schema("_ord").dataType).as("_ord"),
        lit(null).cast(r.schema("_r").dataType).as("_r")) ++
        leftCols.map(col)): _*)
    val rAligned = r.select((Seq(col("_k"), col("_t"), col("_side"),
      col("_ord"), col("_r")) ++
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    // right rows first at equal _t (side 0 < 1), then by _ord, so the
    // carried struct is the greatest (rightTime, ord) ≤ leftTime
    val w = Window.partitionBy("_k")
      .orderBy(col("_t").asc, col("_side").asc, col("_ord").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAligned.unionAll(rAligned)
      .withColumn("_c", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map { case (_, out) => col(s"_c.$out").as(out) }: _*)
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
