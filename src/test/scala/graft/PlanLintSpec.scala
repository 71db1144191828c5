package graft

/** Plan lint across EVERY gated query: the scale guards the README
  * promises, enforced mechanically so a future edit can't silently
  * introduce an accidental cartesian/nested-loop join. Quadratic
  * scans that are the declared semantics are whitelisted explicitly
  * with the reason. */
class PlanLintSpec extends SparkSpec {

  /** Declared-quadratic (or broadcast-nested-loop-by-design) queries:
    * c5/c6 score a broadcast query set against the corpus — the
    * O(n·q) scan IS the semantics; their subquadratic siblings (c8,
    * c7/c10 IVF) are the scale paths. c7 itself no longer plans any
    * nested loop: assignment and probing run the CentroidIndex
    * kernels (one argmax per row), not a corpus × k join. */
  private val nestedLoopByDesign =
    Set("c5_cosine_neardup", "c6_ann_topk",
      // (c7/c10 left this list in round 6: their recall gates now read
      // the exact baseline from a persisted asset, so c6's declared
      // BNLJ no longer rides along — the gate plans are pure IVF
      // kernel-probed hash joins + the recall join)
      // t7's corpus-size factor rides a 1-ROW broadcast cross join
      // (the scalar-subquery shape; a nested loop over one row is a
      // constant) — not a data-dependent nested loop
      "t7_term_weights",
      // c13's ADC stage is an exhaustive broadcast scan BY DESIGN —
      // the same O(n·q) shape as c6, but each pair costs m table
      // adds over 16-byte codes instead of a 64-dim dot over 256-byte
      // vectors (the 32× working-set cut is the point); IVF
      // composition is the sublinear path, c7/c10
      "c13_pq_ann",
      // q31's tolerance gate zips two 1-ROW aggregates (sketch
      // estimate × exact distinct) — same scalar shape; Catalyst
      // folds any constant equi-key back to a cross join
      "q31_hll_union",
      // t18's quantile pick crosses the BIN-sized cumulative walk
      // (≤ ~2100 rows, log-bounded whatever the data) with a 1-row
      // total and a 3-row quantile list — sketch-sized constants,
      // never data
      "t18_quantile_sketch",
      // q25's grouped twin (round 16) crosses the per-GROUP total
      // table (5 rows) with the 2-row quantile list — the same
      // sketch-sized-constant shape as t18, never data (the data-side
      // joins are broadcast hash joins on (group, bin))
      "q25_percentiles",
      // t21's (N, avgdl) corpus scalar rides the same 1-ROW
      // broadcast cross join as t7's
      "t21_bm25_topk")

  /** Streaming gates execute the stream inside the query closure —
    * covered by StreamingSpec; skipped here to keep the lint fast. */
  private val streamingGates =
    Set("s1_stream_rollup", "s3_stream_dedup", "s4_stream_join",
      "s5_stream_static", "s6_stream_sessionize", "s7_foreach_batch_upsert",
      "s8_upsert_tx", "s9_tx_stream_read", "s10_tx_medallion",
      "s11_tx_cdc_snapshot", "s12_stream_left_join", "s13_tws_sessionize")

  test("no accidental cartesian or nested-loop joins in any gated plan") {
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!streamingGates(name)) {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"$name plans a CartesianProduct")
        if (!nestedLoopByDesign(name))
          assert(!plan.contains("BroadcastNestedLoopJoin"),
            s"$name plans a BroadcastNestedLoopJoin")
      }
    }
  }

  test("no interpreted python/UDF eval nodes in any gated plan") {
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!streamingGates(name)) {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        assert(!plan.contains("BatchEvalPython") && !plan.contains("ArrowEval"),
          s"$name plans a Python eval node")
      }
    }
  }
}
