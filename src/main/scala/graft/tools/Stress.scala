package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}
import graft.ops.Dedup

/** Scale-stress harness (dev tool, not a gate): documents/embeddings
  * replicated Nx with re-keyed ids — every replica is an exact
  * duplicate of the base corpus, i.e. worst-case mass duplication —
  * timing the growth curve of the dedup family, the persisted-index
  * paths (IVF build+probe, signature build+probe), the cluster
  * assignment, and the composed cleaning pipeline. The bucketed/
  * banded paths should grow near-linearly (df-caps bound the hot
  * cliques); anything quadratic in replicas is a regression.
  * Usage: tools/run.sh graft.tools.Stress [SF_DIR] [factors...] */
object Stress {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    // optional section selector: "dedup" | "upsert" | "delete" | "all"
    val mode = args.drop(1).headOption.filterNot(_.forall(_.isDigit))
      .getOrElse("all")
    val numArgs = args.drop(1).filter(_.forall(_.isDigit))
    val factors = if (numArgs.nonEmpty) numArgs.map(_.toInt).toSeq
      else Seq(1, 2, 4)
    val spark = Sessions.local()
    val docsFull = Tables.documents(spark, d).cache()
    val base = docsFull.select("doc_id", "text").cache()
    val embBase = Tables.embeddings(spark, d)
      .select("vec_id", "embedding").cache()
    val n = base.count()
    def replicate(df: org.apache.spark.sql.DataFrame, key: String, f: Int) =
      (1 until f).foldLeft(df) { (acc, i) =>
        acc.unionAll(df.withColumn(key, col(key) + i * 10000000L))
      }
    def time(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (f <- factors if mode == "all" || mode == "dedup") {
      val c = replicate(base, "doc_id", f).cache(); c.count()
      val cFull = replicate(docsFull, "doc_id", f).cache(); cFull.count()
      val e = replicate(embBase, "vec_id", f).cache(); e.count()
      println(s"[stress] === factor $f (${n * f} docs, every doc x$f) ===")
      time(s"c1_exact x$f", Dedup.exactDedup(c))
      time(s"c2_lsh   x$f", Dedup.minHashLshPairs(c))
      time(s"c3_simhash x$f", Dedup.simHashPairs(c))
      // transitive closure under mass duplication: every base doc's
      // replicas form one clique → the pair graph is the worst case
      // for the component loop (df-caps bound the clique fan-out)
      time(s"c11_clusters x$f", Dedup.dupClusters(Dedup.minHashLshPairs(c)))
      // span dedup under mass duplication: every replica's every
      // 20-shingle is a duplicate, i.e. the removal-span shuffle is
      // maximal — growth should track duplicated MASS (≈ linear in f),
      // never pairs² (the min-agg canonical rule has no posting lists)
      time(s"c17_spans x$f", Dedup.dedupSpans(c))
      // wide-SRP + SemDeDup under mass duplication: replica cliques
      // are exactly the worst case the cap bounds — growth should
      // track clique OUTPUT (∝ f² per base pair, the result itself),
      // never uncapped corpus²
      time(s"c18_srp_wide x$f",
        graft.ops.Similarity.srpNearDupPairsWide(e))
      time(s"c19_semdedup x$f", graft.ops.Similarity.semDedup(e,
        e.where(col("vec_id") % 40 === 0)
          .select(col("vec_id").as("centroid_id"),
            col("embedding").as("cv"))))
      // persisted-signature-index path (c12): index the corpus, probe
      // a 10% "daily batch" — probe cost must track batch size, so
      // its growth across factors should stay well below the builds'
      val sigDir = graft.streaming.EventsStream.scratchDir(s"stress_sig_$f")
      var sigIdx: Dedup.SigIndex = null
      time(s"c12_sig_build x$f",
        { sigIdx = Dedup.buildSignatureIndex(
            c.where(col("doc_id") % 10 =!= 0), sigDir)
          spark.read.parquet(s"$sigDir/sigs") })
      time(s"c12_sig_probe x$f", Dedup.probeSignatureIndex(spark, sigIdx,
        c.where(col("doc_id") % 10 === 0)))
      // the rolling-ingest shape: FIXED daily batch against a corpus
      // index 1x/2x/4x — probe cost must stay ~flat (partition-pruned
      // bucket reads track the batch, not the corpus)
      time(s"c12_sig_probe_fixed x$f", Dedup.probeSignatureIndex(spark, sigIdx,
        base.where(col("doc_id") % 10 === 0)))
      // persisted-IVF path (c10): one-time build, partition-pruned probe
      val ivfDir = graft.streaming.EventsStream.scratchDir(s"stress_ivf_$f")
      val centroids = e.where(col("vec_id") % 40 === 0)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
      var ivfIdx: graft.functions.CentroidIndex = null
      time(s"c10_ivf_build x$f",
        { ivfIdx = graft.ops.Similarity.buildIvfIndex(e, centroids, ivfDir)
          spark.read.parquet(ivfDir) })
      val queries = e.where(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      time(s"c10_ivf_probe x$f", graft.ops.Similarity.annTopKIvfFromIndex(
        spark, ivfDir, queries, ivfIdx))
      // composed cleaning pipeline end-to-end under mass duplication
      time(s"p1_clean x$f", graft.steps.CleanCorpus.run(cFull))
      c.unpersist(); cFull.unpersist(); e.unpersist()
    }

    // keyed-upsert state growth: the s7 shape (read ENTIRE state,
    // re-reduce, rewrite all of it) vs the s8 shape (TxTable
    // copy-on-write merge: read+rewrite only buckets containing the
    // batch's keys). Fixed 16-key batch, state 1x/2x/4x — s7 must
    // grow ~linearly with the state, s8 with the touched fraction
    // (~|batch buckets|/nBuckets of it), which is the difference
    // between O(table) and O(batch) per microbatch at 100 TB.
    val evBase = Tables.events(spark, d)
      .select(col("event_id").as("key"), col("ts").as("last_ts"),
        col("value").as("last_value"))
    def latestPerKey(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("key").agg(
        max_by(struct(col("last_ts"), col("last_value")),
          col("last_ts")).as("m"))
        .select(col("key"), col("m.last_ts").as("last_ts"),
          col("m.last_value").as("last_value"))
    val batch = evBase.where(col("key") < 16).localCheckpoint(true)
    def timeAction(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def dirBytes(p: String): Long = {
      def sz(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(sz).sum
        else f.length()
      sz(new java.io.File(p))
    }
    for (f <- factors if mode == "all" || mode == "upsert") {
      val state = latestPerKey(
        (1 until f).foldLeft(evBase) { (acc, i) =>
          acc.unionAll(evBase.withColumn("key", col("key") + i * 10000000L))
        }).cache()
      val nKeys = state.count()
      println(s"[stress] === upsert state x$f ($nKeys keys, 16-key batch) ===")
      val s7Dir = graft.streaming.EventsStream.scratchDir(s"stress_s7_$f")
      state.write.mode("overwrite").parquet(s"$s7Dir/state_0")
      timeAction(s"s7_full_rewrite x$f") {
        latestPerKey(spark.read.parquet(s"$s7Dir/state_0").unionByName(batch))
          .write.mode("overwrite").parquet(s"$s7Dir/state_1")
      }
      println(s"[stress] s7_bytes_rewritten x$f: ${dirBytes(s"$s7Dir/state_1")}")
      val tDir = graft.streaming.EventsStream.scratchDir(s"stress_s8_$f") + "/t"
      val t = graft.core.TxTable(spark, tDir)
      timeAction(s"s8_tx_build x$f") {
        t.overwriteBucketed(state, Seq("key"), nBuckets = 256); ()
      }
      val before = t.fileEntries(t.latestVersion.get).map(_.path).toSet
      timeAction(s"s8_tx_merge x$f") {
        t.merge(batch)((existing, src) =>
          latestPerKey(existing.unionByName(src))); ()
      }
      val after = t.fileEntries(t.latestVersion.get).map(_.path)
      val newBytes = after.filterNot(before)
        .map(p => new java.io.File(s"$tDir/$p").length()).sum
      println(s"[stress] s8_bytes_rewritten x$f: $newBytes " +
        s"(${after.count(!before(_))} of ${after.size} files)")
      state.unpersist()
    }
    // row-level delete cost: copy-on-write vs deletion vectors. A
    // FIXED tiny delete (a handful of rows, spread so every file
    // holds one) against state 1x/2x/4x — the CoW rewrite must grow
    // ~linearly with the table (it rewrites every touched file) while
    // the MoR commit stays flat (one KB-scale vector side-file), the
    // O(bytes-of-touched-files) vs O(matching-rows) contrast that
    // decides whether a one-row GDPR delete is affordable at 100 TB.
    for (f <- factors if mode == "all" || mode == "delete") {
      val state = latestPerKey(
        (1 until f).foldLeft(evBase) { (acc, i) =>
          acc.unionAll(evBase.withColumn("key", col("key") + i * 10000000L))
        }).repartitionByRange(16, col("key")).localCheckpoint(true)
      val nKeys = state.count()
      val pred = col("key") % 99991 === 7 // ~1 row per 100k, every file
      println(s"[stress] === delete x$f ($nKeys keys, spread predicate) ===")
      val cDir = graft.streaming.EventsStream.scratchDir(s"stress_delc_$f") + "/t"
      val tc = graft.core.TxTable(spark, cDir)
      tc.overwrite(state)
      val cBefore = tc.fileEntries(tc.latestVersion.get).map(_.path).toSet
      timeAction(s"del_cow x$f") { tc.deleteWhere(pred); () }
      val cAfter = tc.fileEntries(tc.latestVersion.get).map(_.path)
      val cBytes = cAfter.filterNot(cBefore)
        .map(p => new java.io.File(s"$cDir/$p").length()).sum
      println(s"[stress] del_cow_bytes x$f: $cBytes " +
        s"(${cAfter.count(!cBefore(_))} files rewritten)")
      val mDir = graft.streaming.EventsStream.scratchDir(s"stress_delm_$f") + "/t"
      val tm = graft.core.TxTable(spark, mDir, deletionVectors = true)
      tm.overwrite(state)
      timeAction(s"del_mor x$f") { tm.deleteWhere(pred); () }
      val mEntries = tm.fileEntries(tm.latestVersion.get)
      val dvBytes = mEntries.flatMap(_.dvPath).distinct
        .map(p => new java.io.File(s"$mDir/$p").length()).sum
      println(s"[stress] del_mor_bytes x$f: $dvBytes " +
        s"(${mEntries.map(_.dvRows).sum} rows vectored, data files untouched)")
    }
    // ANN scaling: exact broadcast scan vs PQ/ADC scan vs persisted
    // IVF-PQ probe as the corpus replicates — the exact path grows
    // O(corpus × queries × dim); the ADC scan does the same pair
    // count at m table-adds per pair over 16-byte codes (FLOP and
    // working-set cut); the IVF-PQ probe reads only probed lists'
    // codes, so its growth should sit well under both.
    for (f <- factors if mode == "ann") {
      import graft.ops.Similarity
      val e = (1 until f).foldLeft(embBase) { (acc, i) =>
        acc.unionAll(embBase.withColumn("vec_id", col("vec_id") + i * 10000000L))
      }.localCheckpoint(true)
      val nv = e.count()
      println(s"[stress] === ann x$f ($nv vectors) ===")
      val unit = Similarity.unitVectors(e).localCheckpoint(true)
      val cb = Similarity.pqTrainCodebook(unit, m = 16)
      time(s"ann_exact x$f", Similarity.annTopK(e))
      time(s"ann_pq_adc x$f",
        Similarity.annTopKPq(e, codebookOverride = Some(cb)))
      val dir = graft.streaming.EventsStream.scratchDir(s"stress_ivfpq_$f")
      val centroids = e.where(col("vec_id") % 40 === 0)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
      var built: (graft.functions.CentroidIndex, graft.functions.PqCodebook) = null
      timeAction(s"ann_ivfpq_build x$f") {
        built = Similarity.buildIvfPqIndex(e, centroids, dir); ()
      }
      val queries = e.where(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      time(s"ann_ivfpq_probe x$f",
        Similarity.annTopKIvfPqFromIndex(spark, dir, queries,
          built._1, built._2, e, nProbe = 6))
    }
    spark.stop()
  }
}
