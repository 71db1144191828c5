package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.TypedAggregators.{Neighbor, TopK}

/** Property tests for the pure algorithmic cores: the TopK
  * aggregator's reduce/merge against the sort-take reference under
  * random inputs and random partition splits (partial-aggregation
  * correctness is exactly merge-associativity), and the retry
  * policy's backoff shape. Raw ScalaCheck (no scalatestplus bridge in
  * the offline cache): each Prop is checked and its result asserted. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** NaN-safe structural comparison (case-class == on a Double field
    * has NaN != NaN). */
  private def keys(ns: Seq[Neighbor]): Seq[(Long, Long)] =
    ns.map(n => (java.lang.Double.doubleToLongBits(n.s), n.id))

  private def reference(xs: Seq[(Double, Long)], k: Int): Seq[Neighbor] =
    xs.map { case (s, id) => Neighbor(s, id) }
      .sortWith { (a, b) =>
        val c = java.lang.Double.compare(a.s, b.s)
        c > 0 || (c == 0 && a.id < b.id)
      }
      .take(k)

  private val inputGen: Gen[List[(Double, Long)]] = Gen.listOf(for {
    s <- Gen.oneOf(Gen.choose(-1.0, 1.0), Gen.const(Double.NaN),
      Gen.const(0.0), Gen.const(1.0))
    id <- Gen.choose(0L, 50L)
  } yield (s, id))

  test("TopK reduce == sort-take reference (incl. NaN and score ties)") {
    check(Prop.forAll(inputGen, Gen.choose(1, 8)) { (xs, k) =>
      val agg = new TopK(k)
      keys(xs.foldLeft(agg.zero)(agg.reduce).items) == keys(reference(xs, k))
    })
  }

  test("TopK merge is partition-split invariant (partial aggregation safe)") {
    check(Prop.forAll(inputGen, Gen.choose(1, 8), Gen.choose(0, 100)) {
      (xs, k, cut) =>
        val agg = new TopK(k)
        val whole = xs.foldLeft(agg.zero)(agg.reduce)
        val at = if (xs.isEmpty) 0 else cut % (xs.size + 1)
        val (l, r) = xs.splitAt(at)
        val merged = agg.merge(
          l.foldLeft(agg.zero)(agg.reduce),
          r.foldLeft(agg.zero)(agg.reduce))
        keys(agg.finish(merged).items) == keys(agg.finish(whole).items) &&
          keys(agg.merge(whole, agg.zero).items) == keys(whole.items)
    })
  }

  test("retry backoff is monotone nondecreasing and capped") {
    import graft.core.CloudRetry._
    val p = RetryPolicy()
    check(Prop.forAll(Gen.choose(1, 100), Gen.choose(1, 100)) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      backoff(p, lo) <= backoff(p, hi) && backoff(p, hi) <= p.maxWaitSeconds
    })
  }

  private val bpeCorpusGen: Gen[List[String]] = Gen.nonEmptyListOf(for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString).map(_.take(30))

  test("BPE: pieces always concatenate back to word + end marker") {
    check(Prop.forAll(bpeCorpusGen, Gen.choose(0, 40)) { (words, nMerges) =>
      val wf = words.groupBy(identity).view
        .mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val m = graft.functions.BpeModel.train(wf, nMerges)
      words.distinct.forall { w =>
        val p = m.encodeWord(w)
        p.nonEmpty && p.forall(_.nonEmpty) &&
          p.mkString("") == w + graft.functions.BpeModel.EndMark
      }
    })
  }

  test("BPE: training is invariant under word-frequency input order") {
    check(Prop.forAll(bpeCorpusGen, Gen.choose(1, 30)) { (words, nMerges) =>
      val wf = words.groupBy(identity).view
        .mapValues(_.size.toLong).toSeq
      val a = graft.functions.BpeModel.train(wf, nMerges).merges.toSeq
      val b = graft.functions.BpeModel.train(wf.reverse, nMerges).merges.toSeq
      a == b
    })
  }

  test("V2 filter renaming: structure-preserving, total on supported shapes, " +
      "identity round-trips") {
    import org.apache.spark.sql.sources._
    val leafGen: Gen[Filter] = for {
      a <- Gen.oneOf("id", "name", "score", "weird col")
      v <- Gen.choose(-100, 100)
      f <- Gen.oneOf[Filter](EqualTo(a, v), GreaterThan(a, v), LessThan(a, v),
        GreaterThanOrEqual(a, v), LessThanOrEqual(a, v), EqualNullSafe(a, v),
        In(a, Array(v, v + 1)), IsNull(a), IsNotNull(a),
        StringStartsWith(a, "x"), StringEndsWith(a, "y"), StringContains(a, "z"))
    } yield f
    def treeGen(depth: Int): Gen[Filter] =
      if (depth == 0) leafGen
      else Gen.oneOf(leafGen,
        for (l <- treeGen(depth - 1); r <- treeGen(depth - 1)) yield And(l, r),
        for (l <- treeGen(depth - 1); r <- treeGen(depth - 1)) yield Or(l, r),
        treeGen(depth - 1).map(Not))
    val phys = Map("id" -> "c_001", "name" -> "c_002").withDefault(identity)
    val back = Map("c_001" -> "id", "c_002" -> "name").withDefault(identity)
    check(Prop.forAll(treeGen(3)) { f =>
      val renamed = graft.sources.GraftScan.renameFilter(f, phys)
      // total on every supported shape; attribute sets map exactly;
      // the inverse mapping round-trips to the original (In carries
      // an Array — compare via references + toString, not ==)
      renamed.isDefined &&
        renamed.get.references.sorted.toSeq ==
          f.references.map(phys).sorted.toSeq &&
        graft.sources.GraftScan.renameFilter(renamed.get, back)
          .map(_.toString).contains(f.toString)
    })
  }
}

/** Randomized as-of join equivalence: the window-carry implementation
  * against an in-memory brute force on one seeded dataset (runs on
  * Spark — kept to a single generated case for speed). */
class AsOfJoinRandomSpec extends SparkSpec {
  test("asOfJoin == brute force on seeded random data") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(42)
    val left = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong))
    val right = (1 to 200).map(i =>
      (1000L + i, rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong))
    val expected = left.map { case (lid, k, t) =>
      val m = right.filter(r => r._2 == k && r._3 <= t)
      // greatest rightTime, then greatest ord (id) — asOfJoin contract
      val best = if (m.isEmpty) None
        else Some(m.maxBy(r => (r._3, r._1))._1)
      (lid, best)
    }.toMap
    val out = graft.ops.Joins.asOfJoin(
      left.toDF("l_id", "k", "t"), right.toDF("r_id", "k", "rt"),
      "k", "t", "rt", Seq("r_id" -> "r_id"), "r_id")
    val got = out.select(col("l_id"), col("r_id")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got.size == left.size)
    assert(got == expected)
  }

  test("pageRank hand-model == DataFrame op on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = (1 to 60).map(_ =>
      (s"n${rnd.nextInt(12)}", s"n${rnd.nextInt(12)}"))
      .filter(e => e._1 != e._2).distinct
    // driver-side reference of the identical integer-micro spec
    val closed = (edges ++ edges.map(_.swap)).distinct
    val outdeg = closed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = closed.map(_._1).distinct.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val in = closed.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => pr(u) / outdeg(u) }.sum).toMap
      pr = pr.keys.map(v =>
        v -> (150000L + (850000L * in.getOrElse(v, 0L)) / 1000000L)).toMap
    }
    val got = graft.steps.GraphOps.pageRank(
      edges.toSeq.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == pr, s"mismatch: ${got.toSeq.sorted} vs ${pr.toSeq.sorted}")
  }
}
