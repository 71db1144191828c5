package graft

import graft.core.TxTable
import graft.streaming.EventsStream

/** CROSS-PROCESS commit serialization: two separate JVMs racing
  * appends on one local-filesystem txtable must produce one
  * serialized history with zero lost commits. This is the case the
  * JVM-wide publish lock cannot cover and posix rename silently
  * breaks (rename REPLACES an existing destination) — the publish
  * primitive for `file:` roots is therefore a hard link
  * ([[graft.core.LogStore.HardLink]]), atomic across processes at
  * the `link(2)` syscall. */
class CommitRaceSpec extends SparkSpec {

  test("two JVMs x 12 appends: 24 serialized commits, all rows present") {
    import spark.implicits._
    val root = EventsStream.scratchDir("commit_race") + "/t"
    val t = TxTable(spark, root)
    t.overwrite(Seq(("seed", -1)).toDF("writer", "seq"))
    val v0 = t.latestVersion.get

    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val opens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util",
      "java.util.concurrent", "java.util.concurrent.atomic",
      "sun.nio.ch", "sun.nio.cs", "sun.security.action",
      "sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val n = 12
    def fork(writer: String): Process = {
      val cmd = (Seq(javaBin) ++ opens ++ Seq("-Xmx2g",
        "-Dspark.ui.enabled=false", "-cp", cp,
        "graft.tools.CommitRace", root, writer, n.toString))
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      pb.redirectOutput(java.io.File.createTempFile(s"race_$writer", ".log"))
      pb.start()
    }
    val (pa, pb) = (fork("procA"), fork("procB"))
    assert(pa.waitFor(300, java.util.concurrent.TimeUnit.SECONDS) &&
      pb.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
      "race processes timed out")
    assert(pa.exitValue() == 0 && pb.exitValue() == 0,
      s"writer process failed: A=${pa.exitValue()} B=${pb.exitValue()}")

    val h = TxTable(spark, root)
    // serialized: every append claimed exactly one version, none lost
    assert(h.latestVersion.get == v0 + 2 * n,
      s"expected ${v0 + 2 * n} after 2x$n racing appends, " +
        s"got ${h.latestVersion.get} — a commit was lost or doubled")
    val rows = h.read().where("seq >= 0")
      .select("writer", "seq").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    val expect = (for (w <- Seq("procA", "procB"); i <- 0 until n)
      yield (w, i)).toSet
    assert(rows == expect,
      s"lost rows: ${(expect -- rows).toSeq.sorted.take(5)}...")
    // every intermediate version replays cleanly (no torn manifests)
    (v0 to v0 + 2 * n by 5).foreach { v =>
      assert(h.readVersion(v).count() >= 1)
    }
  }
}
