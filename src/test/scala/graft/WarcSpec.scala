package graft

import org.apache.spark.sql.functions._
import graft.sources.WarcRecords
import graft.streaming.EventsStream

/** WARC record reader/writer: framing roundtrip, byte fidelity,
  * malformed-record re-sync. */
class WarcSpec extends SparkSpec {

  private def ascii(s: String) = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  test("write → read roundtrip preserves every record and payload byte") {
    import spark.implicits._
    val dir = EventsStream.scratchDir("warc_rt")
    val in = (0 until 100).map(i =>
      (s"https://ex.com/doc/$i", s"payload body $i \u0000 binary-ish".getBytes("UTF-8")))
      .toDF("uri", "payload")
    WarcRecords.write(in.repartition(3), dir)
    val back = WarcRecords.read(spark, dir)
    assert(back.count() == 100)
    assert(back.where(col("warc_type") === "response").count() == 100)
    // byte fidelity: payload md5 matches per uri
    val got = back.select(col("target_uri").as("uri"), md5(col("payload")).as("h"))
    val want = in.select(col("uri"), md5(col("payload")).as("h"))
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
    // content_length is the framed octet count
    assert(back.where(col("content_length") =!= length(col("payload"))).count() == 0)
  }

  test("gzipped members (one gzip member per record) roundtrip identically") {
    import spark.implicits._
    val dir = EventsStream.scratchDir("warc_gz")
    val in = (0 until 50).map(i =>
      (s"https://ex.com/doc/$i", s"gz payload $i".getBytes("UTF-8")))
      .toDF("uri", "payload")
    WarcRecords.write(in.repartition(2), dir, gzip = true)
    // files land as .warc.gz, each a concatenation of per-record members
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.gz"))
    assert(files.length == 2)
    // multi-member layout is real: >1 gzip magic per file
    val raw = java.nio.file.Files.readAllBytes(files(0).toPath)
    val magics = raw.sliding(2).count(w => (w(0) & 0xff) == 0x1f && (w(1) & 0xff) == 0x8b)
    assert(magics > 1, s"expected concatenated per-record gzip members, saw $magics magic(s)")
    val back = WarcRecords.read(spark, dir)
    assert(back.count() == 50)
    val got = back.select(col("target_uri").as("uri"), md5(col("payload")).as("h"))
    val want = in.select(col("uri"), md5(col("payload")).as("h"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("non-ASCII target uris round-trip (UTF-8 headers)") {
    import spark.implicits._
    val dir = EventsStream.scratchDir("warc_utf8")
    val uris = Seq("https://ex.com/café", "https://ex.com/中文/doc")
    val in = uris.map(u => (u, s"body of $u".getBytes("UTF-8"))).toDF("uri", "payload")
    WarcRecords.write(in.repartition(1), dir)
    val back = WarcRecords.read(spark, dir)
    assert(back.count() == 2)
    assert(back.select("target_uri").as[String].collect().toSet == uris.toSet,
      "non-ASCII uri mangled through the header roundtrip")
    // multi-byte headers must not shift the payload framing
    assert(back.where(col("content_length") =!= length(col("payload"))).count() == 0)
  }

  test("malformed records are skipped by re-syncing to the next magic") {
    def rec(uri: String, body: String): Array[Byte] =
      ascii(s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n$body\r\n\r\n")
    val corruptNoLength =
      ascii("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: bad\r\n\r\nx\r\n\r\n")
    val corruptNegLength =
      ascii("WARC/1.0\r\nWARC-Target-URI: neg\r\nContent-Length: -1\r\n\r\n\r\n\r\n")
    val bytes = rec("https://a", "first") ++ corruptNoLength ++
      corruptNegLength ++
      rec("https://b", "second") ++
      // truncated trailing record: header claims more bytes than exist
      ascii("WARC/1.0\r\nContent-Length: 99999\r\n\r\nshort")
    val recs = WarcRecords.parseMember("m", bytes).toSeq
    assert(recs.map(_.target_uri) == Seq("https://a", "https://b"))
    assert(recs.map(r => new String(r.payload, "UTF-8")) == Seq("first", "second"))
  }

  test("garbage-only member yields zero records, no exception") {
    assert(WarcRecords.parseMember("m", ascii("not a warc at all")).isEmpty)
    assert(WarcRecords.parseMember("m", Array.emptyByteArray).isEmpty)
  }
}
