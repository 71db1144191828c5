package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Multimodal, Similarity}

/** Multimodal plumbing over REAL in-JDK codecs: payloads are actual
  * PNG / WAV / PNG-frame-container bytes, decode goes through
  * ImageIO / AudioSystem, and tests pin the encode→decode roundtrip
  * exactly. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(spark, Tables.documents(spark, sf))

  test("synthetic media: real container bytes + typed meta for all docs") {
    val df = media.toDF().cache()
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(df.schema("bytes").dataType.typeName == "binary")
    assert(df.schema("meta").dataType.typeName == "struct")
    assert(df.select("kind").distinct().count() == 3)
    // every payload opens with its format's real magic bytes
    val heads = df.select(col("kind"), substring(col("bytes"), 1, 4).as("hd"))
      .distinct().collect()
    heads.foreach { r =>
      val hd = r.getAs[Array[Byte]]("hd")
      r.getString(0) match {
        case "image" => assert(hd.sameElements(Array(0x89.toByte, 'P', 'N', 'G')))
        case "audio" => assert(new String(hd, "US-ASCII") == "RIFF")
        case "video" => assert(new String(hd, "US-ASCII") == "GVID")
      }
    }
  }

  test("image decode reads the generator's dims back out of the PNG bytes") {
    val dec = Multimodal.decodeImages(media).toDF().cache()
    val img = dec.where(col("kind") === "image")
    // decoded dims ≡ the encode-side arithmetic, row by row
    assert(img.where(col("meta.width") =!= lit(16) + pmod(col("media_id"), lit(48)) ||
      col("meta.height") =!= lit(16) + pmod(col("media_id"), lit(32))).count() == 0)
    assert(dec.where(col("kind") =!= "image")
      .where(col("meta.width") =!= 0).count() == 0)
    val again = Multimodal.decodeImages(media).toDF()
    assert(dec.exceptAll(again).count() == 0)
  }

  test("resize resamples the raster and re-encodes: dims scale, bytes decode") {
    import spark.implicits._
    val resized = Multimodal.resizeImages(
      Multimodal.decodeImages(media), maxDim = 20).toDF().cache()
    val img = resized.where(col("kind") === "image")
    assert(img.where(col("meta.width") > 20 || col("meta.height") > 20).count() == 0)
    // the re-encoded bytes are REAL PNGs of exactly the claimed size
    val rows = img.select("bytes", "meta.width", "meta.height")
      .as[(Array[Byte], Int, Int)].take(10)
    assert(rows.nonEmpty)
    rows.foreach { case (b, w, h) =>
      val dims = Multimodal.JdkCodec.imageDims(b)
      assert(dims == (w, h))
    }
  }

  test("audio decode via AudioSystem: rate and sample count roundtrip") {
    import spark.implicits._
    val rows = media.filter(_.kind == "audio").take(5)
    assert(rows.nonEmpty)
    rows.foreach { m =>
      val (rate, samples) = Multimodal.JdkCodec.decodeWav(m.bytes)
      assert(rate == 16000)
      assert(samples.length == 160 * (1 + (m.media_id % 10)).toInt)
      assert(m.meta.durationMs == samples.length.toLong * 1000 / rate)
    }
  }

  test("frame sampling: bounded batch shape, no payload in output") {
    val frames = Multimodal.sampleFrames(media, everyMs = 1000, maxFrames = 8)
    val df = frames.toDF().cache()
    val videos = media.filter(_.kind == "video").count()
    assert(df.select("media_id").distinct().count() == videos)
    val perVideo = df.groupBy("media_id").count()
    assert(perVideo.where(col("count") > 8).count() == 0)
    assert(!df.columns.contains("bytes"))
  }

  test("feature extraction feeds the similarity operators") {
    import spark.implicits._
    val feats = Multimodal.extractFeatures(media, dim = 16)
      .toDF().withColumnRenamed("media_id", "vec_id")
      .withColumnRenamed("feature", "embedding")
    val dims = feats.select(size(col("embedding"))).distinct().collect()
    assert(dims.length == 1 && dims(0).getInt(0) == 16)
    // values bounded as promised by the codec stub
    val mm = feats.select(explode(col("embedding")).as("x"))
      .agg(min("x"), max("x")).collect()(0)
    assert(mm.getFloat(0) >= -1f && mm.getFloat(1) <= 1f)
    // pipes straight into ANN
    val topk = Similarity.annTopK(feats.select("vec_id", "embedding"),
      k = 3, queryStride = 100)
    assert(topk.count() > 0)
  }

  test("media features searched via IVF end-to-end with useful recall") {
    val feats = Multimodal.extractFeatures(media).toDF()
      .select(col("media_id").as("vec_id"), col("feature").as("embedding"))
    val k = 5
    val ivf = Similarity.annTopKIvf(feats, k = k, queryStride = 50,
      centroidStride = 20, nProbe = 6)
    val exact = Similarity.annTopK(feats, k = k, queryStride = 50)
    val hit = ivf.select("query_id", "neighbor_id")
      .intersect(exact.select("query_id", "neighbor_id")).count()
    val total = exact.count()
    assert(total > 0)
    val recall = hit.toDouble / total
    assert(recall >= 0.5, s"IVF recall over media features $recall < 0.5")
    // and through the PERSISTED index: identical to the inline IVF
    val dir = java.nio.file.Files.createTempDirectory("mediaivf").toString
    val centroids = feats.where(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    val idx = Similarity.buildIvfIndex(feats, centroids, dir)
    val queries = feats.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val persisted = Similarity.annTopKIvfFromIndex(spark, dir, queries, idx,
      k = k, nProbe = 6)
    assert(persisted.collect().toSeq == ivf.collect().toSeq)
  }

  test("payload-bearing writes size scan partitions by BYTES, not rows") {
    val io = new graft.core.ParquetIOManager(spark)
    val dir = java.nio.file.Files.createTempDirectory("mediaio").toString + "/media"
    val r = io.write(media.toDF(), dir)
    assert(r.rowCount == media.count())
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(dir)).getLength
    val conf = spark.conf
    val prevMax = conf.get("spark.sql.files.maxPartitionBytes")
    val prevOpen = conf.get("spark.sql.files.openCostInBytes")
    try {
      // quarter of the on-disk payload → the scan must split ~4 ways
      // regardless of how well the synthetic payload compresses
      val target = math.max(8L * 1024, bytes / 4)
      conf.set("spark.sql.files.maxPartitionBytes", target.toString)
      conf.set("spark.sql.files.openCostInBytes", "0")
      val parts = io.read(dir).rdd.getNumPartitions
      val expected = math.ceil(bytes.toDouble / target).toInt
      // one partition per maxPartitionBytes of PAYLOAD (±2 for file
      // boundaries): a row-count policy would give one partition here
      assert(parts >= math.max(2, expected - 2) && parts <= expected + 2,
        s"partitions $parts vs bytes/64KB = $expected (total $bytes bytes)")
    } finally {
      conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      conf.set("spark.sql.files.openCostInBytes", prevOpen)
    }
  }
}
