package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Multimodal, Similarity}

/** Multimodal plumbing: schema, batch shape, determinism — the parts
  * that stay when FakeCodec is swapped for a real decoder. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(spark, Tables.documents(spark, sf))

  test("synthetic media: binary payloads + typed meta for all docs") {
    val df = media.toDF().cache()
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(df.schema("bytes").dataType.typeName == "binary")
    assert(df.schema("meta").dataType.typeName == "struct")
    assert(df.select("kind").distinct().count() == 3)
    // payload sized ~2KB (64-hex sha repeated 32x)
    assert(df.select(min(length(col("bytes")))).collect()(0).getInt(0) == 2048)
  }

  test("image decode fills dims only for images, deterministically") {
    val dec = Multimodal.decodeImages(media).toDF().cache()
    val img = dec.where(col("kind") === "image")
    assert(img.where(col("meta.width") <= 0 || col("meta.height") <= 0).count() == 0)
    assert(dec.where(col("kind") =!= "image")
      .where(col("meta.width") =!= 0).count() == 0)
    val again = Multimodal.decodeImages(media).toDF()
    assert(dec.exceptAll(again).count() == 0)
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
}
