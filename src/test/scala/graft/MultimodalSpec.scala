package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def assets = Multimodal.synthesizeAssets((0L until 30L).toDF("id"), "id")

  test("synthesized assets carry binary payloads and kind-specific metadata") {
    val a = assets.collect()
    assert(a.length == 30)
    assert(a.forall(_.getAs[Array[Byte]]("data").nonEmpty))
    val img = assets.filter($"kind" === "image").select("meta.width").head().getInt(0)
    assert(img == 640)
    val audio = assets.filter($"kind" === "audio").select("meta.sample_rate").head().getInt(0)
    assert(audio == 16000)
  }

  test("feature extraction is deterministic with fixed shape") {
    val f1 = Multimodal.extractFeatures(assets, dim = 16, batchSize = 7)
      .orderBy("asset_id").collect()
    val f2 = Multimodal.extractFeatures(assets, dim = 16, batchSize = 64)
      .orderBy("asset_id").collect()
    assert(f1.length == 30)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.getSeq[Float](3).length == 16)
      assert(a.getSeq[Float](3) == b.getSeq[Float](3)) // batch size can't change results
    }
  }

  test("frame sampling explodes every k-th frame of videos only") {
    val frames = Multimodal.sampleFrames(assets, everyK = 30)
    val perAsset = frames.groupBy("asset_id").count().collect()
    assert(perAsset.forall(_.getLong(1) == 4)) // 120 frames / 30
    val nVideos = assets.filter($"kind" === "video").count()
    assert(perAsset.length == nVideos)
  }

  test("resize plan clamps to max side preserving aspect") {
    val plan = Multimodal.resizePlan(assets, maxSide = 320).head()
    assert(plan.getInt(1) == 320 && plan.getInt(2) == 240)
  }
}
