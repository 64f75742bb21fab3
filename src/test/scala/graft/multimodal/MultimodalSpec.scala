package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  private lazy val texts: Map[Long, String] =
    Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("decode stub matches a driver-side recompute") {
    val rows = Multimodal.decodeStats(spark, sf).collect()
    assert(rows.length === texts.size)
    rows.foreach { r =>
      val bytes = texts(r.getAs[Long]("doc_id")).getBytes("UTF-8")
      assert(r.getAs[Long]("n_bytes") === bytes.length.toLong)
      assert(r.getAs[Long]("width") === 1 + (bytes(0) & 0xff) % 64)
      assert(r.getAs[Long]("height") === 1 + bytes.length % 48)
      assert(r.getAs[Double]("mean_byte") ===
        bytes.map(_ & 0xff).map(_.toLong).sum.toDouble / bytes.length)
    }
  }

  test("frame sampling emits ceil(n/stride) frames per doc") {
    val counts = Multimodal.sampleFrames(Multimodal.mediaRecords(spark, sf))
      .groupBy("doc_id").count().collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("count")).toMap
    texts.foreach { case (id, t) =>
      val n = t.getBytes("UTF-8").length
      val expected = (n + Multimodal.Stride - 1) / Multimodal.Stride
      assert(counts.getOrElse(id, 0L) === expected.toLong)
    }
  }

  test("binary metadata digest matches java.security sha-256") {
    val r = Multimodal.binaryMeta(spark, sf)
      .filter(col("doc_id") === 0).head()
    val md = java.security.MessageDigest.getInstance("SHA-256")
      .digest(texts(0L).getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(r.getAs[String]("sha256_hex") === md)
  }
}
