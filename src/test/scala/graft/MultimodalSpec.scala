package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.{ImageStats, MediaRow}

class MultimodalSpec extends SparkSpec {

  private def ppm(header: String, px: Array[Byte]): Array[Byte] =
    header.getBytes("US-ASCII") ++ px

  test("decodePpm: hand-computed 2x2 image, comment in header") {
    // R,G,B per pixel: (10,20,30) (40,50,60) (70,80,90) (100,110,120)
    val px = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val out = Multimodal.decodePpm(
      Iterator(MediaRow(7L, "image/x-portable-pixmap",
        ppm("P6\n# a comment\n2 2\n255\n", px)))).toSeq
    assert(out == Seq(ImageStats(7L, 2, 2, 255, 4L, 220L, 260L, 300L)))
  }

  test("decodePpm: high bytes are unsigned, maxval parsed") {
    val px = Array[Byte](-1, 0, -128) // 255, 0, 128 unsigned
    val out = Multimodal.decodePpm(
      Iterator(MediaRow(1L, "ppm", ppm("P6\n1 1\n65535\n", px)))).toSeq
    assert(out == Seq(ImageStats(1L, 1, 1, 65535, 1L, 255L, 0L, 128L)))
  }

  test("decodePpm: malformed payloads fail loudly, not as nulls") {
    intercept[IllegalArgumentException] { // wrong magic
      Multimodal.decodePpm(Iterator(MediaRow(1L, "ppm", "P5\n1 1\n255\n".getBytes ++ Array[Byte](0)))).toSeq
    }
    intercept[IllegalArgumentException] { // truncated raster
      Multimodal.decodePpm(Iterator(MediaRow(2L, "ppm", ppm("P6\n2 2\n255\n", Array[Byte](1, 2, 3))))).toSeq
    }
    intercept[IllegalArgumentException] { // header junk where an int should be
      Multimodal.decodePpm(Iterator(MediaRow(3L, "ppm", "P6\nx y\n255\n".getBytes))).toSeq
    }
  }

  test("syntheticPpm fixtures round-trip through the real parser") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 12L, 39L).toDF("id")
    val stats = Multimodal.extractImageStats(Multimodal.syntheticPpm(ids, "id"))
      .as[ImageStats].collect().sortBy(_.media_id)
    stats.foreach { s =>
      val id = s.media_id
      assert(s.width == 1 + (id % 8).toInt && s.height == 1 + (id % 5).toInt && s.maxval == 255)
      val expected = (0 until s.width * s.height * 3).map(j => (id * 31 + j) % 256)
      assert(s.r_sum == expected.zipWithIndex.filter(_._2 % 3 == 0).map(_._1).sum)
      assert(s.b_sum == expected.zipWithIndex.filter(_._2 % 3 == 2).map(_._1).sum)
    }
  }
}
