package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.{MediaRow, Mp4Track}

/** ISO-BMFF (MP4) box-walker spec: a hand-computed fixture decode (both
  * v0 and v1 header layouts, the largesize and runs-to-EOF size
  * escapes), round-trip through the synthetic generator, and the
  * loud-failure contract — truncated boxes, the illegal 2..7 size gap,
  * non-printable fourcc bytes, short largesize, missing mandatory
  * boxes, zero timescale.
  */
class Mp4Spec extends SparkSpec {

  private def fixture(id: Long): Array[Byte] = {
    import spark.implicits._
    Multimodal.syntheticMp4(
      Seq(id).toDF("doc_id"), "doc_id").as[MediaRow].collect()(0).payload
  }

  private def decode1(payload: Array[Byte], id: Long = 99L): Seq[Mp4Track] =
    Multimodal.decodeMp4(Iterator(MediaRow(id, "video/mp4", payload))).toSeq

  test("decodeMp4: hand-computed census for id=0 (v0 headers, largesize mdat, free-to-EOF)") {
    // id=0: brand isom, mvTs 600, mvDur 500, 1 track (vide/avc1),
    // tkDur 200, mdTs 1000, mdDur 100, lang "and"; id%4=0 → mdat uses
    // the u64 largesize escape; id%5=0 → trailing size==0 free box
    assert(decode1(fixture(0L), 0L) ==
      Seq(Mp4Track(0L, "isom", 600L, 500L, 4, 1L, "vide", "avc1",
        200L, 1000L, 100L, "and")))
  }

  test("decodeMp4: id=7 exercises v1 mvhd/mdhd, multi-track, plain mdat, no free box") {
    // id=7: mv v1 (odd), 2 tracks; track0 tkhd v1 ((7+0)%2=1), mdhd v0;
    // track1 tkhd v0, mdhd v1 — all four version paths in one file
    val out = decode1(fixture(7L), 7L)
    assert(out == Seq(
      Mp4Track(7L, "mp42", 600L * 2, 507L, 3, 1L, "vide", "avc1",
        200L + 21 % 40000, 1000L * 4, 100L + 49, "hnd"),
      Mp4Track(7L, "mp42", 600L * 2, 507L, 3, 2L, "soun", "mp4a",
        200L + 28, 1000L * 1, 100L + 60, "ind")))
  }

  test("decodeMp4: synthetic formula holds across a range of ids") {
    (0L to 40L).foreach { id =>
      val out = decode1(fixture(id), id)
      assert(out.length == 1 + (id % 3).toInt, s"id=$id track count")
      out.zipWithIndex.foreach { case (tr, t) =>
        assert(tr.mv_timescale == 600L * (1 + id % 3), s"id=$id")
        assert(tr.mv_duration == 500L + id % 100000, s"id=$id")
        assert(tr.n_top_boxes == (if (id % 5 == 0) 4 else 3), s"id=$id")
        assert(tr.track_id == t + 1L, s"id=$id t=$t")
        assert(tr.handler == (if (t % 2 == 0) "vide" else "soun"))
        assert(tr.codec == (if (t % 2 == 0) "avc1" else "mp4a"))
        assert(tr.tk_duration == 200L + (3 * id + 7 * t) % 40000)
        assert(tr.md_timescale == 1000L * (1 + (id + t) % 4))
        assert(tr.md_duration == 100L + (7 * id + 11 * t) % 500000)
        assert(tr.lang == s"${('a' + ((id + t) % 26).toInt).toChar}nd")
      }
    }
  }

  test("decodeMp4: malformed payloads fail loudly") {
    val good = fixture(3L)

    // truncated: chop mid-box so a declared size overruns the container
    val trunc = intercept[IllegalArgumentException] {
      decode1(good.take(good.length - 5))
    }
    assert(trunc.getMessage.contains("overruns") ||
      trunc.getMessage.contains("truncated"))

    // a 7-byte tail cannot hold a box header
    assert(intercept[IllegalArgumentException] {
      decode1(good ++ Array.fill[Byte](7)(0))
    }.getMessage.contains("truncated box header"))

    // the illegal size gap: 2..7 is neither an escape nor a legal size
    val badSize = good.clone()
    badSize(0) = 0; badSize(1) = 0; badSize(2) = 0; badSize(3) = 5
    assert(intercept[IllegalArgumentException] {
      decode1(badSize)
    }.getMessage.contains("box size 5 < 8"))

    // non-printable fourcc byte
    val badCc = good.clone()
    badCc(4) = 0x01
    assert(intercept[IllegalArgumentException] {
      decode1(badCc)
    }.getMessage.contains("bad fourcc byte"))

    // largesize < 16 is impossible (header alone is 16 bytes)
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val shortLarge = be32(1) ++ "mdat".getBytes("US-ASCII") ++
      be32(0) ++ be32(12)
    assert(intercept[IllegalArgumentException] {
      decode1(shortLarge)
    }.getMessage.contains("largesize 12 < 16"))

    // mandatory boxes: no moov
    val noMoov = be32(16) ++ "ftyp".getBytes("US-ASCII") ++
      "isom".getBytes("US-ASCII") ++ be32(0)
    assert(intercept[IllegalArgumentException] {
      decode1(noMoov)
    }.getMessage.contains("no 'moov' box"))

    // zero mdhd timescale: the fixture's timescale bytes live at a
    // formula offset; rebuild via a doctored generator instead — zero
    // out the four bytes AFTER the known mdTs value pattern by
    // searching for the unique be32(mdTs) in the single-track id=1 file
    val f1 = fixture(1L) // 1 track, mdTs = 1000*(1+1%4) = 2000
    val tsBytes = be32(2000L)
    val at = f1.indices.find(i => i + 4 <= f1.length &&
      f1.slice(i, i + 4).sameElements(tsBytes)).get
    val zeroTs = f1.clone()
    (0 until 4).foreach(j => zeroTs(at + j) = 0)
    assert(intercept[IllegalArgumentException] {
      decode1(zeroTs)
    }.getMessage.contains("timescale is zero"))
  }
}
