package graft.ext

import graft.SparkSpec

class MediaY4mSpec extends SparkSpec {

  private def video(w: Int, h: Int, frames: Int): Media.Y4mVideo = {
    val fb = w * h * 3 / 2
    Media.Y4mVideo(w, h, 25, 1,
      Array.tabulate(frames)(fi => Array.tabulate[Byte](fb)(i => (fi * 10 + i % 10).toByte)))
  }

  test("encode → decode round-trips dims, rate, and every frame") {
    val src = video(4, 2, 3)
    val back = Media.decodeY4m(Media.encodeY4m(src))
    assert(back.width == 4 && back.height == 2)
    assert(back.fpsNum == 25 && back.fpsDen == 1)
    assert(back.frames.length == 3)
    (back.frames zip src.frames).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
  }

  test("parser tolerates unknown stream params and per-frame params") {
    val raster = Array.tabulate[Byte](4 * 2 * 3 / 2)(_.toByte)
    val bytes = "YUV4MPEG2 W4 H2 F30:1 Ip A128:117 C420mpeg2 XCOLORRANGE=FULL\n"
      .getBytes("US-ASCII") ++
      "FRAME Xsomething\n".getBytes("US-ASCII") ++ raster
    val got = Media.decodeY4m(bytes)
    assert(got.width == 4 && got.fpsNum == 30)
    assert(got.frames.length == 1 && got.frames.head.toSeq == raster.toSeq)
  }

  test("malformed payloads fail loudly") {
    val good = Media.encodeY4m(video(4, 2, 1))
    intercept[IllegalArgumentException](Media.decodeY4m("JUNK\n".getBytes))
    intercept[IllegalArgumentException](Media.decodeY4m(good.dropRight(1))) // short raster
    intercept[IllegalArgumentException]( // odd dims under 4:2:0
      Media.decodeY4m("YUV4MPEG2 W5 H3 F25:1\nFRAME\n".getBytes ++ new Array[Byte](22)))
    intercept[IllegalArgumentException]( // 4:4:4 chroma unsupported
      Media.decodeY4m("YUV4MPEG2 W4 H2 F25:1 C444\nFRAME\n".getBytes ++ new Array[Byte](24)))
    intercept[IllegalArgumentException]( // garbage between frames
      Media.decodeY4m(Media.encodeY4m(video(4, 2, 1)) ++ "NOISE\n".getBytes ++ new Array[Byte](12)))
  }

  test("frame sampling takes every stride-th frame with exact luma means") {
    import spark.implicits._
    val w = 4; val h = 2; val fb = w * h * 3 / 2
    // frame fi: luma plane constant fi*10 (chroma bytes differ, must not leak in)
    val v = Media.Y4mVideo(w, h, 25, 1, Array.tabulate(4)(fi =>
      Array.tabulate[Byte](fb)(i => if (i < w * h) (fi * 10).toByte else 99.toByte)))
    val media = spark.createDataset(Seq(Media.MediaRow(5L, "video/y4m", Media.encodeY4m(v))))
    val got = Media.sampleY4mFrames(media, stride = 2).collect().sortBy(_.frame_no)
    assert(got.map(_.frame_no).toSeq == Seq(0, 2))
    assert(got.map(_.mean_luma).toSeq == Seq(0.0, 20.0))
  }

  test("synthesized corpus decodes end-to-end, deterministic") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val feats = Media.y4mFeatures(Media.synthesizeY4mFromDocuments(docs)).collect()
    assert(feats.length == docs.count())
    feats.foreach { f =>
      assert(f.width == 4 + (f.media_id % 3).toInt * 2)
      assert(f.height == 2 + (f.media_id % 2).toInt * 2)
      assert(f.n_frames == 3 + f.media_id % 6)
      assert(f.duration_us == f.n_frames * 40000)
      assert(f.byte_len == 39 + f.n_frames * (6 + f.width * f.height * 3 / 2))
    }
    val again = Media.y4mFeatures(Media.synthesizeY4mFromDocuments(docs)).collect()
    assert(feats.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
  }
}
