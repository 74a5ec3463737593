package graft.ext

import graft.SparkSpec

class MediaPpmSpec extends SparkSpec {
  import spark.implicits._

  private def img(w: Int, h: Int)(px: Int*): Media.PpmImage =
    Media.PpmImage(w, h, px.map(_.toByte).toArray)

  test("encode → decode round-trips dims and raster") {
    val src = img(2, 2)(
      10, 11, 12,  20, 21, 22,
      30, 31, 32,  40, 41, 42)
    val back = Media.decodePpm(Media.encodePpm(src))
    assert(back.width == 2 && back.height == 2)
    assert(back.pixels.toSeq == src.pixels.toSeq)
  }

  test("decoder tolerates netpbm comments and loose header whitespace") {
    val raster = Array.tabulate[Byte](1 * 1 * 3)(_.toByte)
    val bytes = "P6\n# thumbnail source: cam-7\n  1\t1 #dims\n255\n"
      .getBytes("US-ASCII") ++ raster
    val got = Media.decodePpm(bytes)
    assert(got.width == 1 && got.height == 1 && got.pixels.toSeq == raster.toSeq)
  }

  test("malformed payloads fail loudly, never decode to garbage") {
    val good = Media.encodePpm(img(1, 1)(1, 2, 3))
    intercept[IllegalArgumentException](Media.decodePpm("P5\n1 1\n255\n abc".getBytes))
    intercept[IllegalArgumentException](Media.decodePpm(good.dropRight(1))) // short raster
    intercept[IllegalArgumentException](Media.decodePpm(good :+ 0.toByte))  // long raster
    intercept[IllegalArgumentException](
      Media.decodePpm("P6\n1 1\n65535\n".getBytes ++ new Array[Byte](6)))
    intercept[IllegalArgumentException](Media.decodePpm("P6\n1".getBytes))  // truncated
    // crafted dims whose w*h*3 overflows Int (65536*65536*3 ≡ 0 mod 2^32):
    // must throw on the header, never pass the length check with a tiny raster
    intercept[IllegalArgumentException](
      Media.decodePpm("P6\n65536 65536\n255\n".getBytes))
    intercept[IllegalArgumentException](
      Media.decodePpm("P6\n-1 4\n255\n".getBytes ++ new Array[Byte](12)))
  }

  test("nearest-neighbor resize picks the exact source pixels") {
    val src = img(2, 2)(
      1, 1, 1,  2, 2, 2,
      3, 3, 3,  4, 4, 4)
    val up = Media.resizePpm(src, 4, 4)
    // sx = x*2/4 → 0,0,1,1; sy likewise: each source pixel becomes a 2x2 block
    val vals = up.pixels.grouped(3).map(_.head.toInt).toSeq
    assert(vals == Seq(
      1, 1, 2, 2,
      1, 1, 2, 2,
      3, 3, 4, 4,
      3, 3, 4, 4))
    val down = Media.resizePpm(up, 2, 2)
    assert(down.pixels.toSeq == src.pixels.toSeq) // lossless for exact factors
  }

  test("synthesized corpus decodes end-to-end with predicted dims and sane stats") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val feats = Media.ppmFeatures(Media.synthesizePpmFromDocuments(docs)).collect()
    assert(feats.length == docs.count())
    feats.foreach { f =>
      assert(f.width == 4 + (f.media_id % 5).toInt)
      assert(f.height == 3 + (f.media_id % 4).toInt)
      assert(f.n_pixels == f.width.toLong * f.height)
      assert(f.byte_len == 11L + f.n_pixels * 3)
      Seq(f.mean_r, f.mean_g, f.mean_b).foreach(m => assert(m >= 0.0 && m <= 255.0))
    }
    // deterministic: a second pass is bit-identical
    val again = Media.ppmFeatures(Media.synthesizePpmFromDocuments(docs)).collect()
    assert(feats.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
  }

  test("aHash is invariant to byte-level noise within the luma bands and " +
      "separates genuinely different structure") {
    def img(bright: Int, bg: Int, row: Int, w: Int = 8, h: Int = 8): Array[Byte] =
      Media.encodePpm(Media.PpmImage(w, h, Array.tabulate[Byte](w * h * 3) { i =>
        (if ((i / 3) / w == row) bright else bg).toByte
      }))
    // same structure, different bytes (jittered brightness) → SAME hash
    val a = Media.ppmAHash(img(bright = 200, bg = 10, row = 3))
    val b = Media.ppmAHash(img(bright = 239, bg = 24, row = 3))
    assert(a == b)
    assert(a == 255L << 24, f"hash $a%x must be the analytic bright-row mask")
    // different structure → different hash
    assert(Media.ppmAHash(img(200, 10, row = 5)) != a)
    // resize path: a 16×16 with a two-row bright band hashes like the 8×8
    val big = Media.encodePpm(Media.PpmImage(16, 16,
      Array.tabulate[Byte](16 * 16 * 3) { i =>
        val r = (i / 3) / 16
        (if (r == 6 || r == 7) 200 else 10).toByte
      }))
    assert(Media.ppmAHash(big) == 255L << 24)
  }
}
