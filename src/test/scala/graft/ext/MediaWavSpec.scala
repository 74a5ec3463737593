package graft.ext

import graft.SparkSpec

class MediaWavSpec extends SparkSpec {

  private def wav(rate: Int, channels: Int)(samples: Int*): Media.WavAudio =
    Media.WavAudio(rate, channels, samples.map(_.toShort).toArray)

  test("encode → decode round-trips rate, channels, and samples") {
    val src = wav(8000, 2)(100, -100, 200, -200, 32767, -32768)
    val back = Media.decodeWav(Media.encodeWav(src))
    assert(back.sampleRate == 8000 && back.channels == 2)
    assert(back.samples.toSeq == src.samples.toSeq)
  }

  test("decoder skips unknown chunks (LIST/INFO with odd-size padding)") {
    val src = wav(16000, 1)(1, 2, 3)
    val canonical = Media.encodeWav(src)
    // splice an odd-sized LIST chunk between fmt and data (header = 12 bytes,
    // fmt chunk = 8+16 bytes, so data starts at offset 36)
    val pre = canonical.take(36)
    val post = canonical.drop(36)
    val payload = "INFOabc".getBytes("US-ASCII") // 7 bytes → pad to 8
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](7, 0, 0, 0) ++ payload :+ 0.toByte
    val got = Media.decodeWav(pre ++ list ++ post)
    assert(got.sampleRate == 16000 && got.samples.toSeq == src.samples.toSeq)
  }

  test("malformed payloads fail loudly") {
    val good = Media.encodeWav(wav(8000, 1)(1, 2, 3))
    intercept[IllegalArgumentException](Media.decodeWav("RIFX".getBytes ++ good.drop(4)))
    intercept[IllegalArgumentException](Media.decodeWav(good.take(10)))   // truncated
    intercept[IllegalArgumentException](Media.decodeWav(good.dropRight(2))) // data overrun
    // non-PCM format code rejected
    val nonPcm = good.clone(); nonPcm(20) = 3 // audioFormat: 1 → 3 (IEEE float)
    intercept[IllegalArgumentException](Media.decodeWav(nonPcm))
  }

  test("zero-crossings and peak on a known square wave") {
    import spark.implicits._
    val square = wav(8000, 1)(1000, 1000, -1000, -1000, 1000, 1000, -1000, -1000)
    val media = spark.createDataset(Seq(Media.MediaRow(7L, "audio/wav",
      Media.encodeWav(square))))
    val f = Media.wavFeatures(media).collect().head
    assert(f.n_frames == 8 && f.sample_rate == 8000)
    assert(f.zero_crossings == 3) // sign flips at frames 2, 4, 6
    assert(f.peak == 1000)
    assert(f.rms == 1000.0) // constant magnitude → RMS exact
    assert(f.duration_us == 1000L) // 8 frames at 8 kHz
  }

  test("synthesized corpus decodes end-to-end, deterministic") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val feats = Media.wavFeatures(Media.synthesizeWavFromDocuments(docs)).collect()
    assert(feats.length == docs.count())
    feats.foreach { f =>
      assert(f.n_frames == 50 + f.media_id % 200)
      assert(f.byte_len == 44 + f.n_frames * 2)
      assert(f.duration_us == f.n_frames * 1000000L / 8000)
      assert(f.peak <= 32768 && f.rms >= 0.0)
    }
    val again = Media.wavFeatures(Media.synthesizeWavFromDocuments(docs)).collect()
    assert(feats.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
  }
}
