package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing contracts: schema, batch shape, frame slicing.
  * The decode step is a documented deterministic stub (no codecs in this
  * environment); everything around it is real and pinned here.
  */
class MultimodalSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import testImplicits._
    rows.toDF("doc_id", "text")
  }

  test("mediaTable: binary payload + typed metadata struct, kind by id mod 3") {
    val m = Multimodal.mediaTable(docs(0L -> "abc", 1L -> "defg", 2L -> "hi")).collect()
    val byId = m.map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Array[Byte]]("content"), r.getStruct(2)))).toMap
    assert(new String(byId(0L)._1, "UTF-8") == "abc")
    assert(byId(0L)._2.getAs[String]("kind") == "image")
    assert(byId(1L)._2.getAs[String]("kind") == "audio")
    assert(byId(2L)._2.getAs[String]("kind") == "video")
    assert(byId(1L)._2.getAs[Int]("n_bytes") == 4)
  }

  test("decodeStub: deterministic, brightness from real bytes") {
    val (w, h, c, b) = Multimodal.decodeStub("hello".getBytes("UTF-8"))
    assert((w, h, c) == ((64 + 5, 64 + (5 * 31) % 312, 3)))
    val expectedB = "hello".getBytes("UTF-8").map(_ & 0xff).sum.toDouble / 5 / 255.0
    assert(math.abs(b - expectedB) < 1e-12)
    assert(Multimodal.decodeStub(Array.empty[Byte]) == ((64, 64, 3, 0.0)))
  }

  test("decodeFeatures: mapPartitions output independent of batch size") {
    val m = Multimodal.mediaTable(docs((0L to 9L).map(i => i -> s"payload number $i with ${"x" * i.toInt}"): _*))
    def run(bs: Int) = Multimodal.decodeFeatures(m, batchSize = bs)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(run(1) == run(64))
    val r = run(4)
    assert(r.size == 10)
    // schema: doc_id, kind, n_bytes, width, height, channels, brightness
    assert(r.head.size == 7)
  }

  test("decoder SPI: provider-driven decode equals the stub; reflective selection works; absent runtime gates loudly") {
    val m = Multimodal.mediaTable(docs((0L to 9L).map(i => i -> s"payload $i ${"y" * i.toInt}"): _*))
    // explicit stub provider ≡ default (the oracle surface is unchanged)
    val viaSpi = Multimodal.decodeFeatures(m,
        provider = Multimodal.StubDecoderProvider())
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val default = Multimodal.decodeFeatures(m)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaSpi == default && viaSpi.size == 10)
    // reflective provider: a real codec class drops in WITHOUT touching
    // operator code — every row decodes through it
    val refl = Multimodal.ReflectiveDecoderProvider("graft.FixedTestDecoder")
    val fixed = Multimodal.decodeFeatures(m, provider = refl)
      .orderBy("doc_id").collect()
    assert(fixed.forall(r =>
      r.getAs[Int]("width") == 1 && r.getAs[Int]("height") == 2 &&
        r.getAs[Int]("channels") == 3 &&
        r.getAs[Double]("brightness") == r.getAs[Int]("n_bytes").toDouble))
    // a build without the codec jar fails at PROVIDER CONSTRUCTION with a
    // clear message, not NoClassDefFoundError mid-job
    val e = intercept[IllegalArgumentException] {
      Multimodal.ReflectiveDecoderProvider("com.example.MissingCodec")
    }
    assert(e.getMessage.contains("not on the classpath"))
    assert(!Multimodal.ReflectiveDecoderProvider.available("com.example.MissingCodec"))
    assert(Multimodal.ReflectiveDecoderProvider.available("graft.FixedTestDecoder"))
  }

  test("sampleFrames: frame count, tail frame length, content md5 stability") {
    val m = Multimodal.mediaTable(docs(1L -> ("a" * 25), 2L -> "bb"))
    val f = Multimodal.sampleFrames(m, frameBytes = 10, maxFrames = 5)
      .orderBy("doc_id", "frame_idx").collect()
    val one = f.filter(_.getAs[Long]("doc_id") == 1L)
    assert(one.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 1, 2))
    assert(one.map(_.getAs[Int]("frame_len")).toSeq == Seq(10, 10, 5))
    val two = f.filter(_.getAs[Long]("doc_id") == 2L)
    assert(two.length == 1 && two(0).getAs[Int]("frame_len") == 2)
    // identical content slices hash identically
    assert(one(0).getAs[String]("frame_md5") == one(1).getAs[String]("frame_md5"))
  }

  test("sampleFrames: maxFrames caps long payloads") {
    val m = Multimodal.mediaTable(docs(1L -> ("z" * 1000)))
    assert(Multimodal.sampleFrames(m, frameBytes = 10, maxFrames = 7).count() == 7)
  }

  test("frameNearDupPairs: shared frames pair up, disjoint payloads do not") {
    val a = "aaaaaaaaaa" + "bbbbbbbbbb" + "cccccccccc" // 3 frames at 10 bytes
    val b = "aaaaaaaaaa" + "bbbbbbbbbb" + "xxxxxxxxxx" // shares 2 of 3
    val c = "zzzzzzzzzz" * 3                            // 1 distinct frame
    val m = Multimodal.mediaTable(docs(1L -> a, 2L -> b, 3L -> c))
    val pairs = Multimodal.frameNearDupPairs(m, frameBytes = 10, tau = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.length == 1)
    assert(pairs.head._1 == 1L && pairs.head._2 == 2L)
    assert(math.abs(pairs.head._3 - 0.5) < 1e-9) // |∩|=2, |∪|=4
  }

  test("sceneSegments: identical-frame runs collapse to scenes with exact boundaries") {
    // payload = AA A B B C at 10 bytes/frame → scenes (0: A×2), (1: B×2), (2: C×1)
    val v = "aaaaaaaaaa" * 2 + "bbbbbbbbbb" * 2 + "cccccccccc"
    val single = "dddddddddd" // one frame → one scene
    val m = Multimodal.mediaTable(docs(1L -> v, 2L -> single))
    val scenes = Multimodal.sceneSegments(m, frameBytes = 10, maxFrames = 8)
      .orderBy("doc_id", "scene_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(scenes.toSeq == Seq(
      (1L, 0L, 2L, 0), // A-still: frames 0-1
      (1L, 1L, 2L, 2), // B-still: frames 2-3
      (1L, 2L, 1L, 4), // C: frame 4
      (2L, 0L, 1L, 0)))
  }

  test("perceptual hash: identical payloads collide; small edits stay within radius; banding equals brute force") {
    import testImplicits._
    import graft.operators.Multimodal
    val base = "the quick brown fox jumps over the lazy dog and keeps running far away" * 3
    val docs = Seq(
      (1L, base), (2L, base),                      // exact copy → hamming 0
      (3L, base.replace("quick", "quack")),        // small edit
      (4L, "completely different payload with other bytes entirely " * 4)
    ).toDF("doc_id", "text")
    val media = Multimodal.mediaTable(docs)
    val hashes = media.select(col("doc_id"),
        Multimodal.perceptualHash(col("content")).as("ph"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) == hashes(2L))
    assert(java.lang.Long.bitCount(hashes(1L) ^ hashes(3L)) <= 3)
    assert(java.lang.Long.bitCount(hashes(1L) ^ hashes(4L)) > 3)
    val pairs = Multimodal.phashNearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force twin from the collected hashes
    val ids = hashes.keys.toSeq.sorted
    val brute = (for {
      a <- ids; b <- ids if a < b
      if java.lang.Long.bitCount(hashes(a) ^ hashes(b)) <= 3
    } yield (a, b)).toSet
    assert(pairs == brute && pairs.contains((1L, 2L)))
  }
}

/** No-arg-constructible decoder for the reflective-SPI selection test —
  * stands in for a JNI/FFM codec class shipped with a cluster.
  */
class FixedTestDecoder extends graft.operators.Multimodal.MediaDecoder {
  override def decode(kind: String, bytes: Array[Byte]): graft.operators.Multimodal.Decoded =
    graft.operators.Multimodal.Decoded(1, 2, 3, bytes.length.toDouble)
}
