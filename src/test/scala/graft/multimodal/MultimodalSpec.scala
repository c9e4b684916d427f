package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** E03 (binary round-trip) + multimodal plumbing tests. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  test("E03: binary payload round-trips through parquet bit-exactly") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, dir)
    assert(media.schema("payload").dataType == BinaryType)
    val tmp = java.nio.file.Files.createTempDirectory("e03").toString
    media.write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp)
    val before = media.select($"doc_id", sha2($"payload", 256).as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = back.select($"doc_id", sha2($"payload", 256).as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before == after && before.size == 500)
  }

  test("binaryFile source ingests raw media files with glob filtering") {
    // the 100 TB ingest path: media lands as FILES, not table rows —
    // spark.read.format("binaryFile") turns a directory tree into
    // (path, modificationTime, length, content) with partition-parallel
    // listing; downstream is the same opaque-BINARY pipeline as E03
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("binsrc")
    val sub = java.nio.file.Files.createDirectory(tmp.resolve("nested"))
    val payloads = Map(
      "a.jpg" -> Array[Byte](1, 2, 3, 4),
      "b.jpg" -> Array.tabulate[Byte](300)(_.toByte),
      "skip.txt" -> Array[Byte](9, 9))
    payloads.foreach { case (name, bytes) =>
      val base = if (name == "b.jpg") sub else tmp
      java.nio.file.Files.write(base.resolve(name), bytes)
    }
    try {
      val df = spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.jpg")
        .option("recursiveFileLookup", "true")
        .load(tmp.toString)
        .select(element_at(split($"path", "/"), -1).as("name"),
          $"length", sha2($"content", 256).as("digest"))
      val rows = df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2))).toMap
      assert(rows.keySet == Set("a.jpg", "b.jpg"), "glob/recursion wrong")
      payloads.filter(_._1.endsWith(".jpg")).foreach { case (name, bytes) =>
        assert(rows(name)._1 == bytes.length)
        assert(rows(name)._2 == Multimodal.Codecs.sha256Hex(bytes))
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("batched feature extraction preserves rows and is deterministic") {
    val media = Multimodal.mediaTable(spark, dir).repartition(8)
    val f1 = Multimodal.extractImageFeatures(media, batchSize = 16)
      .collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractImageFeatures(media, batchSize = 500)
      .collect().sortBy(_.doc_id)
    assert(f1.length == 500)
    assert(f1.toSeq == f2.toSeq) // batch size cannot change results
    assert(f1.forall(f => f.width >= 64 && f.height >= 64 && f.channels == 3))
    assert(f1.forall(f => f.brightness > 0 && f.brightness < 1))
  }

  test("REAL codec: generated PNG/JPEG decode through extractImageFeatures " +
      "with exact dimensions, exact PNG brightness, and a corrupt-payload " +
      "sentinel (VERDICT r7 #7)") {
    import spark.implicits._
    def encode(fmt: String): Array[Byte] = {
      // 2×2 RGB: red, green, blue, white — total sample sum 6·255 over
      // 12 samples → mean brightness exactly 0.5
      val im = new java.awt.image.BufferedImage(2, 2,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      im.setRGB(0, 0, 0xFF0000); im.setRGB(1, 0, 0x00FF00)
      im.setRGB(0, 1, 0x0000FF); im.setRGB(1, 1, 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRecord(1L, "image/png", encode("png")),
      Multimodal.MediaRecord(2L, "image/jpeg", encode("jpg")),
      Multimodal.MediaRecord(3L, "image/png", Array[Byte](9, 9, 9))) // corrupt
      .toDS()
    def run() = Multimodal.extractImageFeatures(media, batchSize = 2)
      .collect().map(f => f.doc_id -> f).toMap
    val got = run()
    assert(got == run()) // deterministic
    val png = got(1L)
    assert((png.width, png.height, png.channels) == ((2, 2, 3)))
    assert(png.brightness == 0.5, s"png brightness ${png.brightness}")
    assert(png.byte_len == encode("png").length)
    val jpg = got(2L)
    // JPEG is lossy: dimensions and band count are exact, brightness is
    // only near the source's 0.5
    assert((jpg.width, jpg.height, jpg.channels) == ((2, 2, 3)))
    assert(math.abs(jpg.brightness - 0.5) < 0.2, s"jpg ${jpg.brightness}")
    val bad = got(3L)
    assert((bad.width, bad.height, bad.channels, bad.brightness) ==
      ((-1, -1, 0, 0.0)), s"corrupt payload: $bad")
  }

  test("frame sampling is a one-to-many generator keyed by doc") {
    val media = Multimodal.mediaTable(spark, dir)
    val frames = Multimodal.sampleFrames(media, stride = 4)
    val byDoc = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.size == 500)
    assert(byDoc.values.forall(_ >= 1))
  }

  test("REAL multi-frame codec: a generated 2-frame animated GIF decodes " +
      "to per-frame dims/brightness, stride is respected, corrupt emits " +
      "the sentinel row (VERDICT r8 task 7)") {
    import spark.implicits._
    // 3-frame animated GIF: solid black, solid white, solid black 2×2.
    // Black and white survive GIF palettization exactly, and frameStats
    // resolves palette indices to RGB — so brightness is exactly 0/1/0.
    def solid(rgb: Int): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(2, 2,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 to 1; y <- 0 to 1) im.setRGB(x, y, rgb)
      im
    }
    val gif = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val it = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
      assert(it.hasNext, "no JDK gif writer")
      val w = it.next()
      try {
        w.setOutput(ios)
        w.prepareWriteSequence(null)
        for (im <- Seq(solid(0x000000), solid(0xFFFFFF), solid(0x000000)))
          w.writeToSequence(new javax.imageio.IIOImage(im, null, null), null)
        w.endWriteSequence()
      } finally { w.dispose(); ios.close() }
      bos.toByteArray
    }
    // the decoder alone: 3 frames, exact dims/brightness per frame
    val frames = Multimodal.Codecs.decodeFrames(gif)
    assert(frames.isDefined, "JDK reader rejected its own gif")
    assert(frames.get.map { case (w, h, _, b) => (w, h, b) } ==
      Vector((2, 2, 0.0), (2, 2, 1.0), (2, 2, 0.0)), frames.get.toString)

    // through the operator: stride 2 keeps original frame indices 0, 2;
    // a single-frame PNG is one frame; corrupt bytes → one sentinel row
    val png = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(solid(0xFFFFFF), "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRecord(1L, "image/gif", gif),
      Multimodal.MediaRecord(2L, "image/png", png),
      Multimodal.MediaRecord(3L, "image/gif", Array[Byte](7, 7, 7)))
      .toDS()
    val got = Multimodal.extractFrameFeatures(media, stride = 2).collect()
      .groupBy(_.doc_id)
    assert(got(1L).map(f => (f.frame_idx, f.width, f.height, f.brightness))
      .sortBy(_._1).toSeq == Seq((0, 2, 2, 0.0), (2, 2, 2, 0.0)),
      got(1L).mkString(","))
    assert(got(2L).map(f => (f.frame_idx, f.width, f.height, f.brightness))
      .toSeq == Seq((0, 2, 2, 1.0)), got(2L).mkString(","))
    assert(got(3L).map(f => (f.frame_idx, f.width, f.height, f.channels,
      f.brightness)).toSeq == Seq((-1, -1, -1, 0, 0.0)),
      got(3L).mkString(","))

    // fake rows keep the deterministic stub (byte-window "frames")
    val fake = Seq(Multimodal.MediaRecord(9L, "image/fake",
      Array.tabulate[Byte](64)(_.toByte))).toDS()
    val fakeGot = Multimodal.extractFrameFeatures(fake, stride = 2).collect()
    assert(fakeGot.map(_.frame_idx).sorted.toSeq == Seq(0, 2),
      fakeGot.mkString(","))
    assert(fakeGot.forall(f => f.width >= 64 && f.channels == 3))
  }

  test("REAL resize codec: aspect-preserving downscale to exact target " +
      "dims with brightness preserved, fit-through identity, corrupt " +
      "sentinel (VERDICT r9 task 4)") {
    import spark.implicits._
    // 64×48 half-black/half-white: mean brightness exactly 0.5, and the
    // sharp edge is where bilinear resampling would drift a sloppy
    // implementation — tolerance bounds the PNG-roundtripped mean
    val big = {
      val im = new java.awt.image.BufferedImage(64, 48,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 48)
        im.setRGB(x, y, if (x < 32) 0x000000 else 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, "png", bos))
      bos.toByteArray
    }
    val small = { // 8×8, already within every bound below
      val im = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 8; y <- 0 until 8) im.setRGB(x, y, 0x808080)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, "png", bos))
      bos.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRecord(1L, "image/png", big),
      Multimodal.MediaRecord(2L, "image/png", small),
      Multimodal.MediaRecord(3L, "image/png", Array[Byte](5, 5, 5)), // corrupt
      Multimodal.MediaRecord(4L, "image/fake", Array[Byte](1, 2, 3)))
      .toDS()
    def run() = Multimodal.resizeImages(media, 32, 32, batchSize = 2)
      .collect().map(r => r.doc_id -> r).toMap
    val got = run()
    assert(got.mapValues(_.payload.toSeq).toMap ==
      run().mapValues(_.payload.toSeq).toMap) // deterministic
    // downscale: 64×48 into 32×32 → scale 1/2 → exactly 32×24, decodable,
    // brightness within bilinear+PNG tolerance of the source's 0.5
    val resized = Multimodal.Codecs.decodeImage(got(1L).payload)
    assert(resized.isDefined, "resized payload does not decode")
    val (w, h, c, bright) = resized.get
    assert((w, h, c) == ((32, 24, 3)), s"dims ${(w, h, c)}")
    assert(math.abs(bright - 0.5) < 0.02, s"brightness $bright")
    assert(got(1L).payload.length < big.length, "downscale grew the bytes")
    // fit-through: already-small image passes byte-identical
    assert(got(2L).payload.toSeq == small.toSeq, "fitting image was recoded")
    assert(got(2L).media_type == "image/png")
    // corrupt: visible sentinel, not a failed job
    assert(got(3L).media_type == "corrupt/image/png" &&
      got(3L).payload.isEmpty, s"corrupt row: ${got(3L)}")
    // fake rows pass through untouched
    assert(got(4L).payload.toSeq == Seq[Byte](1, 2, 3) &&
      got(4L).media_type == "image/fake")
  }

  test("resize preserves transparency: alpha survives the downscale " +
      "instead of compositing onto black (ADVICE r10), and opaque " +
      "sources stay 3-band") {
    // 64×64 fully-transparent left half, opaque white right half
    val src = {
      val im = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_ARGB)
      for (x <- 0 until 64; y <- 0 until 64)
        im.setRGB(x, y, if (x < 32) 0x00000000 else 0xFFFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, "png", bos))
      bos.toByteArray
    }
    val out = Multimodal.Codecs.resizeImage(src, 16, 16)
    assert(out.isDefined, "transparent PNG failed to resize")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.get))
    assert(img.getWidth == 16 && img.getHeight == 16)
    assert(img.getColorModel.hasAlpha,
      "alpha channel dropped by the resize re-encode")
    // deep inside the transparent half: alpha must still be 0 — the old
    // RGB buffer made this pixel OPAQUE BLACK
    assert(((img.getRGB(2, 8) >>> 24) & 0xFF) == 0,
      f"transparent pixel became 0x${img.getRGB(2, 8)}%08x")
    // deep inside the opaque half: still opaque white
    assert(img.getRGB(13, 8) == 0xFFFFFFFF,
      f"opaque pixel became 0x${img.getRGB(13, 8)}%08x")

    // opaque source (no alpha): output stays 3-band — the channel
    // contract downstream stats rely on is unchanged
    val opaque = {
      val im = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 64) im.setRGB(x, y, 0x808080)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, "png", bos))
      bos.toByteArray
    }
    val got = Multimodal.Codecs.decodeImage(
      Multimodal.Codecs.resizeImage(opaque, 16, 16).get)
    assert(got.exists { case (w, h, c, _) => (w, h, c) == ((16, 16, 3)) },
      got.toString)
  }

  test("sha2 on binary matches java MessageDigest (stub consistency)") {
    import spark.implicits._
    val media = Multimodal.mediaTable(spark, dir).limit(10)
    val viaSpark = media.toDF()
      .select($"doc_id", sha2($"payload", 256).as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaJvm = Multimodal.extractImageFeatures(media)
      .collect().map(f => f.doc_id -> f.sha256).toMap
    assert(viaSpark == viaJvm)
  }
}
