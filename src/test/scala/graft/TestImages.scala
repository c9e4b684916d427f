package graft

/** Shared deterministic test images for the image-dedup spec family
  * (StreamingImageDedupSpec, CorpusPipelineMediaSpec, the streaming
  * pipeline's media tests): a textured sine-gradient keyed by `seed`,
  * so equal seeds are byte-identical (Hamming 0), re-encodes/resizes/
  * brightness shifts stay within dHash distance, and distinct seeds
  * disagree on ~half the bits. */
object TestImages {
  def pattern(seed: Int, w: Int, h: Int,
      brightness: Int = 0): java.awt.image.BufferedImage = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val fx = 0.20 + 0.13 * (seed % 4)
    val fy = 0.11 + 0.17 * ((seed / 4) % 4)
    val ph = seed * 1.7
    for (y <- 0 until h; x <- 0 until w) {
      val v0 = 127.5 + 87.0 * math.sin(fx * x + fy * y + ph)
      val v = math.max(0, math.min(255, math.round(v0).toInt + brightness))
      im.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    im
  }

  def encode(im: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(im, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  /** PNG of the seed-keyed pattern at a small default size. */
  def png(seed: Int, w: Int = 48, h: Int = 36,
      brightness: Int = 0): Array[Byte] =
    encode(pattern(seed, w, h, brightness), "png")
}
