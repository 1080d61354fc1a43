package graft.corpus

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Deterministic synthetic images + codecs + fidelity metrics.
  *
  * Pure JDK (javax.imageio handles PNG and JPEG) — no external native libs.
  * Images are smooth 2-D sinusoid mixtures (low-frequency content) so JPEG
  * at high quality stays above the PSNR ≥ 40 dB gate from the baseline's
  * per-row image invariant. All generation is seeded by the image id —
  * byte-identical across runs and machines.
  */
object Images {

  /** Low-frequency RGB sinusoid mixture seeded by `id`. `jitter` nudges the
    * phase slightly — used to plant near-duplicate pairs whose perceptual
    * hashes collide within a small hamming distance.
    */
  def synth(id: Long, w: Int, h: Int, jitter: Double = 0.0): BufferedImage = {
    val rnd = new java.util.Random(id * 0x9E3779B97F4A7C15L + 1)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    // Luminance-dominant: one low-frequency luminance sinusoid + a small
    // per-channel tint. Chroma subsampling is JPEG's dominant loss on
    // synthetic gradients; keeping chroma energy low holds worst-case
    // round-trip PSNR ≈ 46 dB at q=0.95 (measured), vs ~37 dB for
    // independent saturated channels.
    val la = rnd.nextDouble() * 1.2 + 0.2
    val lb = rnd.nextDouble() * 1.2 + 0.2
    val lc = rnd.nextDouble() * math.Pi * 2 + jitter
    val tint = Array.fill(3)(
      (rnd.nextDouble() * 0.8 + 0.2, rnd.nextDouble() * 0.8 + 0.2,
        rnd.nextDouble() * math.Pi * 2 + jitter))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val fx = x.toDouble / w
        val fy = y.toDouble / h
        val lum = 0.5 + 0.38 * math.sin(2 * math.Pi * (la * fx + lb * fy) + lc)
        def ch(i: Int): Int = {
          val (a, b, c) = tint(i)
          val t = 0.08 * math.sin(2 * math.Pi * (a * fx + b * fy) + c)
          val v = math.max(0.0, math.min(1.0, lum + t))
          (v * 255.0).toInt & 0xFF
        }
        img.setRGB(x, y, (ch(0) << 16) | (ch(1) << 8) | ch(2))
        x += 1
      }
      y += 1
    }
    img
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def encodeJpeg(img: BufferedImage, quality: Float = 0.95f): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), params)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  def decode(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  /** Peak signal-to-noise ratio over 8-bit RGB; Double.PositiveInfinity for
    * identical pixels. The baseline gate is ≥ 40 dB for lossy formats.
    */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight, "dim mismatch")
    var se = 0.0
    var n = 0L
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        val pa = a.getRGB(x, y); val pb = b.getRGB(x, y)
        var s = 16
        while (s >= 0) {
          val d = ((pa >> s) & 0xFF) - ((pb >> s) & 0xFF)
          se += d.toDouble * d; n += 1
          s -= 8
        }
        x += 1
      }
      y += 1
    }
    if (se == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / (se / n))
  }

  /** 64-bit average-hash: area-average the grayscale image to 8×8, threshold
    * at the mean. Robust to re-encoding (JPEG round-trip flips ≤ a few bits);
    * near-dup suppression joins on 16-bit bands of this value and filters on
    * `bit_count(xor) ≤ t` (see [[graft.items.Items]]).
    */
  def phash(img: BufferedImage): Long = {
    val gw = 8; val gh = 8
    val acc = new Array[Double](gw * gh)
    val cnt = new Array[Long](gw * gh)
    val w = img.getWidth; val h = img.getHeight
    var y = 0
    while (y < h) {
      val gy = y * gh / h
      var x = 0
      while (x < w) {
        val gx = x * gw / w
        val p = img.getRGB(x, y)
        val gray = 0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) + 0.114 * (p & 0xFF)
        val i = gy * gw + gx
        acc(i) += gray; cnt(i) += 1
        x += 1
      }
      y += 1
    }
    var mean = 0.0
    var i = 0
    while (i < 64) { acc(i) /= math.max(cnt(i), 1L); mean += acc(i); i += 1 }
    mean /= 64.0
    var bits = 0L
    i = 0
    while (i < 64) { if (acc(i) >= mean) bits |= (1L << i); i += 1 }
    bits
  }

  def phashOfBytes(bytes: Array[Byte]): Long = phash(decode(bytes))

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
