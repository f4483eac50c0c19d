package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** BMP decode/encode: own-writer round-trips (24-bit bottom-up and
  * top-down, 8-bit paletted), writer-independent proof through JDK
  * ImageIO in both directions, the rejection paths, and cross-format
  * hash equality with PNG.
  */
class BmpSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private def gradientRgb(id: Long, w: Int, h: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val g = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val p = (y * w + x) * 3
        rgb(p) = g.toByte; rgb(p + 1) = g.toByte; rgb(p + 2) = g.toByte
      }
    }
    rgb
  }

  test("24-bit round-trips, bottom-up and top-down, padded widths") {
    Seq((13, 7, false), (16, 9, true), (1, 1, false), (5, 3, true))
      .foreach { case (w, h, td) =>
        val rgb = gradientRgb(3L, w, h)
        val bmp = Multimodal.bmpEncode(w, h, rgb, topDown = td)
        assert(Multimodal.sniffFormat(bmp) == "bmp")
        val dec = Multimodal.decodeBmpPixels(bmp)
        assert(dec.isDefined, s"$w x $h td=$td")
        assert(dec.get._1 == w && dec.get._2 == h)
        assert(java.util.Arrays.equals(dec.get._3, rgb))
      }
  }

  test("8-bit paletted round-trips through the BGRA color table") {
    val w = 11; val h = 6
    val palette = Array.tabulate(48)(i => (i * 5 + 7).toByte) // 16 colors
    val idx = Array.tabulate(w * h)(i => (i % 16).toByte)
    val bmp = Multimodal.bmpEncodePaletted(w, h, idx, palette)
    val dec = Multimodal.decodeBmpPixels(bmp)
    assert(dec.isDefined)
    (0 until w * h).foreach { i =>
      val c = idx(i) & 0xff
      val p = i * 3
      assert(dec.get._3(p) == palette(c * 3) &&
        dec.get._3(p + 1) == palette(c * 3 + 1) &&
        dec.get._3(p + 2) == palette(c * 3 + 2), s"pixel $i")
    }
  }

  test("writer-independent: JDK ImageIO-written BMPs decode to the " +
    "same pixels, and our BMPs read back identically through ImageIO") {
    val w = 19; val h = 11
    val rgb = gradientRgb(5L, w, h)
    // theirs → ours
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val p = (y * w + x) * 3
        img.setRGB(x, y, ((rgb(p) & 0xff) << 16) |
          ((rgb(p + 1) & 0xff) << 8) | (rgb(p + 2) & 0xff))
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    val dec = Multimodal.decodeBmpPixels(bos.toByteArray)
    assert(dec.isDefined && java.util.Arrays.equals(dec.get._3, rgb))
    // ours → theirs
    val mine = Multimodal.bmpEncode(w, h, rgb)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(mine))
    assert(back != null && back.getWidth == w && back.getHeight == h)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val p = (y * w + x) * 3
        val expect = ((rgb(p) & 0xff) << 16) |
          ((rgb(p + 1) & 0xff) << 8) | (rgb(p + 2) & 0xff)
        assert((back.getRGB(x, y) & 0xffffff) == expect, s"($x,$y)")
      }
    }
  }

  test("rejection: RLE compression, truncation, undersized palette " +
    "index, bogus header size — all None") {
    val good = Multimodal.bmpEncode(8, 8, gradientRgb(1L, 8, 8))
    assert(Multimodal.decodeBmpPixels(good).isDefined)
    val rle = good.clone(); rle(30) = 1 // BI_RLE8
    assert(Multimodal.decodeBmpPixels(rle).isEmpty)
    assert(Multimodal
      .decodeBmpPixels(java.util.Arrays.copyOf(good, 60)).isEmpty)
    val badHdr = good.clone(); badHdr(14) = 12 // BITMAPCOREHEADER
    assert(Multimodal.decodeBmpPixels(badHdr).isEmpty)
  }

  test("resizeBmp floor-maps and re-encodes; imageQualityStats and " +
    "aHash agree with a PNG of the same pixels") {
    val w = 40; val h = 20
    val rgb = gradientRgb(9L, w, h)
    val bmp = Multimodal.bmpEncode(w, h, rgb)
    val rz = Multimodal.resizeBmp(bmp, 10)
    assert(rz.isDefined && rz.get._1 == 10 && rz.get._2 == 5)
    val dec = Multimodal.decodeBmpPixels(rz.get._3).get
    (0 until 5).foreach { y =>
      (0 until 10).foreach { x =>
        val sx = x * w / 10; val sy = y * h / 5
        assert(dec._3((y * 10 + x) * 3) == rgb((sy * w + sx) * 3))
      }
    }
    val png = Multimodal.pngEncode(w, h, rgb)
    assert(Multimodal.aHashBits(bmp).get
      .sameElements(Multimodal.aHashBits(png).get))
    assert(Multimodal.dHashBits(bmp).get
      .sameElements(Multimodal.dHashBits(png).get))
  }
}
