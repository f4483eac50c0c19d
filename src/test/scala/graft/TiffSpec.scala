package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** Baseline TIFF decode/encode: own-writer round-trips (gray/RGB,
  * single/multi-strip), writer-independent proof through JDK ImageIO
  * both directions, WhiteIsZero inversion, rejection paths, and
  * cross-format hash equality with PNG.
  */
class TiffSpec extends AnyFunSuite {
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

  test("gray and RGB round-trip, single strip and multi-strip") {
    Seq((17, 9, true, Int.MaxValue), (16, 10, false, 3),
      (5, 7, true, 2), (1, 1, false, Int.MaxValue)).foreach {
      case (w, h, gray, rps) =>
        val rgb = gradientRgb(2L, w, h)
        val t = Multimodal.tiffEncode(w, h, rgb, grayscale = gray,
          rowsPerStrip = rps)
        assert(Multimodal.sniffFormat(t) == "tiff")
        val dec = Multimodal.decodeTiffPixels(t)
        assert(dec.isDefined, s"$w x $h gray=$gray rps=$rps")
        assert(dec.get._1 == w && dec.get._2 == h)
        assert(java.util.Arrays.equals(dec.get._3, rgb))
    }
  }

  test("writer-independent: ImageIO-written TIFFs decode to the same " +
    "pixels, and our TIFFs read back identically through ImageIO") {
    val w = 21; val h = 13
    val rgb = gradientRgb(6L, w, h)
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
    assert(javax.imageio.ImageIO.write(img, "tiff", bos))
    val theirs = bos.toByteArray
    val dec = Multimodal.decodeTiffPixels(theirs)
    // ImageIO may emit compressed TIFF; only assert when it wrote
    // baseline uncompressed — and in that case pixels must be exact
    dec.foreach(d => assert(java.util.Arrays.equals(d._3, rgb)))
    val mine = Multimodal.tiffEncode(w, h, rgb)
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
    // and the multi-strip + grayscale variants through ImageIO too
    // (raw raster samples — getRGB would run gray through a color
    // space conversion and shift the values)
    Seq(Multimodal.tiffEncode(w, h, rgb, rowsPerStrip = 4),
      Multimodal.tiffEncode(w, h, rgb, grayscale = true)).foreach { t =>
      val b2 = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(t))
      assert(b2 != null && b2.getWidth == w)
      assert(b2.getRaster.getSample(3, 2, 0) ==
        (rgb((2 * w + 3) * 3) & 0xff))
    }
  }

  test("WhiteIsZero grayscale inverts; unsupported shapes reject") {
    val w = 6; val h = 4
    val rgb = gradientRgb(1L, w, h)
    val t = Multimodal.tiffEncode(w, h, rgb, grayscale = true)
    // flip PhotometricInterpretation (tag 262) from 1 to 0 in place:
    // tags are sorted; find the entry by scanning the IFD
    var e = 10
    var flipped = false
    while (!flipped && e < 10 + 9 * 12) {
      if ((t(e) & 0xff) == 6 && (t(e + 1) & 0xff) == 1) { // 0x0106 LE
        t(e + 8) = 0; flipped = true
      }
      e += 12
    }
    assert(flipped)
    val dec = Multimodal.decodeTiffPixels(t)
    assert(dec.isDefined)
    (0 until w * h).foreach { i =>
      assert((dec.get._3(i * 3) & 0xff) == 255 - (rgb(i * 3) & 0xff))
    }
    val lzw = Multimodal.tiffEncode(w, h, rgb)
    var e2 = 10
    while (e2 < 10 + 9 * 12) {
      if ((lzw(e2) & 0xff) == 3 && (lzw(e2 + 1) & 0xff) == 1)
        lzw(e2 + 8) = 5 // Compression = LZW
      e2 += 12
    }
    assert(Multimodal.decodeTiffPixels(lzw).isEmpty)
    assert(Multimodal.decodeTiffPixels(t.take(20)).isEmpty)
  }

  test("LZW and PackBits round-trip raw buffers, across width bumps " +
    "and the 4094-entry table reset") {
    // deterministic LCG buffer large enough to push the LZW table
    // through 511/1023/2047 width bumps and past the 4094 reset
    var s = 12345L
    val big = Array.fill(300000) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % 7).toByte // small alphabet → deep table
    }
    Seq(big, big.take(40000), Array.fill(5000)(42.toByte),
      Array[Byte](1), Array.tabulate(256)(_.toByte)).foreach { buf =>
      val lz = Multimodal.tiffLzwEncode(buf)
      val back = Multimodal.tiffLzwDecode(lz, buf.length)
      assert(back.isDefined && java.util.Arrays.equals(back.get, buf),
        s"lzw len=${buf.length}")
      val pb = Multimodal.packBitsEncode(buf)
      val pback = Multimodal.packBitsDecode(pb, buf.length)
      assert(pback.isDefined && java.util.Arrays.equals(pback.get, buf),
        s"packbits len=${buf.length}")
      // runs compress: the constant buffer must shrink hard
      if (buf.length == 5000) {
        assert(pb.length < 100 && lz.length < 400)
      }
    }
    // truncated streams reject, never mis-size
    val lz = Multimodal.tiffLzwEncode(big.take(1000))
    assert(Multimodal.tiffLzwDecode(lz.take(lz.length / 2), 1000).isEmpty)
    assert(Multimodal.packBitsDecode(Array[Byte](5, 1, 2), 6).isEmpty)
  }

  test("compressed-strip TIFFs round-trip: LZW (± predictor 2) and " +
    "PackBits, gray and RGB, single and multi-strip") {
    for {
      (comp, pred) <- Seq((5, 1), (5, 2), (32773, 1))
      gray <- Seq(true, false)
      rps <- Seq(Int.MaxValue, 3)
    } {
      val w = 19; val h = 11
      val rgb = gradientRgb(4L, w, h)
      val t = Multimodal.tiffEncode(w, h, rgb, grayscale = gray,
        rowsPerStrip = rps, compression = comp, predictor = pred)
      val dec = Multimodal.decodeTiffPixels(t)
      assert(dec.isDefined, s"comp=$comp pred=$pred gray=$gray rps=$rps")
      assert(dec.get._1 == w && dec.get._2 == h)
      assert(java.util.Arrays.equals(dec.get._3, rgb),
        s"comp=$comp pred=$pred gray=$gray rps=$rps")
    }
  }

  test("writer-independent compressed: ImageIO LZW/PackBits TIFFs " +
    "decode exact, and ours read back through ImageIO") {
    val w = 23; val h = 17
    val rgb = gradientRgb(9L, w, h)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val p = (y * w + x) * 3
        img.setRGB(x, y, ((rgb(p) & 0xff) << 16) |
          ((rgb(p + 1) & 0xff) << 8) | (rgb(p + 2) & 0xff))
      }
    }
    Seq("LZW", "PackBits").foreach { ctype =>
      val wr = javax.imageio.ImageIO
        .getImageWritersByFormatName("tiff").next()
      val param = wr.getDefaultWriteParam
      param.setCompressionMode(
        javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionType(ctype)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      wr.setOutput(ios)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); wr.dispose()
      val theirs = bos.toByteArray
      val dec = Multimodal.decodeTiffPixels(theirs)
      assert(dec.isDefined, s"ImageIO $ctype stream must decode")
      assert(dec.get._1 == w && dec.get._2 == h)
      assert(java.util.Arrays.equals(dec.get._3, rgb), s"ImageIO $ctype")
    }
    // and the reverse: our compressed output reads back via ImageIO
    Seq(Multimodal.tiffEncode(w, h, rgb, compression = 5),
      Multimodal.tiffEncode(w, h, rgb, compression = 5, predictor = 2),
      Multimodal.tiffEncode(w, h, rgb, compression = 32773,
        rowsPerStrip = 4)).foreach { mine =>
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
  }

  test("tiled TIFFs round-trip: none/LZW(±predictor 2)/PackBits, " +
    "gray and RGB, edge tiles padded (dims not multiples of 16)") {
    for {
      (comp, pred) <- Seq((1, 1), (5, 1), (5, 2), (32773, 1))
      gray <- Seq(true, false)
      (w, h) <- Seq((19, 11), (33, 32), (16, 16))
    } {
      val rgb = gradientRgb(12L, w, h)
      val t = Multimodal.tiffEncode(w, h, rgb, grayscale = gray,
        compression = comp, predictor = pred, tileSize = 16)
      val dec = Multimodal.decodeTiffPixels(t)
      assert(dec.isDefined, s"comp=$comp pred=$pred gray=$gray $w x$h")
      assert(dec.get._1 == w && dec.get._2 == h)
      assert(java.util.Arrays.equals(dec.get._3, rgb),
        s"comp=$comp pred=$pred gray=$gray $w x$h")
    }
  }

  test("writer-independent tiled: ImageIO tiled LZW/PackBits TIFFs " +
    "decode exact, and our tiled output reads back through ImageIO") {
    val w = 37; val h = 29 // 3×2 tiles of 16, both edges padded
    val rgb = gradientRgb(15L, w, h)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val p = (y * w + x) * 3
        img.setRGB(x, y, ((rgb(p) & 0xff) << 16) |
          ((rgb(p + 1) & 0xff) << 8) | (rgb(p + 2) & 0xff))
      }
    }
    Seq("LZW", "PackBits").foreach { ctype =>
      val wr = javax.imageio.ImageIO
        .getImageWritersByFormatName("tiff").next()
      val param = wr.getDefaultWriteParam
      param.setCompressionMode(
        javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionType(ctype)
      param.setTilingMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setTiling(16, 16, 0, 0)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      wr.setOutput(ios)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); wr.dispose()
      val theirs = bos.toByteArray
      val dec = Multimodal.decodeTiffPixels(theirs)
      assert(dec.isDefined, s"ImageIO tiled $ctype stream must decode")
      assert(dec.get._1 == w && dec.get._2 == h)
      assert(java.util.Arrays.equals(dec.get._3, rgb),
        s"ImageIO tiled $ctype")
    }
    Seq(Multimodal.tiffEncode(w, h, rgb, compression = 5,
      tileSize = 16),
      Multimodal.tiffEncode(w, h, rgb, compression = 5, predictor = 2,
        tileSize = 16),
      Multimodal.tiffEncode(w, h, rgb, compression = 32773,
        tileSize = 32)).foreach { mine =>
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
  }

  test("resizeTiff floor-maps; hashes agree with a PNG of the same " +
    "pixels") {
    val w = 32; val h = 16
    val rgb = gradientRgb(8L, w, h)
    val t = Multimodal.tiffEncode(w, h, rgb, rowsPerStrip = 5)
    val rz = Multimodal.resizeTiff(t, 8)
    assert(rz.isDefined && rz.get._1 == 8 && rz.get._2 == 4)
    val dec = Multimodal.decodeTiffPixels(rz.get._3).get
    assert((dec._3(0) & 0xff) == (rgb(0) & 0xff))
    val png = Multimodal.pngEncode(w, h, rgb)
    assert(Multimodal.aHashBits(t).get
      .sameElements(Multimodal.aHashBits(png).get))
    assert(Multimodal.dHashBits(t).get
      .sameElements(Multimodal.dHashBits(png).get))
  }
}
