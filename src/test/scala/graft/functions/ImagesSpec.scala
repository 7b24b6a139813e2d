package graft.functions

import graft.SparkSpec
import graft.tools.GenImages
import org.apache.spark.sql.functions._

/** Image codec + perceptual-hash tier: native header parsers, pixel
  * decoders (bit-exact round-trips for BMP/PNG, GIF cross-checked against
  * ImageIO), hash invariances, and the banded near-dedup pipeline. */
class ImagesSpec extends SparkSpec {

  private val w = 40; private val h = 24
  private def px: Array[Int] = GenImages.pattern(7, w, h)

  test("image meta parses all four native header formats and rejects junk") {
    assert(ImageKernels.imageMeta(ImageKernels.encodeBmp(w, h, px)) == ("bmp", w, h, 0))
    assert(ImageKernels.imageMeta(ImageKernels.encodePng(w, h, px)) == ("png", w, h, 0))
    assert(ImageKernels.imageMeta(ImageKernels.encodeGifHeader(300, 200)) == ("gif", 300, 200, 0))
    assert(ImageKernels.imageMeta(ImageKernels.encodeJpegHeader(640, 480, 6)) == ("jpeg", 640, 480, 6))
    assert(ImageKernels.imageMeta("not an image at all".getBytes) == null)
    assert(ImageKernels.imageMeta(Array[Byte](0x42, 0x4D)) == null) // truncated BMP
  }

  test("JPEG meta tolerates 0xFF fill bytes before markers (ITU T.81 B.1.1.2)") {
    // inject fill bytes between segments of a valid header stream: the spec
    // permits any number of 0xFF pad bytes before a marker, and a doubled
    // 0xFF must not be misread as marker 0xFF with a bogus length
    val clean = ImageKernels.encodeJpegHeader(640, 480, 6)
    val padded = new java.io.ByteArrayOutputStream()
    padded.write(clean, 0, 2) // SOI
    padded.write(0xFF); padded.write(0xFF); padded.write(0xFF) // fill run
    padded.write(clean, 2, clean.length - 2)
    assert(ImageKernels.imageMeta(padded.toByteArray) == ("jpeg", 640, 480, 6))
    // a file that ENDS in a fill run (truncated mid-pad) parses what it has
    val tail = clean.dropRight(2) ++ Array.fill(5)(0xFF.toByte)
    assert(ImageKernels.imageMeta(tail) == ("jpeg", 640, 480, 6))
  }

  test("Adam7 interlaced PNG decodes bit-exactly, agreeing with ImageIO") {
    for ((ww, hh) <- Seq((40, 24), (17, 9), (8, 8), (3, 2), (1, 1))) {
      val p = GenImages.pattern(21, ww, hh)
      val enc = ImageKernels.encodePngInterlaced(ww, hh, p)
      val g = ImageKernels.decodeGrayPublic(enc)
      assert(g != null && g.w == ww && g.h == hh, s"${ww}x$hh")
      assert(g.px.toSeq == p.toSeq, s"lossless at ${ww}x$hh")
      // external ground truth: the platform decoder reads the same file
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
      assert(img != null, "fixture must be a valid PNG for ImageIO")
      // raster samples, not getRGB: Java's CS_GRAY -> sRGB conversion
      // rescales gray values; the raw sample is the decoded byte
      (0 until hh).foreach(y => (0 until ww).foreach { x =>
        assert(img.getRaster.getSample(x, y, 0) == p(y * ww + x), s"($x,$y) at ${ww}x$hh")
      })
    }
  }

  test("8-bpp palette and RLE8 BMPs decode bit-exactly, agreeing with ImageIO") {
    for (rle <- Seq(false, true); (ww, hh) <- Seq((40, 24), (17, 9), (5, 3))) {
      val p = GenImages.pattern(23, ww, hh)
      val enc = ImageKernels.encodeBmp8(ww, hh, p, rle)
      val g = ImageKernels.decodeGrayPublic(enc)
      assert(g != null && g.w == ww && g.h == hh, s"rle=$rle ${ww}x$hh")
      assert(g.px.toSeq == p.toSeq, s"lossless rle=$rle at ${ww}x$hh")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
      if (img != null) // the platform BMP plugin may not read RLE8
        (0 until hh).foreach(y => (0 until ww).foreach { x =>
          assert(img.getRaster.getSample(x, y, 0) == p(y * ww + x), s"($x,$y) rle=$rle")
        })
    }
  }

  test("sub-byte PNGs (1-bit binary, 4-bit palette) decode natively, agreeing with ImageIO") {
    // 1-bit: TYPE_BYTE_BINARY checkerboard
    val bw = 19; val bh = 11
    val bin = new java.awt.image.BufferedImage(bw, bh,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until bh; x <- 0 until bw)
      bin.setRGB(x, y, if ((x + y) % 2 == 0) 0xFFFFFF else 0)
    val bos1 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bin, "png", bos1)
    val oneBit = bos1.toByteArray
    assert((oneBit(24) & 0xFF) < 8, "fixture must be sub-byte depth")
    val g1 = ImageKernels.decodeGrayPublic(oneBit)
    assert(g1 != null && g1.w == bw && g1.h == bh)
    for (y <- 0 until bh; x <- 0 until bw)
      assert(g1.px(y * bw + x) == (if ((x + y) % 2 == 0) 255 else 0), s"($x,$y)")

    // 4-bit: indexed image with a 16-entry gray palette
    val grays = Array.tabulate(16)(i => (i * 17).toByte)
    val icm = new java.awt.image.IndexColorModel(4, 16, grays, grays, grays)
    val idx = new java.awt.image.BufferedImage(bw, bh,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY, icm)
    for (y <- 0 until bh; x <- 0 until bw) {
      val v = (x * 3 + y * 5) % 16 * 17
      idx.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos4 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(idx, "png", bos4)
    val fourBit = bos4.toByteArray
    // ImageIO may emit the all-gray palette as 4-bit GRAYSCALE (type 0)
    // instead of palette (type 3) — both are the sub-byte path under test
    assert((fourBit(24) & 0xFF) == 4 && Set(0, 3)((fourBit(25) & 0xFF)),
      "fixture must be 4-bit")
    val g4 = ImageKernels.decodeGrayPublic(fourBit)
    assert(g4 != null && g4.w == bw && g4.h == bh)
    for (y <- 0 until bh; x <- 0 until bw)
      assert(g4.px(y * bw + x) == (x * 3 + y * 5) % 16 * 17, s"($x,$y) 4-bit")
  }

  test("16-bit gray PNG decodes natively (high-byte reduction), agreeing with ImageIO") {
    val ww = 23; val hh = 13
    val bi = new java.awt.image.BufferedImage(ww, hh,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val p = GenImages.pattern(31, ww, hh)
    (0 until hh).foreach(y => (0 until ww).foreach { x =>
      bi.getRaster.setSample(x, y, 0, (p(y * ww + x) << 8) | 0x5A) // low byte noise
    })
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    val bytes = bos.toByteArray
    assert((bytes(24) & 0xFF) == 16, "fixture must be 16-bit")
    val g = ImageKernels.decodeGrayPublic(bytes)
    assert(g != null && g.w == ww && g.h == hh)
    // high-byte reduction: our decode = sample >> 8
    (0 until hh).foreach(y => (0 until ww).foreach { x =>
      assert(g.px(y * ww + x) == p(y * ww + x), s"($x,$y)")
    })
  }

  test("TIFF strips decode natively across compressions, agreeing with ImageIO") {
    def writeTiff(bi: java.awt.image.BufferedImage, compression: Option[String]): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
      val param = writer.getDefaultWriteParam
      compression.foreach { c =>
        param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionType(c)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
      ios.close(); writer.dispose()
      bos.toByteArray
    }
    val ww = 37; val hh = 22
    val p = GenImages.pattern(29, ww, hh)
    for (compression <- Seq(None, Some("LZW"), Some("PackBits"), Some("Deflate"));
         rgb <- Seq(false, true)) {
      val bi = new java.awt.image.BufferedImage(ww, hh,
        if (rgb) java.awt.image.BufferedImage.TYPE_3BYTE_BGR
        else java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until hh).foreach(y => (0 until ww).foreach { x =>
        val v = p(y * ww + x)
        // raster samples, not setRGB: the gray color-space conversion
        // would rescale the stored byte
        (0 until bi.getRaster.getNumBands).foreach(c =>
          bi.getRaster.setSample(x, y, c, v))
      })
      val bytes = writeTiff(bi, compression)
      assert(ImageKernels.imageMeta(bytes) == ("tiff", ww, hh, 0))
      val g = ImageKernels.decodeGrayPublic(bytes)
      assert(g != null && g.w == ww && g.h == hh, s"$compression rgb=$rgb")
      // equal-channel pixels: luma == gray value in both paths
      (0 until hh).foreach(y => (0 until ww).foreach { x =>
        assert(g.px(y * ww + x) == p(y * ww + x), s"($x,$y) $compression rgb=$rgb")
      })
    }
  }

  test("tiled TIFF decodes natively (platform-written, all compressions, edge tiles)") {
    def writeTiled(bi: java.awt.image.BufferedImage, compression: Option[String]): Array[Byte] = {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
      val param = writer.getDefaultWriteParam
      param.setTilingMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setTiling(16, 16, 0, 0)
      compression.foreach { c =>
        param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionType(c)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
      ios.close(); writer.dispose()
      bos.toByteArray
    }
    // 37x22 over 16x16 tiles: a 3x2 grid with padded right/bottom edges
    val ww = 37; val hh = 22
    val p = GenImages.pattern(31, ww, hh)
    for (compression <- Seq(None, Some("LZW"), Some("PackBits"), Some("Deflate"));
         rgb <- Seq(false, true)) {
      val bi = new java.awt.image.BufferedImage(ww, hh,
        if (rgb) java.awt.image.BufferedImage.TYPE_3BYTE_BGR
        else java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until hh).foreach(y => (0 until ww).foreach { x =>
        val v = p(y * ww + x)
        (0 until bi.getRaster.getNumBands).foreach(c =>
          bi.getRaster.setSample(x, y, c, v))
      })
      val bytes = writeTiled(bi, compression)
      // the native path alone must handle it — no ImageIO fallback masking
      val g = ImageKernels.decodeTiffNative(bytes)
      assert(g != null && g.w == ww && g.h == hh, s"$compression rgb=$rgb")
      (0 until hh).foreach(y => (0 until ww).foreach { x =>
        assert(g.px(y * ww + x) == p(y * ww + x), s"($x,$y) $compression rgb=$rgb")
      })
    }
  }

  test("meta parses big-endian EXIF and ImageIO-written JPEG dimensions") {
    val bi = new java.awt.image.BufferedImage(33, 17, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "jpg", bos)
    val m = ImageKernels.imageMeta(bos.toByteArray)
    assert(m != null && m._1 == "jpeg" && m._2 == 33 && m._3 == 17)
  }

  test("BMP and PNG decode round-trips are bit-exact") {
    val p = px
    val viaBmp = ImageKernels.decodeGrayPublic(ImageKernels.encodeBmp(w, h, p))
    val viaPng = ImageKernels.decodeGrayPublic(ImageKernels.encodePng(w, h, p))
    assert(viaBmp.w == w && viaBmp.h == h && viaBmp.px.sameElements(p))
    assert(viaPng.w == w && viaPng.h == h && viaPng.px.sameElements(p))
  }

  test("native GIF LZW decode matches ImageIO's decode of the same bytes") {
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val p = px
    for (y <- 0 until h; x <- 0 until w) {
      val v = p(y * w + x); bi.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "gif", bos)
    val bytes = bos.toByteArray
    val native = ImageKernels.decodeGrayPublic(bytes)
    assert(native != null && native.w == w && native.h == h)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val refPx = Array.tabulate(w * h) { i =>
      val rgb = ref.getRGB(i % w, i / w)
      (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) + 114 * (rgb & 0xFF)) / 1000
    }
    assert(native.px.sameElements(refPx))
  }

  test("palette PNG (color type 3) decodes through PLTE identically to ImageIO") {
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    val p = px
    for (y <- 0 until h; x <- 0 until w) {
      val v = p(y * w + x); bi.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    val bytes = bos.toByteArray
    assert(ImageKernels.imageMeta(bytes)._1 == "png")
    val native = ImageKernels.decodeGrayPublic(bytes)
    assert(native != null)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val refPx = Array.tabulate(w * h) { i =>
      val rgb = ref.getRGB(i % w, i / w)
      (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) + 114 * (rgb & 0xFF)) / 1000
    }
    assert(native.px.sameElements(refPx))
  }

  test("perceptual hashes are invariant to uniform brightness shift") {
    val p = px // values ≤ 250, so +5 never clips
    val bright = p.map(_ + 5)
    for ((name, f) <- Seq[(String, Array[Byte] => java.lang.Long)](
      ("ahash", ImageKernels.ahash), ("dhash", ImageKernels.dhash),
      ("phash", ImageKernels.phash))) {
      val a = f(ImageKernels.encodeBmp(w, h, p))
      val b = f(ImageKernels.encodeBmp(w, h, bright))
      assert(a == b, s"$name changed under uniform brightness shift")
    }
  }

  test("perceptual hashes are container-independent and junk-null") {
    val p = px
    val bmp = ImageKernels.encodeBmp(w, h, p)
    val png = ImageKernels.encodePng(w, h, p)
    assert(ImageKernels.phash(bmp) == ImageKernels.phash(png))
    assert(ImageKernels.ahash(bmp) == ImageKernels.ahash(png))
    assert(ImageKernels.phash("junk".getBytes) == null)
  }

  test("EXIF orientation normalizes before signatures: flagged copy == pixel-rotated copy") {
    // a non-square asymmetric pattern so every orientation is distinct
    val ww = 48; val hh = 32
    val p = Array.tabulate(ww * hh) { i =>
      val x = i % ww; val y = i / ww
      ((x * 13 + y * 41 + (x * y) % 7) % 251)
    }
    val plain = graft.functions.Jpeg.encodeYcc420(ww, hh, p)
    // splice an EXIF APP1 with orientation 6 (display = rotate 90 CW)
    // right after SOI — same payload bytes, different flag
    def withOrientation(jpeg: Array[Byte], o: Int): Array[Byte] = {
      val hdr = ImageKernels.encodeJpegHeader(4, 4, o)
      // header fixture = SOI ++ APP1 ++ SOF0 ++ EOI; take the APP1 segment
      val app1Len = ((hdr(4) & 0xFF) << 8) | (hdr(5) & 0xFF)
      val app1 = java.util.Arrays.copyOfRange(hdr, 2, 4 + app1Len)
      jpeg.take(2) ++ app1 ++ jpeg.drop(2)
    }
    val g0 = ImageKernels.decodeGrayPublic(plain)
    for (o <- 2 to 8) {
      val g = ImageKernels.decodeGrayPublic(withOrientation(plain, o))
      assert(g != null, s"orientation $o")
      val swap = o >= 5
      assert(g.w == (if (swap) hh else ww) && g.h == (if (swap) ww else hh), s"dims o=$o")
      // the normalized decode must equal the manual remap of the plain one
      def ref(x: Int, y: Int): Int = o match {
        case 2 => g0.px(y * ww + (ww - 1 - x))
        case 3 => g0.px((hh - 1 - y) * ww + (ww - 1 - x))
        case 4 => g0.px((hh - 1 - y) * ww + x)
        case 5 => g0.px(x * ww + y)
        case 6 => g0.px((hh - 1 - x) * ww + y)
        case 7 => g0.px((hh - 1 - x) * ww + (ww - 1 - y))
        case _ => g0.px(x * ww + (ww - 1 - y))
      }
      var i = 0
      while (i < g.w * g.h) {
        assert(g.px(i) == ref(i % g.w, i / g.w), s"o=$o px $i")
        i += 1
      }
    }
    // the signature-level guarantee the dedup tier relies on: an EXIF-6
    // copy hashes identically to the SAME decode rotated in pixel space
    val exif6 = withOrientation(plain, 6)
    assert(ImageKernels.phash(exif6) != null)
    assert(ImageKernels.phash(exif6) != ImageKernels.phash(plain) ||
      ww == hh, "rotation must actually change the hash input here")
  }

  test("TIFF orientation tag (274) normalizes like JPEG EXIF") {
    val ww = 24; val hh = 16
    val p = Array.tabulate(ww * hh)(i => (i * 37) % 251)
    // hand-built gray TIFF with Orientation=6 (rotate 90 CW to display)
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def u32(v: Int): Unit = { u16(v & 0xFFFF); u16((v >> 16) & 0xFFFF) }
    out.write('I'); out.write('I'); u16(42); u32(8)
    val nTags = 9
    val dataOff = 8 + 2 + nTags * 12 + 4
    u16(nTags)
    def tag(id: Int, typ: Int, count: Int, value: Int): Unit = { u16(id); u16(typ); u32(count); u32(value) }
    tag(256, 4, 1, ww); tag(257, 4, 1, hh); tag(258, 3, 1, 8)
    tag(259, 3, 1, 1); tag(262, 3, 1, 1); tag(273, 4, 1, dataOff)
    tag(274, 3, 1, 6); tag(278, 4, 1, hh); tag(279, 4, 1, ww * hh)
    u32(0)
    p.foreach(v => out.write(v & 0xFF))
    val tiff = out.toByteArray
    assert(ImageKernels.imageMeta(tiff)._4 == 6)
    val g = ImageKernels.decodeGrayPublic(tiff)
    assert(g != null && g.w == hh && g.h == ww, s"${g.w}x${g.h}")
    // same remap as EXIF case 6: out(x,y) = src(h-1-x, y)
    var i = 0
    while (i < g.w * g.h) {
      val x = i % g.w; val y = i / g.w
      assert(g.px(i) == p((hh - 1 - x) * ww + y), s"px $i")
      i += 1
    }
  }

  test("16-bit gray TIFF decodes natively (high byte), uncompressed and LZW") {
    val ww = 40; val hh = 25
    val px16 = Array.tabulate(ww * hh)(i => (i * 523) % 65536)
    val img = new java.awt.image.BufferedImage(ww, hh, java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    var i = 0
    while (i < ww * hh) { img.getRaster.setSample(i % ww, i / ww, 0, px16(i)); i += 1 }
    for (ctype <- Seq(null, "LZW", "Deflate")) {
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
      val param = writer.getDefaultWriteParam
      if (ctype != null) {
        param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionType(ctype)
      }
      val bout = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bout)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      val g = ImageKernels.decodeTiffNative(bout.toByteArray)
      assert(g != null, s"rejected ImageIO 16-bit $ctype tiff")
      assert(g.w == ww && g.h == hh)
      i = 0
      while (i < ww * hh) {
        assert(g.px(i) == (px16(i) >> 8), s"$ctype px $i: ${g.px(i)} vs ${px16(i) >> 8}")
        i += 1
      }
    }
  }

  test("image_meta / image_phash usable from plain SQL via the registry") {
    graft.expressions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1L, ImageKernels.encodePng(w, h, px)), (2L, "junk".getBytes))
      .toDF("id", "content")
    df.createOrReplaceTempView("imgs")
    val rows = spark.sql(
      "SELECT id, image_meta(content).format AS fmt, image_phash(content) AS ph FROM imgs")
      .collect().sortBy(_.getLong(0))
    assert(rows(0).getString(1) == "png" && !rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("phashDedupGroups recovers constructed near-dup pairs across formats") {
    import spark.implicits._
    // ids 0..9 base patterns; 10..19 perturbed copies; 20 junk payload
    val media = ((0L until 20L).map(i => (i, GenImages.dedupFixture(i % 10 + (i / 10) * 250))) :+
      ((20L, "not an image".getBytes))).toDF("media_id", "content")
    val groups = Images.phashDedupGroups(media, "media_id", "content", maxHamming = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (i <- 0L until 10L) {
      assert(groups(i) == (i, 2L), s"base $i: ${groups(i)}")
      assert(groups(i + 10) == (i, 2L), s"copy ${i + 10}: ${groups(i + 10)}")
    }
    assert(groups(20L) == (20L, 1L)) // undecodable keeps itself
  }

  test("banded hamming join plan is an equi-join — no nested loop, no cartesian") {
    import spark.implicits._
    val sigs = (0L until 8L).map(i => (i, Dedup.mix64(i))).toDF("id", "sig")
    val p = Images.hammingPairs64(sigs, "id", "sig", 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("thumbnail resizes through decode → box mean → PNG, preserving content") {
    val p = px
    val big = ImageKernels.encodeBmp(w, h, p)
    val thumb = ImageKernels.thumbnail(big, 10, 6)
    assert(ImageKernels.imageMeta(thumb) == ("png", 10, 6, 0))
    // thumbnail pixels are the exact integer box means of the source
    val got = ImageKernels.decodeGrayPublic(thumb)
    val want = ImageKernels.downsample(ImageKernels.decodeGrayPublic(big), 10, 6)
    assert(got.px.sameElements(want))
    assert(ImageKernels.thumbnail("junk".getBytes, 8, 8) == null)
  }

  test("banded hamming recall is pigeonhole-guaranteed at every tolerance tier") {
    import spark.implicits._
    // a pair at hamming 4 with one flipped bit in EACH 16-bit chunk:
    // invisible to a fixed 4x16 band join, mandatory for the 8x8 tier
    val a = 0x123456789ABCDEF0L
    val spread4 = a ^ 0x0001000100010001L
    // hamming 7: one flip in each of seven 8-bit bands, band 0 clean
    val h7 = a ^ 0x0101010101010100L
    val sigs = Seq((1L, a), (2L, spread4), (3L, h7)).toDF("id", "sig")
    val p4 = Images.hammingPairs64(sigs, "id", "sig", 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(p4.contains((1L, 2L)), "hamming-4 pair must be found by the 8x8 tier")
    val p7 = Images.hammingPairs64(sigs, "id", "sig", 7)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(p7.contains((1L, 3L)), "hamming-7 pair must be found")
    // and a pair at hamming 8 whose errors hit all eight 8-bit bands:
    // only the 16x4 tier can see it
    val spread8 = a ^ 0x0101010101010101L
    val sigs8 = Seq((1L, a), (2L, spread8)).toDF("id", "sig")
    val p8 = Images.hammingPairs64(sigs8, "id", "sig", 8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(p8.contains((1L, 2L)), "hamming-8 pair must be found by the 16x4 tier")
  }

  test("image_meta YAML op appends metadata columns via the engine dispatch") {
    import spark.implicits._
    val media = Seq((0L, GenImages.metaFixture(0L)), (3L, GenImages.metaFixture(3L)))
      .toDF("media_id", "content")
    val out = new graft.engine.Engine(spark).applyOperation(media,
      Map("operation" -> "image_meta", "column" -> "content"), Map.empty, "spec")
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    assert(out(0L) == ("bmp", GenImages.metaWidth(0), GenImages.metaHeight(0), 0))
    assert(out(3L) == ("jpeg", GenImages.metaWidth(3), GenImages.metaHeight(3), 4))
  }
}
