package graft.functions

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property laws for the round-11 codec + tokenizer tier — the
  * SpreadsheetPropertySpec discipline applied to media and BPE: arbitrary
  * inputs must round-trip or satisfy algebraic laws, not just the
  * hand-picked spec cases. */
class MediaPropertySpec extends SparkSpec {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(30)
  private def check(prop: Prop, name: String): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("BMP and PNG encode/decode round-trip arbitrary grayscale images bit-exactly") {
    val img = for {
      w <- Gen.chooseNum(1, 40)
      h <- Gen.chooseNum(1, 30)
      px <- Gen.listOfN(w * h, Gen.chooseNum(0, 255))
    } yield (w, h, px.toArray)
    check(Prop.forAll(img) { case (w, h, px) =>
      val viaBmp = ImageKernels.decodeGrayPublic(ImageKernels.encodeBmp(w, h, px))
      val viaPng = ImageKernels.decodeGrayPublic(ImageKernels.encodePng(w, h, px))
      viaBmp != null && viaBmp.px.sameElements(px) &&
        viaPng != null && viaPng.px.sameElements(px) &&
        viaBmp.w == w && viaPng.h == h
    }, "image_roundtrip")
  }

  test("thumbnail always reports its target dims and is container-independent") {
    val img = for {
      w <- Gen.chooseNum(2, 50)
      h <- Gen.chooseNum(2, 40)
      tw <- Gen.chooseNum(1, 12)
      th <- Gen.chooseNum(1, 12)
      px <- Gen.listOfN(w * h, Gen.chooseNum(0, 255))
    } yield (w, h, tw, th, px.toArray)
    check(Prop.forAll(img) { case (w, h, tw, th, px) =>
      val tb = ImageKernels.thumbnail(ImageKernels.encodeBmp(w, h, px), tw, th)
      val tp = ImageKernels.thumbnail(ImageKernels.encodePng(w, h, px), tw, th)
      ImageKernels.imageMeta(tb) == ("png", tw, th, 0) &&
        java.util.Arrays.equals(tb, tp) // same pixels in, same thumbnail out
    }, "thumbnail_dims")
  }

  test("FLAC round-trips arbitrary mono signals bit-exactly and matches WAV fingerprints") {
    val sig = for {
      n <- Gen.chooseNum(1, 6000) // spans the <64-sample edge AND multi-rice shapes
      rate <- Gen.oneOf(8000, 16000, 44100)
      samples <- Gen.listOfN(n, Gen.chooseNum(-32768, 32767))
    } yield (rate, samples.toArray)
    check(Prop.forAll(sig) { case (rate, samples) =>
      val flac = Flac.encodeMono16(rate, samples)
      val back = Flac.decode(flac)
      val sameSamples = back != null && back.toSeq == samples.toSeq
      val fpW = MediaKernels.audioFingerprint(MediaKernels.encodeWav(rate, samples))
      val fpF = MediaKernels.audioFingerprint(flac)
      sameSamples && fpW == fpF // both null below 64 samples, equal above
    }, "flac_roundtrip")
  }

  test("stereo FLAC round-trips arbitrary pairs under every channel assignment") {
    val sig = for {
      n <- Gen.chooseNum(1, 3000)
      asgn <- Gen.oneOf(1, 8, 9, 10)
      l <- Gen.listOfN(n, Gen.chooseNum(-32768, 32767))
      r <- Gen.listOfN(n, Gen.chooseNum(-32768, 32767))
    } yield (asgn, l.toArray, r.toArray)
    check(Prop.forAll(sig) { case (asgn, l, r) =>
      val dec = Flac.decode(Flac.encodeStereo16(16000, l, r, asgn))
      dec != null && dec.length == 2 * l.length &&
        l.indices.forall(i => dec(2 * i) == l(i) && dec(2 * i + 1) == r(i))
    }, "flac_stereo_roundtrip")
  }

  test("baseline JPEG at flat quant round-trips arbitrary images within DCT rounding") {
    val img = for {
      w <- Gen.chooseNum(1, 48)
      h <- Gen.chooseNum(1, 40)
      px <- Gen.listOfN(w * h, Gen.chooseNum(0, 255))
    } yield (w, h, px.toArray)
    check(Prop.forAll(img) { case (w, h, px) =>
      val gGray = Jpeg.decode(Jpeg.encodeGray(w, h, px))
      val gYcc = Jpeg.decode(Jpeg.encodeYcc420(w, h, px))
      gGray != null && gGray.w == w && gGray.h == h &&
        gYcc != null && gYcc.w == w && gYcc.h == h &&
        px.indices.forall(i => math.abs(gGray.px(i) - px(i)) <= 2 &&
          math.abs(gYcc.px(i) - px(i)) <= 2)
    }, "jpeg_roundtrip")
  }

  test("interlaced PNG and RLE8/palette BMP round-trip arbitrary images bit-exactly") {
    val img = for {
      w <- Gen.chooseNum(1, 40)
      h <- Gen.chooseNum(1, 30)
      rle <- Gen.oneOf(true, false)
      px <- Gen.listOfN(w * h, Gen.chooseNum(0, 255))
    } yield (w, h, rle, px.toArray)
    check(Prop.forAll(img) { case (w, h, rle, px) =>
      val viaI = ImageKernels.decodeGrayPublic(ImageKernels.encodePngInterlaced(w, h, px))
      val via8 = ImageKernels.decodeGrayPublic(ImageKernels.encodeBmp8(w, h, px, rle))
      viaI != null && viaI.px.sameElements(px) &&
        via8 != null && via8.px.sameElements(px)
    }, "interlaced_rle_roundtrip")
  }

  test("WAV PCM16 round-trips arbitrary samples; features satisfy their algebra") {
    val sig = for {
      n <- Gen.chooseNum(1, 400)
      rate <- Gen.oneOf(8000, 16000, 44100)
      samples <- Gen.listOfN(n, Gen.chooseNum(-32768, 32767))
    } yield (rate, samples.toArray)
    check(Prop.forAll(sig) { case (rate, samples) =>
      val wav = MediaKernels.encodeWav(rate, samples)
      val back = MediaKernels.wavSamples(wav)
      val f = MediaKernels.audioFeaturesRow(wav)
      val sq = samples.map(v => v.toLong * v).sum
      val peak = samples.map(v => math.abs(v.toLong)).max
      back.sameElements(samples) &&
        f.getLong(0) == samples.length.toLong &&
        f.getLong(1) == sq && f.getLong(3) == peak &&
        f.getLong(2) <= math.max(samples.length - 1, 0).toLong
    }, "wav_roundtrip")
  }

  test("BPE encode is a partition of every word under any learned merge table") {
    val corpusGen = Gen.listOfN(20,
      Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString)).map(_.mkString(" "))
    check(Prop.forAll(corpusGen, Gen.chooseNum(1, 50)) { (corpus, nMerges) =>
      import spark.implicits._
      val merges = Bpe.train(Seq(corpus).toDF("text"), "text", nMerges, 1000)
      val (keys, ranks) = Bpe.lookupArrays(merges)
      val words = corpus.toLowerCase.split("\\s+").filter(_.nonEmpty)
      words.forall { w =>
        val toks = BpeKernels.encodeWord(w, keys, ranks)
        toks.mkString == w && toks.forall(_.nonEmpty) &&
          toks.length <= w.length &&
          BpeKernels.tokenCount(w, keys, ranks) == toks.length.toLong
      }
    }, "bpe_partition")
  }

  test("WebM/IVF walks never throw on arbitrary bytes; real containers round-trip") {
    // fuzz law: videoFrames / videoMetaRow must be total over arbitrary
    // byte arrays AND over corruptions of real WebM/IVF containers
    val junk = Gen.listOf(Gen.chooseNum(-128, 127)).map(_.map(_.toByte).toArray)
    check(Prop.forAll(junk) { bytes =>
      MediaKernels.videoFrames(bytes, 4) // no throw is the property
      MediaKernels.videoMetaRow(bytes)
      true
    }, "webm_junk_total")
    val frames = (0 until 3).map(k => graft.tools.Vp8VideoFixtures.frame(2, k))
    val real = Seq(Webm.encodeWebm(48, 48, frames), Webm.encodeIvf(48, 48, frames))
    val corrupt = for {
      base <- Gen.oneOf(0, 1)
      i <- Gen.chooseNum(0, real(base).length - 1)
      b <- Gen.chooseNum(-128, 127)
    } yield { val c = real(base).clone(); c(i) = b.toByte; c }
    check(Prop.forAll(corrupt) { bytes =>
      MediaKernels.videoFrames(bytes, 4)
      MediaKernels.videoMetaRow(bytes)
      true
    }, "webm_corrupt_total")
    // uncorrupted law: frame count and meta are exact
    for (c <- real) {
      assert(MediaKernels.videoFrames(c, 16).length == 3)
      val m = MediaKernels.videoMetaRow(c)
      assert(m.getInt(1) == 48 && m.getInt(2) == 48)
    }
  }

  test("more merges never increase a word's token count (monotone compression)") {
    import spark.implicits._
    val corpus = "the quick brown fox the quick dog the brown cat quick fox"
    val df = Seq(corpus).toDF("text")
    val counts = (1 to 20).map { m =>
      val merges = Bpe.train(df, "text", m, 1000)
      val (keys, ranks) = Bpe.lookupArrays(merges)
      BpeKernels.tokenCount(corpus, keys, ranks)
    }
    counts.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"token count rose with more merges: $counts")
    }
  }
}
