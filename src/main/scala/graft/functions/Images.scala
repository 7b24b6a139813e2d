package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.expressions.GraftFunctions

/**
 * Image-level corpus operators: metadata extraction and perceptual
 * near-duplicate detection over binary payload columns — the multimodal
 * half of the dedup tier. A crawl-scale image corpus dedups exactly like
 * text: signature pass (here a perceptual hash instead of MinHash), banded
 * candidate join, exact verification, connected components.
 *
 * Scale shape mirrors the SimHash path: the signature is ONE codegen'd
 * expression per row fused into the scan (no second read of payload
 * bytes — they never leave the executor), the candidate join keys on
 * 16-bit signature bands (any equal band ⇒ candidate, which by pigeonhole
 * catches every pair within hamming distance 3 of a 4-band 64-bit
 * signature), and nothing is ever O(n²) or driver-side.
 */
object Images {

  /** Append header metadata (format / width / height / EXIF orientation)
    * from the binary payload — header parse only, no pixel decode: the
    * 100 TB metadata sweep reads each payload's first bytes once inside
    * the scan projection. */
  def withImageMeta(df: DataFrame, binCol: String, prefix: String = "image_"): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val m = s"__${prefix}m__"
    df.withColumn(m, GraftFunctions.imageMetaCol(col(binCol)))
      .withColumn(prefix + "format", col(s"$m.format"))
      .withColumn(prefix + "width", col(s"$m.width"))
      .withColumn(prefix + "height", col(s"$m.height"))
      .withColumn(prefix + "orientation", col(s"$m.orientation"))
      .drop(m)
  }

  /** Perceptual-hash column over a binary payload. kind: "ahash" (8×8
    * mean), "dhash" (9×8 gradient), "phash" (32×32 DCT low-frequency,
    * the robust default). NULL for undecodable payloads. */
  def perceptualHash(df: DataFrame, binCol: String, kind: String = "phash",
                     outCol: String = "phash"): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val c = kind.toLowerCase match {
      case "ahash" => GraftFunctions.imageAhashCol(col(binCol))
      case "dhash" => GraftFunctions.imageDhashCol(col(binCol))
      case "phash" => GraftFunctions.imagePhashCol(col(binCol))
      case other => throw new IllegalArgumentException(
        s"perceptualHash: kind must be ahash/dhash/phash, got `$other`")
    }
    df.withColumn(outCol, c)
  }

  /** Near-duplicate pairs over ANY 64-bit signature column by banded
    * hamming search: four 16-bit bands (any equal band ⇒ candidate —
    * complete for hamming ≤ 3 by pigeonhole), exact `bit_count` verify
    * `<= maxHamming`. The generalized form of the SimHash candidate
    * machinery, shared by image pHash dedup. */
  def hammingPairs64(sigs: DataFrame, idCol: String, sigCol: String,
                     maxHamming: Int = 3): DataFrame = {
    // No persist here: this returns a LAZY frame, so a persist could never
    // be released (each dedup invocation would leak a cached signature
    // frame for the session's lifetime). Eager callers that want the
    // signature computed once across both band-join sides persist the
    // input themselves and unpersist after materializing (sigDedupGroups).
    //
    // Band count is pigeonhole-sized to the tolerance: recall is
    // GUARANTEED only when the error count is strictly below the band
    // count (some band must then match exactly), so <=3 rides the
    // cheap 4x16 join, 4..7 the 8x8 join, and >=8 a 16x4 join whose
    // wider-collision selectivity cost is the price of guaranteed
    // recall up to 15 (prefer tolerances <= 7 at scale).
    val nBands = if (maxHamming <= 3) 4 else if (maxHamming <= 7) 8 else 16
    val bandBits = 64 / nBands
    val bandMask = (1L << bandBits) - 1
    val docs = sigs.filter(col(sigCol).isNotNull)
      .select(col(idCol).cast(LongType).as("id"), col(sigCol).cast(LongType).as("sig"))
    val banded = docs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(nBands - 1)),
        b => call_function("shiftright", col("sig"), b * bandBits).bitwiseAND(bandMask)))
        .as(Seq("band", "chunk")))
    val l = banded.toDF("a_id", "a_sig", "band", "chunk")
    val r = banded.toDF("b_id", "b_sig", "band", "chunk")
    l.join(r, Seq("band", "chunk")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sig", "b_sig").distinct()
      .withColumn("hamming", bit_count(col("a_sig").bitwiseXOR(col("b_sig"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming").cast(LongType).as("hamming"))
  }

  /** Perceptual near-duplicate pairs: pHash signature (one codegen pass
    * over the payloads) → banded hamming pairs. */
  def phashPairs(df: DataFrame, idCol: String, binCol: String,
                 maxHamming: Int = 3): DataFrame =
    hammingPairs64(
      perceptualHash(df, binCol, "phash", "__ph__")
        .select(col(idCol), col("__ph__")),
      idCol, "__ph__", maxHamming)

  /** Near-dedup groups over any 64-bit signature column: every row
    * labeled with its duplicate group's representative (min id); rows
    * with a NULL signature keep themselves. Output: (`idCol`, keep_id,
    * n_group). Shared by image pHash and audio fingerprint dedup. */
  def sigDedupGroups(df: DataFrame, idCol: String, sigCol: String,
                     maxHamming: Int): DataFrame = {
    val ids = df.select(col(idCol).cast(LongType).as(idCol))
    // the (usually expensive — pHash decodes payloads) signature column
    // feeds both sides of the band self-join plus the hamming verify;
    // persist it for the duration of the EAGER connectedComponents pass,
    // then release — cc's result depends only on ids + the (broadcast or
    // checkpointed) labels, so nothing re-reads the cache afterwards
    val sigFrame = df.select(col(idCol), col(sigCol)).persist()
    try {
      val pairs = hammingPairs64(sigFrame, idCol, sigCol, maxHamming)
      val cc = Dedup.connectedComponents(ids, idCol, pairs) // → (id, group_rep)
      val sizes = cc.groupBy(col("group_rep")).agg(count(lit(1)).as("n_group"))
      cc.join(sizes, "group_rep")
        .select(col("id").as(idCol), col("group_rep").as("keep_id"), col("n_group"))
    } finally sigFrame.unpersist()
  }

  /** Image near-dedup groups: pHash signatures → [[sigDedupGroups]].
    * Undecodable payloads keep themselves. */
  def phashDedupGroups(df: DataFrame, idCol: String, binCol: String,
                       maxHamming: Int = 3): DataFrame =
    sigDedupGroups(
      perceptualHash(df.select(col(idCol), col(binCol)), binCol, "phash", "__ph__")
        .select(col(idCol), col("__ph__")),
      idCol, "__ph__", maxHamming)

  /** Incremental near-dedup of a delta against a persisted signature
    * index (id, sig): a delta row is dropped when its signature lands
    * within `maxHamming` of ANY index signature, or of a SMALLER-id delta
    * row — the same pair semantics as the text tier's
    * [[Dedup.dedupNearIncrementalIndexed]]. Rows with a NULL signature
    * (undecodable payloads) keep themselves. Returns the kept delta rows
    * (signature column intact for index appending). Scale shape: both
    * checks are banded 16-bit-chunk equi-joins — the index side is never
    * scanned all-pairs. */
  def sigDedupIncremental(delta: DataFrame, index: DataFrame, idCol: String,
                          sigCol: String, maxHamming: Int = 3): DataFrame = {
    // pigeonhole-sized banding, same policy as hammingPairs64
    val nBands = if (maxHamming <= 3) 4 else if (maxHamming <= 7) 8 else 16
    val bandBits = 64 / nBands
    val bandMask = (1L << bandBits) - 1
    def bands(c: Column) = posexplode(transform(sequence(lit(0), lit(nBands - 1)),
      b => call_function("shiftright", c, b * bandBits).bitwiseAND(bandMask)))
    val dl = delta.filter(col(sigCol).isNotNull)
      .select(col(idCol).cast(LongType).as("a_id"), col(sigCol).cast(LongType).as("a_sig"))
    val dlB = dl.select(col("a_id"), col("a_sig"), bands(col("a_sig")).as(Seq("band", "chunk")))
    val ixB = index
      .select(col("id").cast(LongType).as("b_id"), col("sig").cast(LongType).as("b_sig"))
      .select(col("b_id"), col("b_sig"), bands(col("b_sig")).as(Seq("band", "chunk")))
    val vsIndex = dlB.join(ixB, Seq("band", "chunk"))
      .filter(bit_count(col("a_sig").bitwiseXOR(col("b_sig"))) <= maxHamming)
      .select(col("a_id").as("drop_id"))
    val within = hammingPairs64(dl, "a_id", "a_sig", maxHamming)
      .select(col("b_id").as("drop_id")) // (a < b) condemns b
    val condemned = vsIndex.union(within).distinct()
    delta.join(condemned, col(idCol).cast(LongType) === col("drop_id"), "left_anti")
  }

  /** Audio near-dedup groups: energy-delta fingerprints (amplitude-scale
    * invariant) → [[sigDedupGroups]]. */
  def audioDedupGroups(df: DataFrame, idCol: String, binCol: String,
                       maxHamming: Int = 2): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    sigDedupGroups(
      df.select(col(idCol),
        call_function("audio_fingerprint", col(binCol)).as("__afp__")),
      idCol, "__afp__", maxHamming)
  }

  /** LOSSY-tolerant audio near-dedup groups: the 60-bit spectral
    * fingerprint (Haar band-energy delta signs over native decode incl.
    * Ogg-Vorbis) through the same banded signature join — the same
    * recording groups across WAV, FLAC and its lossy Vorbis encode.
    * Scale shape identical to [[audioDedupGroups]]: codegen fingerprint,
    * banded 16-bit-chunk equi-join, never all-pairs. */
  def audioDedupLossyGroups(df: DataFrame, idCol: String, binCol: String,
                            maxHamming: Int = 7): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    sigDedupGroups(
      df.select(col(idCol),
        call_function("audio_fingerprint_spectral", col(binCol)).as("__asfp__")),
      idCol, "__asfp__", maxHamming)
  }

  /** Video near-dedup groups: up to `maxFrames` evenly-sampled JPEG
    * frames per video ([[MediaKernels.videoFrames]]), pHash per frame,
    * frame-level banded 16-bit-chunk matches across videos, and a vote —
    * two videos are near-dups when at least `minMatches` DISTINCT sampled
    * frames on EACH side participate in a match within `maxHamming`
    * bits (a single incidental frame collision — title cards, black
    * frames — must not merge unrelated videos; counting one side only
    * would let a static animation whose frames are all near-identical
    * reach the vote off a single shared frame). Pairs → connected
    * components → (`idCol`, keep_id, n_group), the image/audio dedup
    * output contract; videos with no extractable frames keep themselves.
    * Scale shape: narrow frame explode (bounded ×maxFrames), codegen
    * decode+hash, then the same banded equi-join as the image tier —
    * never all-pairs over videos or frames. */
  def videoDedupGroups(df: DataFrame, idCol: String, binCol: String,
                       maxHamming: Int = 3, maxFrames: Int = 8,
                       minMatches: Int = 2): DataFrame = {
    require(minMatches >= 1, s"video_dedup: min_matches must be >= 1, got $minMatches")
    GraftFunctions.register(df.sparkSession)
    val ids = df.select(col(idCol).cast(LongType).as(idCol))
    // frame signatures feed both sides of the band self-join — persist for
    // the eager connectedComponents pass, then release (sigDedupGroups'
    // lifecycle)
    val frames = df
      .select(col(idCol).cast(LongType).as("vid"),
        posexplode(call_function("video_frames", col(binCol), lit(maxFrames)))
          .as(Seq("fidx", "frame")))
      .select(col("vid"), col("fidx"),
        call_function("image_phash", col("frame")).as("sig"))
      .filter(col("sig").isNotNull)
      .persist()
    try {
      def bands(c: Column) = posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", c, b * 16).bitwiseAND(0xFFFFL)))
      val banded = frames.select(col("vid"), col("fidx"), col("sig"),
        bands(col("sig")).as(Seq("band", "chunk")))
      val l = banded.toDF("a_vid", "a_fidx", "a_sig", "band", "chunk")
      val r = banded.toDF("b_vid", "b_fidx", "b_sig", "band", "chunk")
      val frameMatches = l.join(r, Seq("band", "chunk"))
        .filter(col("a_vid") < col("b_vid"))
        .filter(bit_count(col("a_sig").bitwiseXOR(col("b_sig"))) <= maxHamming)
        .select("a_vid", "b_vid", "a_fidx", "b_fidx").distinct()
      val pairs = frameMatches.groupBy("a_vid", "b_vid")
        .agg(countDistinct(col("a_fidx")).as("na"),
          countDistinct(col("b_fidx")).as("nb"))
        .filter(least(col("na"), col("nb")) >= minMatches)
        .select(col("a_vid").as("a_id"), col("b_vid").as("b_id"))
      val cc = Dedup.connectedComponents(ids, idCol, pairs)
      val sizes = cc.groupBy(col("group_rep")).agg(count(lit(1)).as("n_group"))
      cc.join(sizes, "group_rep")
        .select(col("id").as(idCol), col("group_rep").as("keep_id"), col("n_group"))
    } finally frames.unpersist()
  }

  /** A video's MULTI-ROW signature: (id, fidx, sig) — one pHash per
    * sampled frame (the form the incremental video index persists). */
  def videoFrameSigs(df: DataFrame, idCol: String, binCol: String,
                     maxFrames: Int = 8): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).cast(LongType).as("id"),
        posexplode(call_function("video_frames", col(binCol), lit(maxFrames)))
          .as(Seq("fidx", "frame")))
      .select(col("id"), col("fidx"),
        call_function("image_phash", col("frame")).as("sig"))
      .filter(col("sig").isNotNull)
  }

  /** Incremental video near-dedup against a persisted FRAME index: a
    * delta video is dropped when its sampled frames vote-match (at least
    * `minMatches` DISTINCT frames on BOTH sides within `maxHamming` bits
    * — [[videoDedupGroups]]' guard) ANY indexed video, or a SMALLER-id
    * delta video. Videos with no extractable frames keep themselves.
    * `deltaSigs` is [[videoFrameSigs]] of `delta` (caller persists it —
    * it feeds both the vote here and the index append after). Scale
    * shape: banded 16-bit-chunk equi-joins only, never all-pairs. */
  def videoDedupIncrementalFromSigs(delta: DataFrame, deltaSigs: DataFrame,
                                    indexSigs: DataFrame, idCol: String,
                                    maxHamming: Int = 3,
                                    minMatches: Int = 2): DataFrame = {
    require(minMatches >= 1, s"video_dedup: min_matches must be >= 1, got $minMatches")
    def bands(c: Column) = posexplode(transform(sequence(lit(0), lit(3)),
      b => call_function("shiftright", c, b * 16).bitwiseAND(0xFFFFL)))
    def banded(sigs: DataFrame, p: String) = sigs
      .select(col("id").cast(LongType).as(s"${p}_vid"), col("fidx").as(s"${p}_fidx"),
        col("sig").cast(LongType).as(s"${p}_sig"))
      .select(col(s"${p}_vid"), col(s"${p}_fidx"), col(s"${p}_sig"),
        bands(col(s"${p}_sig")).as(Seq("band", "chunk")))
    def vote(matches: DataFrame, dropCol: String) = matches
      .select(col("a_vid"), col("b_vid"), col("a_fidx"), col("b_fidx")).distinct()
      .groupBy("a_vid", "b_vid")
      .agg(countDistinct(col("a_fidx")).as("na"), countDistinct(col("b_fidx")).as("nb"))
      .filter(least(col("na"), col("nb")) >= minMatches)
      .select(col(dropCol).as("drop_id"))
    val dl = banded(deltaSigs, "a")
    val hamOk = bit_count(col("a_sig").bitwiseXOR(col("b_sig"))) <= maxHamming
    // vs the persisted index: any vote-match condemns the delta video
    val vsIndex = vote(
      dl.join(banded(indexSigs, "b"), Seq("band", "chunk")).filter(hamOk), "a_vid")
    // within the delta: (a < b) condemns b, the larger id
    val within = vote(
      dl.join(banded(deltaSigs, "b"), Seq("band", "chunk"))
        .filter(col("a_vid") < col("b_vid")).filter(hamOk), "b_vid")
    val condemned = vsIndex.union(within).distinct()
    delta.join(condemned, col(idCol).cast(LongType) === col("drop_id"), "left_anti")
  }
}
