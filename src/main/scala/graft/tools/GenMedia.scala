package graft.tools

import graft.functions.MediaKernels

/** Deterministic audio/video fixtures for the oracle gate — every byte
  * derivable from doc_id alone (the GenImages pattern), so the DuckDB
  * oracle states expected metadata AND decoded-sample features in closed
  * form. */
object GenMedia {

  def wavRate(id: Long): Int = 8000 + (id % 4).toInt * 4000
  def wavSamples(id: Long): Int = 64 + (id % 32).toInt * 4

  /** PCM16 sample i of doc id — positive-modulus arithmetic the oracle
    * reproduces verbatim: ((i·2654435761 + id·40503) mod 65536) − 32768. */
  def sample(id: Long, i: Int): Int =
    (((i.toLong * 2654435761L + id * 40503L) % 65536L) - 32768L).toInt

  /** Mono PCM16 WAV with id-derived rate, length, and samples. */
  def wavFixture(id: Long): Array[Byte] =
    MediaKernels.encodeWav(wavRate(id),
      Array.tabulate(wavSamples(id))(i => sample(id, i)))

  /** Audio-dedup fixture: ids i and i+250 carry the SAME signal, the copy
    * at exactly double amplitude — different bytes, identical energy-delta
    * fingerprint (sign of window-energy deltas is scale-invariant); 256
    * samples = 64 exact 4-sample windows. Samples come from mix64 (a
    * modular LCG ramp gives near-flat window energies whose delta signs
    * collide across seeds — measured); the dedup oracle is closed-form in
    * doc_id, so sample SQL-expressibility is not needed here. Base range
    * ±8191 so the ×2 copy never clips. */
  def audioDedupSample(id: Long, i: Int): Int = {
    val base = ((graft.functions.Dedup.mix64(
      i.toLong * 1000003L + (id % 250) * 7919L + 17L) & 0x3FFFL) - 8192L).toInt
    if (id >= 250) base * 2 else base
  }

  def audioDedupFixture(id: Long): Array[Byte] =
    MediaKernels.encodeWav(16000, Array.tabulate(256)(i => audioDedupSample(id, i)))

  def mp4Width(id: Long): Int = 320 + (id % 8).toInt * 16
  def mp4Height(id: Long): Int = 240 + (id % 5).toInt * 16
  def mp4DurationMs(id: Long): Long = 1000L + (id % 97) * 250L

  /** ftyp+moov(mvhd+trak(tkhd)) metadata fixture. */
  def mp4Fixture(id: Long): Array[Byte] =
    MediaKernels.encodeMp4Header(mp4Width(id), mp4Height(id), mp4DurationMs(id))
}
