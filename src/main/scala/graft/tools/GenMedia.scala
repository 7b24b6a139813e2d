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

  def mp4Width(id: Long): Int = 320 + (id % 8).toInt * 16
  def mp4Height(id: Long): Int = 240 + (id % 5).toInt * 16
  def mp4DurationMs(id: Long): Long = 1000L + (id % 97) * 250L

  /** ftyp+moov(mvhd+trak(tkhd)) metadata fixture. */
  def mp4Fixture(id: Long): Array[Byte] =
    MediaKernels.encodeMp4Header(mp4Width(id), mp4Height(id), mp4DurationMs(id))
}
