package graft.engine

class SubtitlesSpec extends graft.SparkSpec {

  private def tmp(suffix: String) =
    java.nio.file.Files.createTempFile("graft-subs", suffix)

  test("srt round-trips cues with exact millisecond bounds and multi-line text") {
    val cues = Seq(
      (0L, 1500L, "first cue"),
      (3723456L, 3725000L, "two lines\nof dialogue"),
      (7200000L, 7200999L, "exactly two hours in"))
    val f = tmp(".srt")
    Subtitles.writeSrt(f, cues)
    assert(Subtitles.parseSrt(java.nio.file.Files.readAllBytes(f)) == cues.toVector)
  }

  test("real-world srt quirks: renumbered indices, CRLF, dot separators, short fields") {
    val srt = "99\r\n0:0:1,5 --> 0:0:2.250\r\nhello there\r\n\r\n" +
      "3\r\n00:00:05,000 --> 00:00:06,000\r\nsecond\r\n"
    val got = Subtitles.parseSrt(srt.getBytes("UTF-8"))
    // 0:0:1,5 -> 1s + "5" padded to 500ms; indices 99/3 ignored
    assert(got == Vector((1500L, 2250L, "hello there"), (5000L, 6000L, "second")), got.toString)
  }

  test("vtt: BOM + header + NOTE blocks skipped, cue settings and voice tags stripped") {
    val vtt = "﻿WEBVTT - some description\n\n" +
      "NOTE this block is ignored\nentirely\n\n" +
      "intro-cue-id\n00:00:01.000 --> 00:00:02.000 align:start position:10%\n" +
      "<v Fred>Hi there</v>\n\n" +
      "00:01:00.000 --> 00:01:05.500\n<i>styled</i> text\n"
    val got = Subtitles.parseVtt(vtt.getBytes("UTF-8"))
    assert(got == Vector((1000L, 2000L, "Hi there"), (60000L, 65500L, "styled text")), got.toString)
    intercept[IllegalArgumentException](Subtitles.parseVtt("no header\n".getBytes))
  }

  test("sources dispatch: srt/vtt read with (file, cue, start_ms, end_ms, text) schema") {
    val f = tmp(".vtt")
    Subtitles.writeVtt(f, Seq((0L, 900L, "alpha"), (1000L, 1900L, "beta")))
    val df = Sources.read(spark, "spec_vtt", Map("file" -> f.toString), f.getParent)
    assert(df.columns.toSeq == Seq("file", "cue", "start_ms", "end_ms", "text"))
    val rows = df.orderBy("cue").collect()
    assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 1000L))
    assert(rows.map(_.getString(4)).toSeq == Seq("alpha", "beta"))
  }

  test("vtt: hour-less mm:ss.ttt timestamps parse (W3C §6.2 optional hours)") {
    val vtt = "WEBVTT\n\n00:01.000 --> 00:02.500\nshort form\n\n" +
      "01:02:03.000 --> 01:02:04.000\nlong form\n"
    val got = Subtitles.parseVtt(vtt.getBytes("UTF-8"))
    assert(got == Vector((1000L, 2500L, "short form"),
      (3723000L, 3724000L, "long form")), got.toString)
  }

  test("garbage and cue-free files reject diagnosably") {
    intercept[IllegalArgumentException](Subtitles.parseSrt("no cues here at all".getBytes))
    intercept[IllegalArgumentException](Subtitles.parseVtt("WEBVTT\n\nno cues".getBytes))
  }
}
