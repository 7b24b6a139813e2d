package graft.engine

import graft.SparkSpec
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/**
 * The reference's own acceptance suite, run through this engine verbatim:
 * compile+execute tests/earthmover.yaml (reference earthmover/tests/) with
 * the stock sources and templates, then sorted-line-diff every file under
 * tests/expected/ against our output — the exact harness contract of the
 * reference `-t` command (earthmover.py:422-450: strip lines, sort,
 * compare).
 *
 * This adversarially exercises the full YAML surface in one project:
 * chained joins, compile-time Jinja loops generating ops and destinations,
 * nested-object Jinja over cities.jsonl, wildcard column ops, melt/pivot
 * round-trip, date_format month-name parsing, json_array_agg framing.
 */
class GoldenSpec extends SparkSpec {

  private val testsDir = Paths.get("/root/reference/earthmover/tests")

  /** One engine run shared by all per-file assertions. */
  private lazy val outDir: Path = {
    val out = Files.createTempDirectory("graft-golden")
    val engine = new Engine(spark)
    engine.run(
      testsDir.resolve("earthmover.yaml").toString,
      selector = "*",
      params = Map(
        "BASE_DIR" -> testsDir.toString,
        "OUTPUT_DIR" -> out.toString))
    out
  }

  private def sortedLines(p: Path): Vector[String] =
    Files.readAllLines(p).asScala.toVector.map(_.strip()).sorted

  private val expectedFiles: Seq[String] =
    if (Files.isDirectory(testsDir.resolve("expected")))
      Files.list(testsDir.resolve("expected")).iterator().asScala
        .map(_.getFileName.toString).toSeq.sorted
    else Seq.empty

  assume(expectedFiles.nonEmpty, s"reference tests dir not present at $testsDir")

  expectedFiles.foreach { fname =>
    test(s"golden: $fname matches reference expected output") {
      val exp = sortedLines(testsDir.resolve("expected").resolve(fname))
      val outPath = outDir.resolve(fname)
      assert(Files.exists(outPath), s"engine did not write $fname")
      val got = sortedLines(outPath)
      if (exp != got) {
        val diffs = exp.zipAll(got, "<missing>", "<extra>")
          .filter { case (a, b) => a != b }.take(5)
          .map { case (a, b) => s"  expected: $a\n  actual:   $b" }
        fail(s"$fname mismatch (${exp.size} expected lines, ${got.size} actual):\n${diffs.mkString("\n")}")
      }
    }
  }
}
