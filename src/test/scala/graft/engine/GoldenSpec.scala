package graft.engine

import graft.SparkSpec
import java.nio.file.{Files, Path, Paths}

/**
 * The reference's own acceptance suite, run through this engine verbatim:
 * compile+execute tests/earthmover.yaml (reference earthmover/tests/) with
 * the stock sources and templates, then sorted-line-diff every file under
 * tests/expected/ against our output — the exact harness contract of the
 * reference `-t` command (earthmover.py:422-450; see engine.Golden).
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
    Golden.execute(spark, testsDir, out)
    out
  }

  private val expectedFiles: Seq[String] = Golden.expectedFiles(testsDir)

  assume(expectedFiles.nonEmpty, s"reference tests dir not present at $testsDir")

  expectedFiles.foreach { fname =>
    test(s"golden: $fname matches reference expected output") {
      Golden.compareFile(testsDir, outDir, fname).foreach(fail(_))
    }
  }
}
