package graft.engine

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/**
 * The reference's acceptance-test harness (`-t`, earthmover.py:422-450):
 * run the test project with selector `*`, then for every file under
 * `expected/`, sorted-line-diff it against the engine's output. Shared by
 * the CLI `-t` command and GoldenSpec.
 */
object Golden {

  /** Execute the test project (earthmover.yaml in `testsDir`) into `outDir`. */
  def execute(spark: SparkSession, testsDir: Path, outDir: Path): Unit = {
    val engine = new Engine(spark)
    engine.run(
      testsDir.resolve("earthmover.yaml").toString,
      selector = "*",
      params = Map(
        "BASE_DIR" -> testsDir.toString,
        "OUTPUT_DIR" -> outDir.toString))
  }

  def expectedFiles(testsDir: Path): Seq[String] = {
    val dir = testsDir.resolve("expected")
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator().asScala.map(_.getFileName.toString).toSeq.sorted
  }

  private def sortedLines(p: Path): Vector[String] =
    Files.readAllLines(p).asScala.toVector.map(_.strip()).sorted

  /** None = match; Some(message) = mismatch description. */
  def compareFile(testsDir: Path, outDir: Path, fname: String): Option[String] = {
    val exp = sortedLines(testsDir.resolve("expected").resolve(fname))
    val outPath = outDir.resolve(fname)
    if (!Files.exists(outPath)) return Some(s"$fname: engine did not write it")
    val got = sortedLines(outPath)
    if (exp == got) None
    else {
      val diffs = exp.zipAll(got, "<missing>", "<extra>")
        .filter { case (a, b) => a != b }.take(5)
        .map { case (a, b) => s"  expected: $a\n  actual:   $b" }
      Some(s"$fname mismatch (${exp.size} expected lines, ${got.size} actual):\n${diffs.mkString("\n")}")
    }
  }

  /** Full harness: execute + compare every expected file. Returns mismatch
    * messages (empty = all pass). */
  def runAll(spark: SparkSession, testsDir: Path): Seq[String] = {
    val out = Files.createTempDirectory("graft-golden")
    execute(spark, testsDir, out)
    expectedFiles(testsDir).flatMap(f => compareFile(testsDir, out, f))
  }
}
