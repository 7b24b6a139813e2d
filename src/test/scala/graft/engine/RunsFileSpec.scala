package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class RunsFileSpec extends AnyFunSuite {

  private def project(dir: java.nio.file.Path, dataContent: String): Config.Project = {
    Files.writeString(dir.resolve("d.csv"), dataContent)
    Config.compile(
      """version: 2
        |config:
        |  state_file: state.csv
        |sources:
        |  d:
        |    file: d.csv
        |destinations:
        |  out:
        |    source: $sources.d
        |""".stripMargin, dir)
  }

  test("unchanged inputs skip; any input change invalidates") {
    val dir = Files.createTempDirectory("graft-state")
    val state = dir.resolve("state.csv")
    val p1 = project(dir, "a\n1\n")
    val h1 = RunsFile.computeHash(p1, Map("X" -> "1"), "*")

    assert(!RunsFile.shouldSkip(state, h1)) // no prior run
    RunsFile.record(state, h1)
    assert(RunsFile.shouldSkip(state, h1)) // identical run → skip

    // source file content change invalidates
    val p2 = project(dir, "a\n2\n")
    val h2 = RunsFile.computeHash(p2, Map("X" -> "1"), "*")
    assert(!RunsFile.shouldSkip(state, h2))

    // parameter change invalidates
    val h3 = RunsFile.computeHash(p1, Map("X" -> "2"), "*")
    assert(!RunsFile.shouldSkip(state, h3))

    // different selector is not a compatible prior run
    val h4 = RunsFile.computeHash(p1, Map("X" -> "1"), "only_this")
    assert(!RunsFile.shouldSkip(state, h4))

    // recording the new state makes it skippable again
    RunsFile.record(state, h2)
    assert(RunsFile.shouldSkip(state, h2))
  }

  test("unhashable sources (connection / directory file) always regenerate") {
    // connection-based source: no `file` to hash → never skip
    // (reference earthmover.py:295-298)
    val dir = Files.createTempDirectory("graft-state-conn")
    val state = dir.resolve("state.csv")
    val p = Config.compile(
      """version: 2
        |config:
        |  state_file: state.csv
        |sources:
        |  remote:
        |    connection: jdbc:postgresql://example/db
        |    query: select 1
        |destinations:
        |  out:
        |    source: $sources.remote
        |""".stripMargin, dir)
    val h = RunsFile.computeHash(p, Map.empty, "*")
    assert(!h.hashable)
    RunsFile.record(state, h)
    assert(!RunsFile.shouldSkip(state, h)) // identical hashes, still no skip

    // directory file source cannot be efficiently hashed either
    // (earthmover.py:301-303)
    val dir2 = Files.createTempDirectory("graft-state-dir")
    Files.createDirectories(dir2.resolve("data"))
    val pDir = Config.compile(
      """version: 2
        |config:
        |  state_file: state.csv
        |sources:
        |  d:
        |    file: data
        |destinations:
        |  out:
        |    source: $sources.d
        |""".stripMargin, dir2)
    val hDir = RunsFile.computeHash(pDir, Map.empty, "*")
    assert(!hDir.hashable)
  }
}
