package graft.engine

import graft.SparkSpec
import graft.cli.Main
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** The `deps` package lifecycle (reference package.py / earthmover.py:454+):
  * git clones exercised OFFLINE against `file://` remotes — the same
  * transport/code path as a hosted URL, no network needed. */
class PackagesSpec extends SparkSpec {

  private def sh(cwd: Path, cmd: String*): String = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(cwd.toFile).redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() == 0, s"`${cmd.mkString(" ")}` failed:\n$out")
    out
  }

  private def gitInit(dir: Path): Unit = {
    sh(dir, "git", "init", "-q", "-b", "main")
    sh(dir, "git", "config", "user.email", "pkg@test")
    sh(dir, "git", "config", "user.name", "pkg")
  }

  private def commitAll(dir: Path, msg: String): Unit = {
    sh(dir, "git", "add", "-A")
    sh(dir, "git", "commit", "-q", "-m", msg)
  }

  /** A minimal package repo: one csv source + a transformation + dest. */
  private def writePackageYaml(dir: Path, origin: String): Unit = {
    Files.writeString(dir.resolve("base.csv"), "a\n1\n")
    Files.writeString(dir.resolve("earthmover.yaml"),
      s"""version: 2
         |sources:
         |  base:
         |    file: base.csv
         |transformations:
         |  t:
         |    source: $$sources.base
         |    operations:
         |      - operation: add_columns
         |        columns:
         |          origin: $origin
         |destinations:
         |  out:
         |    source: $$transformations.t
         |""".stripMargin)
  }

  test("deps clones a git package (file:// remote) and run composes it") {
    val dir = Files.createTempDirectory("graft-gitpkg")
    val remote = Files.createDirectories(dir.resolve("remote"))
    gitInit(remote)
    writePackageYaml(remote, "gitpkg")
    commitAll(remote, "package content")

    val proj = Files.createDirectories(dir.resolve("proj"))
    Files.writeString(proj.resolve("p.yaml"),
      s"""version: 2
         |config:
         |  output_dir: OUT
         |packages:
         |  ext:
         |    git: file://$remote
         |""".stripMargin)
    val cfg = proj.resolve("p.yaml").toString

    // before deps: a clear not-installed error, not a confusing merge failure
    val e = intercept[IllegalArgumentException](Config.load(cfg))
    assert(e.getMessage.contains("has not been installed"))

    assert(Main.dispatch(Array("deps", "-c", cfg)) == 0)
    assert(Files.isRegularFile(proj.resolve("packages/ext/earthmover.yaml")))

    // the composed project runs the package's pipeline, paths rebased to the
    // INSTALLED copy
    val out = proj.resolve("o")
    new Engine(spark).run(cfg, outputDir = Some(out))
    val lines = Files.readAllLines(out.resolve("out.jsonl")).asScala
    assert(lines.head == """{ "a": "1", "origin": "gitpkg" }""")

    // re-running deps reinstalls from scratch (upstream change is picked up)
    writePackageYaml(remote, "gitpkg2")
    commitAll(remote, "bump")
    assert(Main.dispatch(Array("deps", "-c", cfg)) == 0)
    assert(Files.readString(proj.resolve("packages/ext/earthmover.yaml")).contains("gitpkg2"))
  }

  test("branch and subdirectory selections clone what the reference would") {
    val dir = Files.createTempDirectory("graft-gitpkg-bs")
    val remote = Files.createDirectories(dir.resolve("remote"))
    gitInit(remote)
    // main: package lives under a subdirectory
    val sub = Files.createDirectories(remote.resolve("pkgs/inner"))
    Files.writeString(sub.resolve("base.csv"), "a\n9\n")
    Files.writeString(sub.resolve("graft.yaml"),
      "version: 2\nsources:\n  base:\n    file: base.csv\n")
    commitAll(remote, "main content")
    // a v2 branch with different root-level content
    sh(remote, "git", "checkout", "-q", "-b", "v2")
    writePackageYaml(remote, "branchpkg")
    commitAll(remote, "branch content")
    sh(remote, "git", "checkout", "-q", "main")

    val proj = Files.createDirectories(dir.resolve("proj"))
    Files.writeString(proj.resolve("p.yaml"),
      s"""version: 2
         |packages:
         |  subpkg:
         |    git: file://$remote
         |    subdirectory: pkgs/inner
         |  branched:
         |    git: file://$remote
         |    branch: v2
         |""".stripMargin)
    assert(Main.dispatch(Array("deps", "-c", proj.resolve("p.yaml").toString)) == 0)
    // subdirectory extracted to the package root (no pkgs/inner nesting)
    assert(Files.isRegularFile(proj.resolve("packages/subpkg/graft.yaml")))
    assert(Files.readString(proj.resolve("packages/subpkg/base.csv")) == "a\n9\n")
    // branch clone got the v2 tree
    assert(Files.readString(proj.resolve("packages/branched/earthmover.yaml"))
      .contains("branchpkg"))
    // tmp_git staging dir is cleaned up
    assert(!Files.exists(proj.resolve("packages/tmp_git")))
  }

  test("nested packages install under the parent's installed copy") {
    val dir = Files.createTempDirectory("graft-gitpkg-nest")
    val inner = Files.createDirectories(dir.resolve("inner"))
    gitInit(inner)
    writePackageYaml(inner, "innermost")
    commitAll(inner, "inner")

    val outer = Files.createDirectories(dir.resolve("outer"))
    gitInit(outer)
    Files.writeString(outer.resolve("earthmover.yaml"),
      s"""version: 2
         |packages:
         |  deep:
         |    git: file://$inner
         |""".stripMargin)
    commitAll(outer, "outer")

    val proj = Files.createDirectories(dir.resolve("proj"))
    Files.writeString(proj.resolve("p.yaml"),
      s"""version: 2
         |config:
         |  output_dir: OUT
         |packages:
         |  mid:
         |    git: file://$outer
         |""".stripMargin)
    val cfg = proj.resolve("p.yaml").toString
    assert(Main.dispatch(Array("deps", "-c", cfg)) == 0)
    assert(Files.isRegularFile(
      proj.resolve("packages/mid/packages/deep/earthmover.yaml")))

    // post-order merge: the innermost pipeline flows all the way up
    val out = proj.resolve("o")
    new Engine(spark).run(cfg, outputDir = Some(out))
    val lines = Files.readAllLines(out.resolve("out.jsonl")).asScala
    assert(lines.head == """{ "a": "1", "origin": "innermost" }""")
  }

  test("package cycles abort; a clone of a missing remote fails with git's error") {
    val dir = Files.createTempDirectory("graft-gitpkg-cycle")
    // a repo that declares ITSELF as a nested package: cycle by name chain
    val selfRef = Files.createDirectories(dir.resolve("selfref"))
    gitInit(selfRef)
    Files.writeString(selfRef.resolve("earthmover.yaml"),
      s"""version: 2
         |packages:
         |  loop:
         |    git: file://$selfRef
         |""".stripMargin)
    commitAll(selfRef, "self")
    // name the project-level entry `loop` too so the chain repeats
    val proj = Files.createDirectories(dir.resolve("proj"))
    Files.writeString(proj.resolve("p.yaml"),
      s"""version: 2
         |packages:
         |  loop:
         |    git: file://$selfRef
         |""".stripMargin)
    val e = intercept[IllegalArgumentException](
      Packages.installAll(proj.resolve("p.yaml"), _ => ()))
    assert(e.getMessage.contains("cycle"), e.getMessage)

    // missing remote: fail fast with the git output, not a later copy error
    val proj2 = Files.createDirectories(dir.resolve("proj2"))
    Files.writeString(proj2.resolve("p.yaml"),
      s"""version: 2
         |packages:
         |  ghost:
         |    git: file://$dir/definitely-not-a-repo
         |""".stripMargin)
    val e2 = intercept[IllegalArgumentException](
      Packages.installAll(proj2.resolve("p.yaml"), _ => ()))
    assert(e2.getMessage.contains("git clone failed"), e2.getMessage)
  }

  test("local packages install by copy and the installed copy wins over in-place") {
    val dir = Files.createTempDirectory("graft-localpkg")
    val src = Files.createDirectories(dir.resolve("pkgsrc"))
    writePackageYaml(src, "localpkg")
    val proj = Files.createDirectories(dir.resolve("proj"))
    Files.writeString(proj.resolve("p.yaml"),
      s"""version: 2
         |config:
         |  output_dir: OUT
         |packages:
         |  lp:
         |    local: ../pkgsrc
         |""".stripMargin)
    val cfg = proj.resolve("p.yaml").toString
    assert(Main.dispatch(Array("deps", "-c", cfg)) == 0)
    assert(Files.isRegularFile(proj.resolve("packages/lp/earthmover.yaml")))
    // source edits after install are NOT seen until deps runs again —
    // reference parity (merge reads the installed copy)
    writePackageYaml(src, "edited-after-install")
    val out = proj.resolve("o")
    new Engine(spark).run(cfg, outputDir = Some(out))
    val lines = Files.readAllLines(out.resolve("out.jsonl")).asScala
    assert(lines.head == """{ "a": "1", "origin": "localpkg" }""")
  }
}
