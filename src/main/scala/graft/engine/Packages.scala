package graft.engine

import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.concurrent.TimeUnit

/**
 * Package installation — the reference's `deps` lifecycle (package.py:
 * 52-66,139-211, earthmover.py:454-470,524-577): each `packages:` entry is
 * installed into `<project>/packages/<name>` — `local:` folders copied,
 * `git:` URLs cloned (optional `branch`, optional `subdirectory` extracted
 * from the clone) — then the installed package's own config file is scanned
 * for nested `packages:`, installed under `<package>/packages/`, and so on.
 * A package name repeating along an install chain is a dependency cycle and
 * aborts, mirroring the reference's DAG check (earthmover.py:546-551).
 *
 * Differences from the reference, both deliberate:
 *  - installs anchor at the CONFIG FILE's directory, not os.getcwd()
 *    (earthmover.py:107) — the same location when the CLI runs from the
 *    project dir (as the reference's own harness does), but stable when it
 *    doesn't;
 *  - a failed clone aborts with git's output instead of surfacing later as
 *    a copytree of a half-empty temp dir (package.py:188-191 ignores the
 *    exit status).
 *
 * Clones run with GIT_TERMINAL_PROMPT=0 plus the `git_auth_timeout` config
 * (default 60s, earthmover.py:46) so a credential prompt fails fast instead
 * of hanging an automated run — the same concern package.py:194-199 solves
 * with subprocess timeouts.
 */
object Packages {

  /** Install every package (and nested package) declared by `configFile`.
    * Returns the installed package names in install order. */
  def installAll(configFile: Path, log: String => Unit): Seq[String] = {
    val configDir = configFile.toAbsolutePath.getParent
    val raw = Files.readString(configFile)
    val doc = try Config.asMap(Config.parseYaml(raw))
      catch { case _: Exception => Map.empty[String, Any] }
    val pkgs = doc.get("packages").map(Config.asMap).getOrElse(Map.empty)
    val timeoutSec = Config.asMap(doc.getOrElse("config", Map.empty))
      .get("git_auth_timeout").map(_.toString.toDouble.toLong).getOrElse(60L)
    val installed = Seq.newBuilder[String]
    installInto(configDir, pkgs, configDir.resolve("packages"), Nil, timeoutSec,
      log, installed)
    installed.result()
  }

  private def installInto(baseDir: Path, pkgs: Map[String, Any], packagesDir: Path,
                          ancestry: List[String], timeoutSec: Long,
                          log: String => Unit, installed: scala.collection.mutable.Builder[String, Seq[String]]): Unit = {
    if (pkgs.isEmpty) return
    Files.createDirectories(packagesDir)
    pkgs.foreach { case (name, cfgAny) =>
      if (ancestry.contains(name))
        throw new IllegalArgumentException(
          s"the package graph has a cycle: ${(name :: ancestry).reverse.mkString(" -> ")} -> $name")
      val cfg = Config.asMap(cfgAny)
      log(s"installing '$name'...")
      val dest = packagesDir.resolve(name)
      deleteTree(dest) // reference re-installs from scratch (package.py:58-64)
      (Config.str(cfg, "local"), Config.str(cfg, "git")) match {
        case (Some(local), _) =>
          val src = baseDir.resolve(local).normalize()
          if (!Files.isDirectory(src))
            throw new IllegalArgumentException(
              s"local package '$name' not found: verify that the path is correct ($src)")
          copyTree(src, dest)
        case (None, Some(url)) =>
          val tmp = packagesDir.resolve("tmp_git")
          deleteTree(tmp)
          Files.createDirectories(tmp)
          try {
            val cmd = Config.str(cfg, "branch") match {
              case Some(b) => Seq("git", "clone", "-b", b, url, ".")
              case None => Seq("git", "clone", url, ".")
            }
            runGit(cmd, tmp, timeoutSec, name, url)
            val src = Config.str(cfg, "subdirectory") match {
              case Some(sub) =>
                val s = tmp.resolve(sub).normalize()
                if (!s.startsWith(tmp) || !Files.isDirectory(s))
                  throw new IllegalArgumentException(
                    s"package '$name': subdirectory `$sub` not found in the cloned repository")
                s
              case None => tmp
            }
            copyTree(src, dest)
          } finally deleteTree(tmp)
        case _ =>
          throw new IllegalArgumentException(
            s"package `$name`: packages must specify either a `local` folder path or a `git` package URL")
      }
      installed += name
      // nested packages, installed under the INSTALLED copy — raw parse is
      // enough to discover the `packages:` block; full Jinja/param handling
      // happens at merge time (Config.compile)
      val pfile = installedConfigFile(dest).getOrElse(
        throw new IllegalArgumentException(
          s"config file not found for package '$name' — the package needs a " +
            "graft.yaml or earthmover.yaml in its root directory"))
      val sub = try Config.asMap(Config.parseYaml(Files.readString(pfile)))
        catch { case _: Exception => Map.empty[String, Any] }
      val nested = sub.get("packages").map(Config.asMap).getOrElse(Map.empty)
      installInto(dest, nested, dest.resolve("packages"), name :: ancestry,
        timeoutSec, log, installed)
    }
  }

  /** The config file of an installed package (package.py:67-85). */
  def installedConfigFile(pkgDir: Path): Option[Path] =
    Seq("graft.yaml", "earthmover.yaml", "earthmover.yml")
      .map(pkgDir.resolve).find(Files.isRegularFile(_))

  private def runGit(cmd: Seq[String], cwd: Path, timeoutSec: Long,
                     name: String, url: String): Unit = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(cwd.toFile)
    pb.redirectErrorStream(true)
    pb.environment().put("GIT_TERMINAL_PROMPT", "0") // never prompt; fail instead
    val proc = pb.start()
    // drain stdout on a thread so a chatty clone can't fill the pipe and stall
    val out = new java.io.ByteArrayOutputStream()
    val drainer = new Thread(() => proc.getInputStream.transferTo(out))
    drainer.setDaemon(true)
    drainer.start()
    if (!proc.waitFor(timeoutSec, TimeUnit.SECONDS)) {
      proc.destroyForcibly()
      throw new IllegalArgumentException(
        s"git clone command timed out for the $name package ($url). " +
          "Are git credentials correctly configured?")
    }
    drainer.join(2000)
    if (proc.exitValue() != 0)
      throw new IllegalArgumentException(
        s"git clone failed for package '$name' ($url):\n" +
          new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8).trim)
  }

  private def copyTree(src: Path, dest: Path): Unit = {
    Files.walk(src).forEach { p =>
      val target = dest.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else {
        Files.createDirectories(target.getParent)
        Files.copy(p, target, StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.COPY_ATTRIBUTES)
      }
    }
  }

  private def deleteTree(p: Path): Unit = if (Files.exists(p) || Files.isSymbolicLink(p)) {
    if (Files.isSymbolicLink(p) || !Files.isDirectory(p)) Files.deleteIfExists(p)
    else {
      Files.list(p).forEach(deleteTree(_))
      Files.deleteIfExists(p)
    }
  }
}
