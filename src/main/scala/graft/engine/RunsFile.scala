package graft.engine

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

/**
 * Incremental-skip state (reference earthmover/runs_file.py +
 * earthmover.py:282-341): hash the compiled config, parameters, every
 * hashable source file, destination template and map_file; append one row
 * per run to `state_file`; when the newest compatible prior run has
 * identical hashes, execution is skipped and the CLI exits 99
 * (docs/usage.md "State").
 *
 * Row format (tab-separated): timestamp, config_hash, sources_hash,
 * templates_hash, mapfiles_hash, params_hash, selector.
 */
object RunsFile {

  final case class RunHash(configHash: String, sourcesHash: String,
                           templatesHash: String, mapFilesHash: String,
                           paramsHash: String, selector: String,
                           hashable: Boolean = true) {
    def same(o: RunHash): Boolean =
      configHash == o.configHash && sourcesHash == o.sourcesHash &&
        templatesHash == o.templatesHash && mapFilesHash == o.mapFilesHash &&
        paramsHash == o.paramsHash
  }

  def md5file(p: Path): String = {
    val md = MessageDigest.getInstance("MD5")
    val in = Files.newInputStream(p)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map(b => f"$b%02x").mkString
  }

  def md5str(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** Collect every hashable input of the project. */
  def computeHash(project: Config.Project, params: Map[String, String],
                  selector: String): RunHash = {
    def resolved(f: String): Path = {
      val p = Paths.get(f)
      if (p.isAbsolute) p else project.configDir.resolve(f)
    }
    def fileHashes(files: Seq[String]): String =
      md5str(files.sorted.map { f =>
        val p = resolved(f)
        if (Files.exists(p) && Files.isRegularFile(p)) s"$f=${md5file(p)}" else s"$f=missing"
      }.mkString("\n"))

    val sourceCfgs = project.sources.values.map(Config.asMap).toSeq
    val sourceFiles = sourceCfgs.flatMap(c => Config.str(c, "file"))
    // Reference earthmover.py:295-303: connection-based sources cannot be
    // hashed, and directory file-sources cannot be hashed efficiently — either
    // forces a regenerate (skip disabled) because we cannot know if they changed.
    val allHashable =
      sourceCfgs.forall(c => Config.str(c, "file").nonEmpty) &&
        sourceFiles.forall(f => !Files.isDirectory(resolved(f)))
    val templates = project.destinations.values.flatMap(v => Config.str(Config.asMap(v), "template")).toSeq
    val mapFiles = project.transformations.values.flatMap { t =>
      Config.asList(Config.asMap(t).getOrElse("operations", Nil))
        .flatMap(o => Config.str(Config.asMap(o), "map_file"))
    }.toSeq

    RunHash(
      configHash = md5str(project.raw.toString),
      sourcesHash = fileHashes(sourceFiles),
      templatesHash = fileHashes(templates),
      mapFilesHash = fileHashes(mapFiles),
      paramsHash = md5str(params.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("&")),
      selector = selector,
      hashable = allHashable,
    )
  }

  /** True when the newest compatible prior run (same config hash, selector
    * covering this one — we require equality for simplicity, documented)
    * matches all hashes → skip. */
  def shouldSkip(stateFile: Path, h: RunHash): Boolean = {
    if (!h.hashable) return false // unhashable inputs → always regenerate
    if (!Files.exists(stateFile)) return false
    Files.readAllLines(stateFile).asScala.reverseIterator
      .map(_.split("\t", -1))
      .collectFirst {
        case f if f.length >= 7 && f(1) == h.configHash && f(6) == h.selector =>
          RunHash(f(1), f(2), f(3), f(4), f(5), f(6))
      }
      .exists(_.same(h))
  }

  def record(stateFile: Path, h: RunHash): Unit = {
    Files.createDirectories(stateFile.toAbsolutePath.getParent)
    val row = Seq(java.time.Instant.now().toString, h.configHash, h.sourcesHash,
      h.templatesHash, h.mapFilesHash, h.paramsHash, h.selector).mkString("\t") + "\n"
    Files.writeString(stateFile, row,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }
}
