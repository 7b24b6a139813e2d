package graft.engine

import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._
import graft.template.Jinja

/**
 * YAML project compilation, mirroring the reference's load pipeline
 * (reference earthmover/yaml_parser.py, earthmover.py:125-198):
 *
 *  1. pre-pass: extract the `config:` block before any rendering (so macros /
 *     parameter_defaults are available to the full render);
 *  2. `${PARAM}` substitution from (defaults ← env ← CLI params);
 *  3. whole-file compile-time Jinja render (macros prepended; runtime Jinja
 *     must be `{%raw%}`-wrapped, as the reference documents);
 *  4. YAML parse (snakeyaml, on the unmanaged Spark classpath);
 *  5. `version: 2` check.
 *
 * The parsed document is held as plain Scala Map/List/String values.
 */
object Config {

  type Node = Any // Map[String, Any] | List[Any] | String | Int | Boolean | null

  final case class Project(
      raw: Map[String, Any],
      configDir: Path,
      sourceName: Option[String] = None,
      lineOf: Map[String, Int] = Map.empty,
  ) {
    def config: Map[String, Any] = section("config")
    def sources: Map[String, Any] = section("sources")
    def transformations: Map[String, Any] = section("transformations")
    def destinations: Map[String, Any] = section("destinations")
    private def section(name: String): Map[String, Any] =
      raw.get(name).map(asMap).getOrElse(Map.empty)
    def outputDir: String = config.get("output_dir").map(_.toString).getOrElse("./output")
    /** `file.yaml:LINE` for a dotted config path (`transformations.t1.
      * operations.0`), when the source file and line are known (reference
      * yaml_parser.py:97-111 tracks a __line__ per mapping). */
    def locate(path: String): Option[String] =
      for { f <- sourceName; l <- lineOf.get(path) } yield s"$f:$l"
  }

  def asMap(v: Any): Map[String, Any] = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case null => Map.empty
    case other => throw new IllegalArgumentException(s"expected mapping, found $other")
  }

  def asList(v: Any): List[Any] = v match {
    case l: List[_] => l
    case null => Nil
    case other => throw new IllegalArgumentException(s"expected list, found $other")
  }

  /** List-or-scalar: the reference accepts `id_vars: species` as shorthand
    * for a one-element list (operations/dataframe.py melt/keep/drop). */
  def asScalarList(v: Any): List[Any] = v match {
    case l: List[_] => l
    case null => Nil
    case other => List(other)
  }

  def str(m: Map[String, Any], key: String): Option[String] = m.get(key).map(_.toString)
  def reqStr(m: Map[String, Any], key: String, ctx: String): String =
    str(m, key).getOrElse(throw new IllegalArgumentException(s"$ctx: missing required `$key`"))
  def bool(m: Map[String, Any], key: String, default: Boolean = false): Boolean =
    m.get(key).map(_.toString.toBoolean).getOrElse(default)
  def int(m: Map[String, Any], key: String): Option[Int] = m.get(key).map(_.toString.toInt)

  /** Load + compile a project YAML from disk. */
  def load(path: String, cliParams: Map[String, String] = Map.empty): Project = {
    val p = Paths.get(path).toAbsolutePath
    compile(Files.readString(p), p.getParent, cliParams, Some(p.getFileName.toString))
  }

  /** Compile a project YAML source string. */
  def compile(source: String, configDir: Path, cliParams: Map[String, String] = Map.empty,
              sourceName: Option[String] = None): Project = {
    // 1. config pre-pass on the raw text (un-rendered; the reference uses an
    // event-level scan — parsing just the config block works for the same
    // reason: it must not depend on params/macros)
    val preConfig = preParseConfig(source)
    val macros = preConfig.get("macros").map(_.toString).getOrElse("")
    val paramDefaults = preConfig.get("parameter_defaults").map(asMap).getOrElse(Map.empty)
      .map { case (k, v) => k -> v.toString }

    // 2. ${PARAM} substitution: defaults ← environment ← CLI -p params
    val params = paramDefaults ++ sys.env ++ cliParams
    val substituted = substituteParams(source, params)

    // 3. compile-time Jinja render with macros in scope
    val rendered = Jinja.render(macros + substituted, params.map { case (k, v) => k -> (v: Any) })

    // 4-5. parse + version check
    val doc = parseYaml(rendered)
    val root = asMap(doc)
    root.get("version").map(_.toString) match {
      case Some("2") => ()
      case other => throw new IllegalArgumentException(
        s"config file is missing `version: 2` (found: $other) — incompatible project")
    }
    Project(mergePackages(root, configDir, cliParams), configDir,
      sourceName, lineMapOf(substituted))
  }

  /** Dotted path → 1-based source line, from snakeyaml's composed node graph
    * (every Node carries a start Mark). Computed on the PARAM-SUBSTITUTED
    * text, not the Jinja-rendered one: `${X}` substitution is
    * line-preserving, so lines match the file the user edits; a document
    * whose structure only parses after the compile-time Jinja pass degrades
    * to an empty map (errors then simply carry no line info).
    *
    * Any Jinja construct ({% loops/conditionals, {{ expressions }}) can
    * generate or shift entries, making the rendered document's paths (e.g.
    * `operations.2`) resolve to the WRONG pre-render line — worse than no
    * location. So the presence of Jinja tags also degrades to the empty
    * map rather than risking a misdirecting file:line. */
  private[engine] def lineMapOf(substituted: String): Map[String, Int] = {
    if (substituted.contains("{%") || substituted.contains("{{")) return Map.empty
    import org.yaml.snakeyaml.nodes.{MappingNode, ScalarNode, SequenceNode}
    val acc = Map.newBuilder[String, Int]
    def walk(node: org.yaml.snakeyaml.nodes.Node, path: String): Unit = node match {
      case m: MappingNode =>
        m.getValue.asScala.foreach { t =>
          t.getKeyNode match {
            case k: ScalarNode =>
              val p = if (path.isEmpty) k.getValue else s"$path.${k.getValue}"
              acc += (p -> (k.getStartMark.getLine + 1))
              walk(t.getValueNode, p)
            case _ => ()
          }
        }
      case s: SequenceNode =>
        s.getValue.asScala.zipWithIndex.foreach { case (c, i) =>
          val p = s"$path.$i"
          acc += (p -> (c.getStartMark.getLine + 1))
          walk(c, p)
        }
      case _ => ()
    }
    try {
      val root = new org.yaml.snakeyaml.Yaml().compose(new java.io.StringReader(substituted))
      if (root != null) walk(root, "")
      acc.result()
    } catch { case _: Exception => Map.empty }
  }

  /** Package composition (reference earthmover.py:472-500 + package.py):
    * each entry under `packages:` is loaded (recursively — packages can
    * declare packages), its relative file paths rebased to the package
    * directory, and deep-merged post-order with the PROJECT winning over
    * packages and later packages over earlier ones.
    *
    * Resolution order per package: the INSTALLED copy under
    * `<configDir>/packages/<name>` (what `deps` wrote — the reference's only
    * mode, package.py:67-76) wins when present; `local:` packages
    * additionally fall back to their source directory in place, so a purely
    * local project composes without an install step. `git:` packages exist
    * only installed — referencing one before `deps` has run is an error. */
  private def mergePackages(root: Map[String, Any], configDir: Path,
                            cliParams: Map[String, String]): Map[String, Any] =
    root.get("packages") match {
      case None => root
      case Some(pkgsAny) =>
        val pkgBase = asMap(pkgsAny).foldLeft(Map.empty[String, Any]) {
          case (acc, (name, pcfgAny)) =>
            val pcfg = asMap(pcfgAny)
            val installedDir = configDir.resolve("packages").resolve(name).normalize()
            val pdir = (str(pcfg, "local"), str(pcfg, "git")) match {
              case (Some(local), _) =>
                if (Files.isDirectory(installedDir)) installedDir
                else configDir.resolve(local).normalize()
              case (None, Some(_)) =>
                if (Files.isDirectory(installedDir)) installedDir
                else throw new IllegalArgumentException(
                  s"the package '$name' has not been installed — run a `deps` command to install packages")
              case _ => throw new IllegalArgumentException(
                s"package `$name`: packages must specify either a `local` folder path or a `git` package URL")
            }
            val pfile = Packages.installedConfigFile(pdir)
              .getOrElse(throw new IllegalArgumentException(
                s"package `$name`: no graft.yaml/earthmover.yaml under $pdir"))
            val sub = compile(Files.readString(pfile), pdir, cliParams).raw
            asMap(deepMerge(acc, rebasePaths(sub, pdir))) // later packages win over earlier
        }
        asMap(deepMerge(pkgBase, root.removed("packages"))) // the project wins
    }

  /** Recursive merge: mappings merge key-wise (the second argument wins on
    * conflicts — YamlMapping.update parity, yaml_parser.py:16-31); any other
    * value is replaced. */
  private[engine] def deepMerge(base: Any, over: Any): Any = (base, over) match {
    case (b: Map[_, _], o: Map[_, _]) =>
      val bm = b.asInstanceOf[Map[String, Any]]
      val om = o.asInstanceOf[Map[String, Any]]
      val keys = bm.keys ++ om.keys.filterNot(bm.contains)
      scala.collection.immutable.ListMap(keys.toSeq.map { k =>
        k -> ((bm.get(k), om.get(k)) match {
          case (Some(bv), Some(ov)) => deepMerge(bv, ov)
          case (Some(bv), None) => bv
          case (None, Some(ov)) => ov
          case _ => null
        })
      }: _*)
    case (_, o) => o
  }

  /** Rewrite a package's relative `file:` / `template:` / `map_file:` paths
    * to absolute paths under the package directory (package.py:89-119). */
  private def rebasePaths(doc: Map[String, Any], pdir: Path): Map[String, Any] = {
    def abs(v: String): String = {
      val p = Paths.get(v)
      if (p.isAbsolute || v.contains("://")) v else pdir.resolve(v).normalize().toString
    }
    def walk(node: Any, key: String): Any = node match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].map {
        case (k, v: String) if Set("file", "template", "map_file", "colspec_file").contains(k) => k -> abs(v)
        case (k, v) => k -> walk(v, k)
      }
      case l: List[_] => l.map(walk(_, key))
      case other => other
    }
    walk(doc, "").asInstanceOf[Map[String, Any]]
  }

  /** `${NAME}` substitution that leaves unknown params intact
    * (string.Template.safe_substitute parity, yaml_parser.py:220-234). */
  private[engine] def substituteParams(source: String, params: Map[String, String]): String = {
    val re = "\\$\\{([A-Za-z_][A-Za-z0-9_]*)\\}|\\$([A-Za-z_][A-Za-z0-9_]*)".r
    re.replaceAllIn(source, m => {
      val name = Option(m.group(1)).getOrElse(m.group(2))
      java.util.regex.Matcher.quoteReplacement(params.getOrElse(name, m.matched))
    })
  }

  /** Parse only the `config:` block from raw YAML — must not require params
    * or macros. Falls back to empty on parse failures of the full doc by
    * scanning for the top-level block. */
  private[engine] def preParseConfig(source: String): Map[String, Any] =
    try asMap(parseYaml(source)).get("config").map(asMap).getOrElse(Map.empty)
    catch {
      case _: Exception =>
        // raw doc may not parse pre-render (compile-time Jinja in other
        // sections); slice out the config block textually and parse just it
        val lines = source.linesIterator.toVector
        val start = lines.indexWhere(_.matches("^config:\\s*$"))
        if (start < 0) Map.empty
        else {
          val block = lines.drop(start + 1).takeWhile(l => l.isEmpty || l.startsWith(" ") || l.startsWith("\t"))
          try asMap(parseYaml("config:\n" + block.mkString("\n"))).get("config").map(asMap).getOrElse(Map.empty)
          catch { case _: Exception => Map.empty }
        }
    }

  /** `--set a.b.c value` dotted-path override (YamlMapping.set_path,
    * yaml_parser.py:34-41): intermediate mappings are created, the leaf is
    * autocast (bool/float/int detection, yaml_parser.py:44-55). */
  def setPath(root: Map[String, Any], path: String, value: String): Map[String, Any] = {
    def go(node: Map[String, Any], pieces: List[String]): Map[String, Any] = pieces match {
      case leaf :: Nil => node.updated(leaf, autocast(value))
      case head :: rest =>
        val child = node.get(head) match {
          case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
          case _ => Map.empty[String, Any]
        }
        node.updated(head, go(child, rest))
      case Nil => node
    }
    go(root, path.split("\\.").toList)
  }

  private[engine] def autocast(value: String): Any = {
    val lower = value.toLowerCase
    if (Seq("true", "yes", "on", "t", "y").contains(lower)) true
    else if (Seq("false", "no", "off", "f", "n").contains(lower)) false
    else if (value.contains("."))
      try value.toDouble catch { case _: NumberFormatException => value }
    else
      try value.toInt catch { case _: NumberFormatException => value }
  }

  /** Dump a compiled project back to YAML (the reference's
    * earthmover_compiled.yaml debugging aid, earthmover.py:29,171-172). */
  def dumpYaml(doc: Map[String, Any]): String = {
    def toJava(v: Any): Any = v match {
      case m: Map[_, _] =>
        val jm = new java.util.LinkedHashMap[String, Any]()
        m.asInstanceOf[Map[String, Any]].foreach { case (k, x) => jm.put(k, toJava(x)) }
        jm
      case l: List[_] => l.map(toJava).asJava
      case other => other
    }
    val opts = new org.yaml.snakeyaml.DumperOptions()
    opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
    new org.yaml.snakeyaml.Yaml(opts).dump(toJava(doc))
  }

  /** snakeyaml → immutable Scala structures. */
  def parseYaml(text: String): Any = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    toScala(yaml.load[Object](text))
  }

  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      // LinkedHashMap preserves YAML order; keep insertion order via ListMap
      val entries = m.asScala.toSeq.map { case (k, x) => k.toString -> toScala(x) }
      scala.collection.immutable.ListMap(entries: _*)
    case l: java.util.List[_] => l.asScala.toList.map(toScala)
    case other => other
  }
}
