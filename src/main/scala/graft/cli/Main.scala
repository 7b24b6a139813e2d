package graft.cli

import org.apache.spark.sql.SparkSession
import graft.engine.{Config, Engine}

/**
 * CLI front-end (reference earthmover/__main__.py): `run` and `compile`
 * commands with `-c/--config`, `-s/--select`, `-p/--params K=V,...`,
 * `--output-dir`. Exit codes: 0 ok, 1 error (99 = skipped is reserved for
 * the runs-file state feature).
 */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); sys.exit(1) }
    val cmd = args.head
    var config = "graft.yaml"
    var selector = "*"
    var params = Map.empty[String, String]
    var outputDir: Option[String] = None
    var force = false
    var skipHashing = false
    var resultsFile: Option[String] = None
    var i = 1
    while (i < args.length) {
      args(i) match {
        case "-c" | "--config" => config = args(i + 1); i += 2
        case "-s" | "--select" => selector = args(i + 1); i += 2
        case "-f" | "--force" => force = true; i += 1
        case "-k" | "--skip-hashing" => skipHashing = true; i += 1
        case "--results-file" => resultsFile = Some(args(i + 1)); i += 2
        case "--output-dir" => outputDir = Some(args(i + 1)); i += 2
        case "-p" | "--params" =>
          params ++= args(i + 1).split(",").map { kv =>
            val p = kv.split("=", 2); p(0) -> (if (p.length > 1) p(1) else "")
          }
          i += 2
        case other => System.err.println(s"unknown argument: $other"); usage(); sys.exit(1)
      }
    }

    cmd match {
      case "run" =>
        val project = Config.load(config, params)
        // incremental skip (reference earthmover.py:282-341 + exit 99)
        val stateFile = project.config.get("state_file").map(v =>
          java.nio.file.Paths.get(v.toString))
        val hash = stateFile.filter(_ => !skipHashing)
          .map(_ => graft.engine.RunsFile.computeHash(project, params, selector))
        if (!force && stateFile.nonEmpty && hash.nonEmpty &&
            graft.engine.RunsFile.shouldSkip(stateFile.get, hash.get)) {
          println("skipping (no changes since last run) — use --force to run anyway")
          sys.exit(99)
        }
        val spark = session()
        try {
          val t0 = System.nanoTime()
          val engine = new Engine(spark)
          val result = engine.execute(engine.compile(project, selector),
            outputDir.map(java.nio.file.Paths.get(_)),
            collectCounts = resultsFile.nonEmpty)
          result.written.foreach { case (node, path) => println(s"$node -> $path") }
          (stateFile zip hash).foreach { case (f, h) => graft.engine.RunsFile.record(f, h) }
          resultsFile.foreach { rf =>
            // reference --results-file shape: per-node row_counts + timing
            val rows = result.rowCounts.toSeq.sortBy(_._1)
              .map { case (n, c) => s"""    "$n": $c""" }.mkString(",\n")
            val json =
              s"""{\n  "row_counts": {\n$rows\n  },\n  "seconds": ${(System.nanoTime() - t0) / 1e9}\n}\n"""
            java.nio.file.Files.writeString(java.nio.file.Paths.get(rf), json)
          }
        } finally spark.stop()
      case "compile" =>
        // validate only; dump the compiled project like the reference's
        // earthmover_compiled.yaml debugging aid
        val project = Config.load(config, params)
        val spark = session()
        try {
          new Engine(spark).compile(project, selector)
          println(s"compiled OK: ${project.sources.size} sources, " +
            s"${project.transformations.size} transformations, ${project.destinations.size} destinations")
        } finally spark.stop()
      case other =>
        System.err.println(s"unknown command: $other"); usage(); sys.exit(1)
    }
  }

  private def session(): SparkSession = SparkSession.builder()
    .master(sys.env.getOrElse("SPARK_MASTER", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]"))
    .appName("graft")
    .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def usage(): Unit =
    System.err.println(
      """usage: graft <run|compile> [-c config.yaml] [-s selector] [-p K=V,...] [-f] [-k] [--output-dir DIR] [--results-file F]""")
}
