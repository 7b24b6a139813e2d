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
    var i = 1
    while (i < args.length) {
      args(i) match {
        case "-c" | "--config" => config = args(i + 1); i += 2
        case "-s" | "--select" => selector = args(i + 1); i += 2
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
        val spark = session()
        try {
          val result = new Engine(spark).run(config, selector, params,
            outputDir.map(java.nio.file.Paths.get(_)))
          result.written.foreach { case (node, path) => println(s"$node -> $path") }
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
      """usage: graft <run|compile> [-c config.yaml] [-s selector] [-p K=V,...] [--output-dir DIR]""")
}
