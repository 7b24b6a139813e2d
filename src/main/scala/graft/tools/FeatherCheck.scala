// scratch: validate the feather reader against real pyarrow files
package graft.tools
import org.apache.spark.sql.SparkSession

object FeatherCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (f <- Seq("/tmp/pyarrow_test.feather", "/tmp/pyarrow_zstd.feather")) {
      val df = graft.engine.Sources.read(spark, "f",
        Map("file" -> f), java.nio.file.Paths.get("/tmp"))
      println(s"$f -> ${df.schema.simpleString}")
      df.show()
    }
    spark.stop()
  }
}
