package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Float determinism (SURVEY §2.0 r6): every query rounds doubles to 6
  * decimals at the output edge, and at the driver's sf0.01 the hashes
  * match exactly. At sf>=0.1 the avg family can differ from DuckDB by
  * 1 ulp BEFORE that round (different summation order over 10x the
  * addends) and flip the 6th decimal at an exact .5 boundary — a
  * rounding-edge artifact, not a semantic divergence. tools/
  * check_oracle.py carries the diagnostic fallback (value-equal within
  * 1e-6 reports `OK~`), so a future driver bump to sf0.1 can be triaged
  * as edge-vs-real in one local run. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [key ...] — extra args restrict the dump to
    // those query keys (local iteration aid; the driver passes exactly 2)
    val Seq(sfDir, outDir, only @ _*) = args.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
