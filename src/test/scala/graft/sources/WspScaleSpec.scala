package graft.sources

import graft.model.{AggregationMethod, Retention, WhisperSchema}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Many-file scale model for the DSv2 source (SURVEY S5): a whisper
  * deployment is millions of SMALL files, so the planner must bin-pack
  * tasks by BYTES (`spark.sql.files.maxPartitionBytes`), never
  * one-task-per-file, and `metricGlob` pruning must shrink the plan to
  * the matching subtree. A real ~5,000-file tree keeps the claim
  * evidence-backed, not asserted.
  */
class WspScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // single 10s:6pts archive → 16 + 12 + 6·12 = 100 bytes per file
  private val schema = WhisperSchema(
    Seq(Retention(10, 6)), AggregationMethod.Sum, 0.0)
  private val FileBytes = 100L
  private val NFiles = 5000

  test("5,000-file tree: tasks track maxPartitionBytes (bytes, not file count); glob pruning holds the plan flat") {
    val dir = Files.createTempDirectory("wsp_scale").toString
    val info = WspCodec.archiveInfos(schema).head
    for (s <- 0 until 50; h <- 0 until 100) {
      val d = Paths.get(dir, s"shard$s", s"host$h")
      Files.createDirectories(d)
      val bytes = WspCodec.emptyFile(schema)
      assert(bytes.length == FileBytes)
      WspCodec.writeArchive(bytes, info, Seq((1000L, 1.0)))
      Files.write(d.resolve("cpu.wsp"), bytes)
    }
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      // 8 KiB cap → 81 files/bin → ⌈5000/81⌉ = 62 planned tasks. Exact
      // next-fit arithmetic on purpose: a regression to per-file tasks
      // (5000) or per-directory tasks would be orders off, and a
      // packing change that drifts the count materially should be a
      // conscious decision.
      spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
      val df = spark.read.format("wsp").load(dir)
      val parts = df.rdd.getNumPartitions
      val expect = math.ceil(NFiles.toDouble * FileBytes / 8192).toInt
      assert(parts >= expect && parts <= expect + 2,
        s"task count $parts does not track bytes (expected ~$expect)")
      assert(df.count() == NFiles) // one live point per file

      // doubling the byte cap halves the plan — bytes drive it
      spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
      val halved = spark.read.format("wsp").load(dir).rdd.getNumPartitions
      assert(halved >= expect / 2 - 1 && halved <= expect / 2 + 2,
        s"doubling maxPartitionBytes gave $halved tasks (had $parts)")

      // a cap above the whole tree's bytes plans ONE task for 5,000
      // files — the definitive not-per-file proof
      spark.conf.set("spark.sql.files.maxPartitionBytes", (1 << 20).toString)
      assert(spark.read.format("wsp").load(dir).rdd.getNumPartitions == 1)

      // metricGlob pruning: only shard7's 100 files are planned — the
      // task count stays flat no matter how wide the rest of the tree
      spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
      val globbed = spark.read.format("wsp")
        .option("metricGlob", "shard7.*.cpu").load(dir)
      assert(globbed.rdd.getNumPartitions <= 2,
        "glob-pruned plan should cover ~10 KB, not the whole tree")
      assert(globbed.select("metric").distinct().count() == 100)

      // pushed metric equality prunes to exactly one file → one task
      val one = spark.read.format("wsp").load(dir)
        .filter(col("metric") === "shard3.host42.cpu")
      assert(one.rdd.getNumPartitions == 1)
      assert(one.count() == 1)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
