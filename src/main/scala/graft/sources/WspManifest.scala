package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** Parquet manifest for a `.wsp` tree — the ≥1M-file planning path
  * (SURVEY §2.1 "Million-file tree planning"; r12 verdict action #4).
  *
  * The default planner is a DRIVER-side filesystem walk: O(files) per
  * batch plan and per streaming micro-batch, ~100 bytes of driver heap
  * per file — sound to ~1M files and zero-infrastructure, but past that
  * the walk itself is the bottleneck (the same listing wall every big
  * table format hit before external metadata). The manifest is the
  * documented scale answer, now implemented: a parquet table
  * `(metric, path, len, mtime, schema_digest)` under
  * `<root>/_wsp_manifest`, so planning becomes a PRUNED COLUMNAR SCAN —
  * metric equality/`In` pushes into the parquet reader, glob prunes in
  * the same distributed pass — and only the matching file rows ever
  * reach the driver. The streaming `latestOffset` becomes `max(mtime)`
  * over the manifest: a tiny distributed aggregate instead of a
  * million-file re-walk every micro-batch.
  *
  * Lifecycle (LWW rows, the engine's own merge discipline):
  *  - [[rebuild]] — distributed listing job: the root's child shards
  *    fan out over executors, each walks its subtree and reads the
  *    64-ish-byte header for the geometry digest; one overwrite.
  *  - writers maintain it incrementally: [[WspWrite.export]]/[[
  *    WspWrite.merge]] append one row per published file WHEN a
  *    manifest exists (the rename-publish already touches the parent
  *    dir; the append is a tiny parquet file per write JOB, not per
  *    file). The DSv2 writer path flushes executor-side and its commit
  *    messages carry only counts — trees written through it refresh
  *    with [[rebuild]].
  *  - readers ([[WspScan]] under the `manifest` read option) take the
  *    max-mtime row per path, so re-publishes supersede without
  *    rewriting the table. Deletions need a [[rebuild]] (documented:
  *    retention vacuuming is batch-cadence anyway); a manifest row
  *    whose file vanished fails the read loudly, never silently.
  */
object WspManifest {

  val DirName = "_wsp_manifest"

  def pathFor(root: String): String =
    s"${root.stripSuffix("/")}/$DirName"

  /** Geometry digest shared by rebuild (from the on-disk header) and
    * the writer append path (from the write schema): md5 of the
    * ordered `(secondsPerPoint, numberOfPoints)` list.
    */
  def schemaDigest(archives: Seq[(Int, Int)]): String = {
    val s = archives.map { case (spp, n) => s"$spp:$n" }.mkString(",")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def exists(spark: SparkSession, root: String): Boolean = {
    val p = new Path(pathFor(root))
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Rebuild the manifest with a DISTRIBUTED listing job: one driver
    * listing of the root's immediate children, then each child shard is
    * walked executor-side (`mapPartitions` over the shard paths — the
    * SURVEY design), reading each file's header for the digest. Returns
    * the file count.
    */
  def rebuild(spark: SparkSession, root: String): Long = {
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf.value)
    val qualified = fs.makeQualified(rootPath)
    val rootStr = qualified.toString
    // shards: the root's children (minus the manifest itself), expanded
    // BREADTH-FIRST until there are enough to occupy the cluster — a
    // carbon tree routinely has ONE dominant top-level directory
    // (`servers/`), and sharding only one level deep would put the
    // whole 1M-file walk on a single executor core (r15 review), the
    // exact driver-adjacent bottleneck the manifest exists to remove.
    // Each expansion level costs one driver listStatus per directory
    // shard, bounded by the depth cap. Files ride along as single-file
    // shards at every level.
    val target = math.max(1, spark.sparkContext.defaultParallelism)
    var shardSts = fs.listStatus(qualified)
      .filterNot(_.getPath.getName == DirName).toSeq
    var depth = 1
    while (shardSts.size < target && depth < 4 &&
      shardSts.exists(_.isDirectory)) {
      shardSts = shardSts.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st)
      }
      depth += 1
    }
    val shards = shardSts.map(_.getPath.toString)
    import spark.implicits._
    val rows =
      if (shards.isEmpty) spark.emptyDataset[(String, String, Long, Long, String)]
      else spark.createDataset(shards)
        .repartition(shards.size)
        .mapPartitions { it =>
          it.flatMap { shard =>
            val p = new Path(shard)
            val sfs = p.getFileSystem(conf.value)
            val nameRoot = new Path(rootStr)
            val out = Seq.newBuilder[(String, String, Long, Long, String)]
            def emit(st: org.apache.hadoop.fs.FileStatus): Unit =
              if (st.getPath.getName.endsWith(".wsp")) {
                val metric = WspTable.metricFor(nameRoot, st.getPath)
                out += ((metric, st.getPath.toString, st.getLen,
                  st.getModificationTime, headerDigest(sfs, st.getPath)))
              }
            def walk(d: Path): Unit =
              sfs.listStatus(d).foreach { st =>
                if (st.isDirectory) walk(st.getPath) else emit(st)
              }
            val st = sfs.getFileStatus(p)
            if (st.isFile) emit(st) else walk(p)
            out.result()
          }
        }
    val df = rows.toDF("metric", "path", "len", "mtime", "schema_digest")
    df.write.mode("overwrite").parquet(pathFor(root))
    spark.read.parquet(pathFor(root)).count()
  }

  /** The on-disk geometry digest: header bytes only — metadata to learn
    * the archive count, then the archive-info table. ~100 bytes per
    * file, executor-side, rebuild-only.
    */
  private def headerDigest(fs: FileSystem, p: Path): String = {
    val len = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      val meta = new Array[Byte](WspCodec.MetadataSize)
      in.readFully(0, meta)
      val n = WspCodec.archiveCount(meta, p.toString)
      val hdr = new Array[Byte](WspCodec.headerSize(n))
      in.readFully(0, hdr)
      // totalLen = the real file length, so ring-fit validation checks
      // the FILE, not this header-only buffer
      val parsed = WspCodec.readHeader(hdr, p.toString, totalLen = len)
      schemaDigest(parsed.archives.map(a => (a.secondsPerPoint, a.numberOfPoints)))
    } finally in.close()
  }

  /** Incremental maintenance after a write job: stat the published file
    * of every touched metric (executor-side, partition-grained) and
    * append the fresh rows. The write schema supplies the digest — no
    * file re-read. No-op contractually ONLY when called; [[WspWrite]]
    * calls it when [[exists]].
    */
  def appendForMetrics(
      spark: SparkSession,
      root: String,
      schema: graft.model.WhisperSchema,
      metrics: DataFrame): Unit = {
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val digest = schemaDigest(
      schema.retentions.map(r => (r.secondsPerPoint, r.numberOfPoints)))
    val rootStr = root
    import spark.implicits._
    val rows = metrics.select(col("metric").cast("string")).as[String]
      .mapPartitions { ms =>
        // one FileSystem per partition — every path shares the root's
        // scheme, so a single handle serves the whole iterator
        var fs: FileSystem = null
        ms.map { m =>
          val p = new Path(rootStr, s"${m.replace('.', '/')}.wsp")
          if (fs == null) fs = p.getFileSystem(conf.value)
          val st = fs.getFileStatus(p)
          (m, fs.makeQualified(p).toString, st.getLen,
            st.getModificationTime, digest)
        }
      }
      .toDF("metric", "path", "len", "mtime", "schema_digest")
    rows.write.mode("append").parquet(pathFor(root))
  }

  /** The RAW manifest rows (appends included). Callers filter on
    * `metric` HERE — below the per-path dedupe — so the predicates push
    * into the parquet scan; metric is a pure function of path, so
    * pre-filtering commutes with supersede-dedup. Fails loudly when the
    * manifest is absent.
    */
  def raw(spark: SparkSession, root: String): DataFrame = {
    val p = pathFor(root)
    require(exists(spark, root),
      s"wsp manifest not found at $p — build it first: " +
        "graft.sources.WspManifest.rebuild(spark, root)")
    spark.read.parquet(p)
  }

  /** Latest row per path (max mtime; appends supersede). Apply AFTER
    * any metric filters on the [[raw]] frame — a filter placed above
    * this aggregate cannot reach the parquet scan.
    *
    * Ordered by `(mtime, len, schema_digest)` — a TOTAL order over the
    * payload — not mtime alone: coarse filesystem mtime granularity (or
    * a rebuild overlapping a writer append) can publish two rows for
    * one path with EQUAL mtimes, and a bare max_by tie is ARBITRARY
    * between runs — a reader could plan with a stale file length on one
    * run and not the next (r13 ADVICE). The common tie (writer in-place
    * point update racing a rebuild) carries the SAME len AND digest —
    * whisper files are fixed-size rings — so any pick is correct; ties
    * that differ in len (a resize inside one mtime tick) or in digest
    * alone (a same-size header rewrite, e.g. an aggregation-method
    * change) have no ordering information left, and the full
    * lexicographic struct at least makes the pick DETERMINISTIC across
    * runs — the property the fix is for (r14 review: the (mtime, len)
    * form still left the same-len/different-digest tie arbitrary).
    */
  def live(rows: DataFrame): DataFrame =
    rows.groupBy(col("path"))
      .agg(max_by(
        struct(col("metric"), col("len"), col("mtime"), col("schema_digest")),
        struct(col("mtime"), col("len"), col("schema_digest"))).as("w"))
      .select(col("w.metric").as("metric"), col("path"),
        col("w.len").as("len"), col("w.mtime").as("mtime"),
        col("w.schema_digest").as("schema_digest"))

  /** The full live view (no pruning) — convenience over [[raw]]+[[live]].
    * The streaming offset does NOT come through here: [[WspScan.maxMtime]]
    * aggregates `max(mtime)` over the (pruned) raw rows directly — exact
    * because appended rows only ever carry newer mtimes for their path —
    * so nothing but the scalar reaches the driver per poll.
    */
  def read(spark: SparkSession, root: String): DataFrame =
    live(raw(spark, root))
}
