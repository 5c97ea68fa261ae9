package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** `spark.read.format("wsp")` — a DataSource V2 batch reader for trees of
  * whisper `.wsp` files, the reference's on-disk format (SURVEY.md §2.1
  * S1: `Open`/`readHeader`). A go-whisper/graphite user points this at
  * their existing storage directory and gets the engine's relational
  * view with NO conversion step:
  *
  * {{{
  * spark.read.format("wsp").load("/var/lib/carbon/whisper/servers")
  *   // => metric | archive | spp | points | ts_s | value
  * }}}
  *
  * `metric` is the file's base name (whisper is file-per-series; the
  * directory tree IS the metric namespace — `a/b/c.wsp` → `a.b.c`),
  * `archive` the 0-based level index, `spp`/`points` that level's
  * resolution and ring size (the file's own geometry, so tree-level
  * consumers can validate it per row), `ts_s`/`value` the stored point.
  *
  * Scale design — a production whisper tree is millions of SMALL files
  * (file size is fixed by each series' retention config), the classic
  * many-small-files source:
  *  - files are bin-packed into input partitions up to
  *    `spark.sql.files.maxPartitionBytes`, so task count tracks data
  *    volume, not file count;
  *  - `metric` predicates (`EqualTo`/`In`) push down to FILE PRUNING at
  *    planning time — a one-series query opens one file, whisper-`Open`
  *    style, regardless of tree size; the `metricGlob` read option
  *    prunes the same way by graphite glob (`servers.*.cpu` opens only
  *    the matching files — the finder's filesystem walk, distributed);
  *  - `ts_s` range predicates push into the slot decoder (rows outside
  *    the range are never materialized — and the range filter is exactly
  *    the reference's F2 staleness semantics, which is only defined
  *    relative to a requested range);
  *  - column pruning is honored (a `count(*)` decodes no strings).
  *
  * Pushed `metric`/`ts_s` filters are absorbed exactly (not re-evaluated
  * above the scan); everything else stays in Catalyst.
  */
final class WspDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "wsp"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = WspTable.Schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new WspTable(WspTable.rootPaths(properties))
}

object WspScan {
  /** A directory's cached listing is only trusted once its mtime is at
    * least this old — within the quantum, an unchanged mtime proves
    * nothing (see [[WspScan.listFilesWithMtime]]).
    */
  val QuiescenceMs: Long = 2000L
}

object WspTable {
  /** Relational view of a `.wsp` tree. `ts_s` keeps SURVEY §1.3's
    * epoch-seconds BIGINT convention — whisper's native representation. */
  val Schema: StructType = StructType(Seq(
    StructField("metric", StringType, nullable = false),
    StructField("archive", IntegerType, nullable = false),
    StructField("spp", IntegerType, nullable = false),
    StructField("points", IntegerType, nullable = false),
    StructField("ts_s", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** `load(p1, p2, …)` arrives as a JSON array under "paths", a single
    * `load(p)` as "path" — accept both. */
  def rootPaths(properties: JMap[String, String]): Seq[String] = {
    val multi = Option(properties.get("paths")).map { json =>
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      implicit val formats: Formats = DefaultFormats
      JsonMethods.parse(json).extract[Seq[String]]
    }.getOrElse(Nil)
    val single = Option(properties.get("path")).toSeq
    val roots = (multi ++ single).distinct
    require(roots.nonEmpty, "wsp source requires a path: spark.read.format(\"wsp\").load(dir)")
    roots
  }

  /** Metric name for a file inside a root: the relative path with
    * separators → dots and `.wsp` stripped (graphite's tree↔name rule);
    * files passed directly (root IS the file) use their base name.
    */
  def metricFor(root: org.apache.hadoop.fs.Path, file: org.apache.hadoop.fs.Path): String = {
    val rootUri = root.toUri.getPath.stripSuffix("/")
    val fileUri = file.toUri.getPath
    val rel =
      if (fileUri != rootUri && fileUri.startsWith(rootUri + "/"))
        fileUri.drop(rootUri.length + 1)
      else file.getName
    rel.stripSuffix(".wsp").replace('/', '.')
  }
}

final class WspTable(roots: Seq[String]) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"wsp:${roots.mkString(",")}"
  override def schema(): StructType = WspTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    // ACCEPT_ANY_SCHEMA: write frames resolve by NAME in the builder —
    // the full read schema round-trips, but the lean 4-column contract
    // (metric, archive, ts_s|bucket_ts, value) writes too, and writers
    // aren't forced through the read schema's non-null flags
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WspWriteBuilder(roots, info)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WspScanBuilder(roots, options.getBoolean("listingCache", false),
      Option(options.get("metricRoot")),
      options.getInt("readRetries", 0),
      Option(options.get("metricGlob")),
      options.getBoolean("manifest", false))
}

final class WspScanBuilder(
    roots: Seq[String],
    listingCache: Boolean = false,
    metricRoot: Option[String] = None,
    // transient-absence retries per file open — 0 for batch scans (a
    // missing file in a static tree should fail fast with the real
    // error, not cost every task a ~1 s stall first); the streaming
    // path overrides to a bounded retry (its documented contract
    // absorbs the publish fallback's no-file window). The `readRetries`
    // read option opts a batch scan of a LIVE tree into the same.
    readRetries: Int = 0,
    // `metricGlob` read option: a graphite glob ([[graft.ops.Fetch
    // .globToRegex]] semantics — `*`/`?` dot-bounded, braces alternate)
    // applied as FILE pruning during the tree walk, exactly where the
    // reference's finder globs the filesystem: `servers.*.cpu` over a
    // million-file tree opens only the matching files. A read OPTION
    // (not a pushed filter) because DSv2's Filter vocabulary has no
    // regex/LIKE member to push an `rlike` through.
    metricGlob: Option[String] = None,
    // `manifest` read option: plan from the tree's `_wsp_manifest`
    // parquet table ([[WspManifest]]) instead of walking the
    // filesystem — the ≥1M-file path. Opt-in; fails loudly when the
    // manifest is absent (never a silent fallback to the walk).
    manifest: Boolean = false)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = WspTable.Schema

  // metric ∈ metrics (None = unconstrained) — applied as FILE pruning
  private var metrics: Option[Set[String]] = None
  // ts_s ∈ [lo, hi] — applied inside the slot decoder
  private var tsLo: Long = Long.MinValue
  private var tsHi: Long = Long.MaxValue

  private def intersect(vs: Set[String]): Unit =
    metrics = Some(metrics.fold(vs)(_ intersect vs))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case EqualTo("metric", _: String) | In("metric", _) => true
      case EqualTo("ts_s", _: Long) => true
      case GreaterThan("ts_s", _: Long) | GreaterThanOrEqual("ts_s", _: Long) => true
      case LessThan("ts_s", _: Long) | LessThanOrEqual("ts_s", _: Long) => true
      case _ => false
    }
    supported.foreach {
      case EqualTo("metric", v: String) => intersect(Set(v))
      case In("metric", vs) => intersect(vs.collect { case s: String => s }.toSet)
      case EqualTo("ts_s", v: Long) =>
        tsLo = math.max(tsLo, v); tsHi = math.min(tsHi, v)
      // strict bounds at the Long extremes: v±1 would wrap and silently
      // turn a provably-empty predicate into an unbounded scan (these
      // filters are absorbed, nothing above re-checks them)
      case GreaterThan("ts_s", v: Long) =>
        if (v == Long.MaxValue) { tsLo = 1; tsHi = 0 } // empty range
        else tsLo = math.max(tsLo, v + 1)
      case GreaterThanOrEqual("ts_s", v: Long) => tsLo = math.max(tsLo, v)
      case LessThan("ts_s", v: Long) =>
        if (v == Long.MinValue) { tsLo = 1; tsHi = 0 } // empty range
        else tsHi = math.min(tsHi, v - 1)
      case LessThanOrEqual("ts_s", v: Long) => tsHi = math.min(tsHi, v)
      case _ => ()
    }
    pushed = supported
    residual // absorbed exactly: supported filters are not re-evaluated
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val spark = SparkSession.active
    new WspScan(roots, metrics, tsLo, tsHi, required,
      new SerializableConfiguration(spark.sessionState.newHadoopConf()),
      spark.sessionState.conf.filesMaxPartitionBytes, listingCache,
      metricRoot, readRetries, metricGlob, manifest)
  }
}

/** One planned slice of files (path, length, metric). */
final case class WspInputPartition(files: Seq[(String, Long, String)]) extends InputPartition

final class WspScan(
    roots: Seq[String],
    metrics: Option[Set[String]],
    tsLo: Long,
    tsHi: Long,
    required: StructType,
    conf: SerializableConfiguration,
    maxPartitionBytes: Long,
    listingCache: Boolean = false,
    // metric names are derived relative to this dir instead of each root
    // — lets a caller pass FILES as roots (a schema-grouped subset of a
    // tree) and still get the tree's dotted metric names
    metricRoot: Option[String] = None,
    readRetries: Int = 0,
    metricGlob: Option[String] = None,
    manifest: Boolean = false) extends Scan with Batch {

  // compiled once, applied driver-side during the listing walk
  private lazy val globRx: Option[java.util.regex.Pattern] =
    metricGlob.map(g => java.util.regex.Pattern.compile(graft.ops.Fetch.globToRegex(g)))

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val m = metrics.fold("*")(_.mkString(","))
    val g = metricGlob.fold("")(g => s" glob=$g")
    s"wsp ${roots.mkString(",")} metric=$m$g ts_s=[$tsLo,$tsHi]"
  }

  /** Every selected `.wsp` file with its size, derived metric name, and
    * modification time — metric pruning happens HERE, before any byte is
    * read (shared by the batch and streaming planners).
    *
    * Cost bound, stated plainly: this is a DRIVER-side walk of the whole
    * tree — O(files) per batch plan, and the streaming `latestOffset`
    * re-walks it every micro-batch. That is the classic file-source
    * driver bottleneck; at millions of files the mitigation is the
    * `listingCache` read option: each directory's child listing is
    * cached keyed on the DIRECTORY's mtime, so an unchanged directory
    * costs one stat instead of one full listing per walk (changed
    * directories, and directories modified within the last
    * [[WspScan.QuiescenceMs]] — inside the filesystem's mtime quantum,
    * where "unchanged mtime" proves nothing — are re-listed).
    *
    * The cache is OPT-IN because it is only sound for rename-publish
    * writers ([[WspWrite]]'s discipline — every replace updates the
    * parent directory's mtime): a writer that updates file contents IN
    * PLACE (a stock carbon daemon does) changes the file's mtime but not
    * the directory's, and a cached listing would serve the stale file
    * mtime and suppress change capture. Leave it off when tailing trees
    * you don't write.
    */
  private[sources] def listFilesWithMtime(): Seq[((String, Long, String), Long)] =
    if (manifest) manifestListing()
    else {
    // touched accumulates ACROSS roots and the eviction sweep runs ONCE
    // after every root is walked: a per-root sweep evicted every OTHER
    // root's entries on each walk (r15 review — a multi-root stream
    // re-listed all trees in full every micro-batch, zero cache hits,
    // and a file-root walk that touches no directory wiped the cache)
    val touched = scala.collection.mutable.Set.empty[String]
    val result = roots.flatMap { r =>
      treeWalks += 1
      val root = new org.apache.hadoop.fs.Path(r)
      val fs = root.getFileSystem(conf.value)
      val qualified = fs.makeQualified(root)
      val nameRoot = metricRoot.fold(qualified)(m =>
        fs.makeQualified(new org.apache.hadoop.fs.Path(m)))
      val out = Seq.newBuilder[((String, Long, String), Long)]
      def emit(path: org.apache.hadoop.fs.Path, len: Long, mtime: Long): Unit =
        if (path.getName.endsWith(".wsp")) {
          val metric = WspTable.metricFor(nameRoot, path)
          if (metrics.forall(_.contains(metric)) &&
              globRx.forall(_.matcher(metric).matches))
            out += (((path.toString, len, metric), mtime))
        }
      // ONE per-directory walk shape, parameterized by how a dir's
      // children are listed — the cached and plain variants must stay
      // in lockstep (same root-is-file handling, same emit contract)
      def walkFrom(children: org.apache.hadoop.fs.Path =>
          Array[org.apache.hadoop.fs.FileStatus]): Unit = {
        def walk(dir: org.apache.hadoop.fs.Path): Unit =
          children(dir).foreach { st =>
            if (st.isDirectory) walk(st.getPath)
            else emit(st.getPath, st.getLen, st.getModificationTime)
          }
        val rootSt = fs.getFileStatus(qualified)
        if (rootSt.isFile)
          emit(rootSt.getPath, rootSt.getLen, rootSt.getModificationTime)
        else walk(qualified)
      }
      if (listingCache) {
        // per-directory walk so unchanged dirs can serve from cache
        walkFrom { dir => touched += dir.toString; childrenOf(fs, dir) }
      } else if (Option(qualified.toUri.getScheme).forall(_ == "file")) {
        // LOCAL filesystem: `listFiles(recursive)` materializes
        // LocatedFileStatus, whose permission field forks `ls -ld` PER
        // FILE on RawLocalFileSystem — measured ~14 ms/file, 70 s to
        // plan a 5,000-file tree (WspScaleSpec caught it). A plain
        // listStatus walk keeps the status lazy; this planner touches
        // only path/len/mtime, so the walk is pure stat traffic.
        walkFrom(fs.listStatus)
      } else {
        // remote stores: ONE flat recursive listing — on object stores
        // a paged prefix LIST and on HDFS a streamed recursive
        // getListing, both far cheaper than a per-directory RPC walk
        val it = fs.listFiles(qualified, true)
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile)
            emit(st.getPath, st.getLen, st.getModificationTime)
        }
      }
      out.result()
    }
    // evict entries no walk touched (deleted subtrees must not pin
    // FileStatus arrays for the stream's life)
    if (listingCache)
      dirCache.keysIterator.filterNot(touched).toSeq
        .foreach(dirCache.remove)
    result
  }

  /** Listing cache (see [[listFilesWithMtime]]): dir path → (dir mtime,
    * listing wall-clock ms, children). Driver-side state scoped to this
    * scan — exactly the lifetime of a streaming query, whose
    * per-micro-batch re-walk is the cost this pays down.
    */
  private val dirCache = scala.collection.concurrent.TrieMap
    .empty[String, (Long, Long, Array[org.apache.hadoop.fs.FileStatus])]
  /** Observability for tests: number of real child listings performed. */
  private[sources] var listStatusCalls: Long = 0L
  /** Observability for tests: number of filesystem TREE walks started —
    * stays zero under the `manifest` option (the planning contract the
    * option exists to provide). */
  private[sources] var treeWalks: Long = 0L

  /** Manifest-backed planning (`manifest` read option, [[WspManifest]]):
    * one pruned columnar scan per root instead of a filesystem walk.
    * Metric equality/`In` and the glob filter the RAW manifest rows —
    * BELOW the per-path supersede-dedup, where the equality predicates
    * reach the parquet reader (a filter above that aggregate cannot
    * push; metric is a pure function of path, so pre-filtering
    * commutes) — and only the matching live rows are collected. Runs on
    * the driver (planning), like every DSv2 planner; the streaming
    * offset path never comes here at all ([[maxMtime]]).
    *
    * `metricRoot` is a WALK concept (re-rooting names when ROOTS are a
    * file subset of a tree) and is rejected here — manifest rows carry
    * their tree-relative metric names already.
    */
  /** The metric/glob-pruned RAW manifest frame for one root — the ONE
    * statement of the pruning contract (equality/`In` and the glob
    * filter BELOW the supersede-dedup, where they reach the parquet
    * reader; sound because metric is a pure function of path). Shared
    * by [[manifestListing]] and [[maxMtime]] so the streaming offset
    * and the batch plan can never diverge in which files they consider.
    */
  private def prunedRaw(spark: SparkSession, root: String)
      : org.apache.spark.sql.DataFrame = {
    var df = WspManifest.raw(spark, root)
    metrics.foreach(ms =>
      df = df.filter(org.apache.spark.sql.functions.col("metric")
        .isin(ms.toSeq: _*)))
    metricGlob.foreach(g =>
      df = df.filter(org.apache.spark.sql.functions.col("metric")
        .rlike(graft.ops.Fetch.globToRegex(g))))
    df
  }

  private def manifestListing(): Seq[((String, Long, String), Long)] = {
    require(metricRoot.isEmpty,
      "wsp: the manifest option plans whole trees; metricRoot does not apply")
    val spark = SparkSession.active
    roots.flatMap { r =>
      WspManifest.live(prunedRaw(spark, r))
        .select("path", "len", "metric", "mtime").collect().map { row =>
          ((row.getString(0), row.getLong(1), row.getString(2)), row.getLong(3))
        }
    }
  }

  /** Max file mtime over the selected tree — the streaming offset.
    * Manifest mode answers with ONE distributed `max(mtime)` aggregate
    * (nothing but the scalar reaches the driver — the whole point of
    * the manifest at 1M files, where the listing-based form would haul
    * every row back per micro-batch poll); walk mode keeps the listing
    * (the walk is the cost either way, and metric pruning applies).
    */
  private[sources] def maxMtime(): Long =
    if (manifest) {
      // metric/glob pruning applies to the RAW rows before the max —
      // superseded rows of a matching path still match (metric is a
      // function of path), so max(filtered raw) == max(filtered live)
      val spark = SparkSession.active
      roots.map { r =>
        val row = prunedRaw(spark, r)
          .agg(org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.col("mtime"))).head()
        if (row.isNullAt(0)) Long.MinValue else row.getLong(0)
      }.foldLeft(Long.MinValue)(math.max)
    } else {
      val ms = listFilesWithMtime().map(_._2)
      if (ms.isEmpty) Long.MinValue else ms.max
    }

  private def childrenOf(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Array[org.apache.hadoop.fs.FileStatus] = {
    val mtime = fs.getFileStatus(dir).getModificationTime
    val key = dir.toString
    dirCache.get(key) match {
      // trust requires an unchanged mtime AND that the cached listing
      // was TAKEN after the dir's mtime quantum closed — a listing taken
      // inside the quantum may predate a same-quantum change that never
      // moves the mtime (the WspOffset blind spot), and merely aging
      // does not make it complete. Quiescence compares the driver clock
      // to the filesystem's mtime: the cache assumes they agree within
      // [[WspScan.QuiescenceMs]] (skew re-opens the blind spot — another
      // reason this stays opt-in).
      case Some((m, listedAt, kids))
          if m == mtime && listedAt - mtime > WspScan.QuiescenceMs =>
        kids
      case _ =>
        listStatusCalls += 1
        // clock taken BEFORE the listing: the quiescence guard must
        // bound when the listing BEGAN — a slow listStatus that starts
        // inside the dir's mtime quantum can miss a same-quantum
        // rewrite, and stamping its END time would let the guard trust
        // exactly that incomplete listing forever (r15 review)
        val startedAt = System.currentTimeMillis()
        val kids = fs.listStatus(dir)
        dirCache.put(key, (mtime, startedAt, kids))
        kids
    }
  }

  private[sources] def listFiles(): Seq[(String, Long, String)] =
    listFilesWithMtime().map(_._1)

  /** Next-fit-decreasing bin-pack into ≤ maxPartitionBytes bins — O(n)
    * after the sort, so planning stays linear at the millions-of-files
    * scale this source targets (first-fit's per-file scan over all open
    * bins is O(files × bins) of single-threaded driver time). With the
    * near-uniform file sizes a whisper tree has (size is a function of
    * the retention config), next-fit packs essentially as tightly;
    * task count tracks bytes, not file count, and one giant file still
    * gets its own task.
    */
  override def planInputPartitions(): Array[InputPartition] =
    packFiles(listFiles())

  private[sources] def packFiles(selected: Seq[(String, Long, String)]): Array[InputPartition] = {
    val files = selected.sortBy(-_._2)
    val bins = scala.collection.mutable.ArrayBuffer.empty[
      scala.collection.mutable.ArrayBuffer[(String, Long, String)]]
    var openSize = 0L
    files.foreach { f =>
      if (bins.nonEmpty && openSize + f._2 <= maxPartitionBytes) {
        bins.last += f; openSize += f._2
      } else {
        bins += scala.collection.mutable.ArrayBuffer(f); openSize = f._2
      }
    }
    bins.map(b => WspInputPartition(b.toSeq): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WspReaderFactory(required, tsLo, tsHi, conf, readRetries)

  /** Reader factory for the STREAMING path: a live tree's publish
    * fallback (delete+rename schemes) can leave a planned file briefly
    * absent, so streaming reads always retry transient absence at least
    * [[WspRead.StreamRetries]] times before surfacing the error.
    */
  private[sources] def streamingReaderFactory(): PartitionReaderFactory =
    new WspReaderFactory(required, tsLo, tsHi, conf,
      math.max(readRetries, WspRead.StreamRetries))

  /** Streaming read: tail a LIVE whisper tree — the reverse direction of
    * [[graft.streaming.StreamIngest.wspWriter]] (a carbon daemon keeps
    * writing; Spark keeps reading). Change capture is FILE-granular:
    * the offset is the tree's max modification time, and each
    * micro-batch re-emits every point of the files whose mtime reached
    * the previous offset or moved past it (`mtime >= start` — see
    * [[WspOffset]] for why the boundary is INCLUSIVE). Whisper has no
    * per-slot changelog — the file IS the state — so re-emission is the
    * honest contract; compose with an LWW/idempotent sink
    * ([[graft.streaming.StreamIngest]] paths) exactly as whisper replays
    * are absorbed anywhere else. Metric/ts pushdown and column pruning
    * apply per micro-batch unchanged.
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WspMicroBatchStream(this)
}

/** Offset = the max of every visible file's (modification time in ms)
  * at planning. Monotone under the append-only/merge-write discipline
  * of a live tree; a batch covers files with `start <= mtime <= end`.
  *
  * The start boundary is INCLUSIVE by design: filesystems report mtime
  * at coarse quanta (often whole seconds), and a `.wsp` file is
  * fixed-size (the ring is pre-allocated), so a file rewritten within
  * the same quantum as an already-planned batch is METADATA-IDENTICAL
  * to its planned state — no (mtime, length) fingerprint can tell them
  * apart. Re-planning the boundary files in the next batch closes that
  * window: under sustained write load every same-quantum rewrite is
  * re-read as soon as any later change fires a batch. The cost is one
  * duplicate emission of the boundary files per offset advance,
  * absorbed by the LWW/idempotent sinks this source documents as its
  * composition contract. Detection limit, stated honestly: a rewrite in
  * the final quantum of a tree that then goes permanently quiet leaves
  * no metadata signal at all and is not re-read (no batch fires —
  * Spark only plans when the offset advances).
  */
final case class WspOffset(maxMtime: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"maxMtime":$maxMtime}"""
}

final class WspMicroBatchStream(scan: WspScan)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  override def initialOffset(): Offset = WspOffset(Long.MinValue)

  override def latestOffset(): Offset = WspOffset(scan.maxMtime())

  // Trigger.AvailableNow: pin the end offset ONCE at query start, then
  // serve it until the runner catches up — without this Spark falls back
  // to single-batch execution and warns it may miss data behind an
  // uncommitted batch after a restart
  private var availableNowEnd: Option[Offset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(latestOffset())
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    availableNowEnd.getOrElse(latestOffset())
  override def reportLatestOffset(): Offset = latestOffset()

  override def deserializeOffset(json: String): Offset = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val formats: Formats = DefaultFormats
    WspOffset((JsonMethods.parse(json) \ "maxMtime").extract[Long])
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[WspOffset].maxMtime
    val hi = end.asInstanceOf[WspOffset].maxMtime
    val changed = scan.listFilesWithMtime()
      .collect { case (f, m) if m >= lo && m <= hi => f }
    scan.packFiles(changed)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    scan.streamingReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final class WspReaderFactory(
    required: StructType,
    tsLo: Long,
    tsHi: Long,
    conf: SerializableConfiguration,
    private[sources] val retries: Int = 0) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WspPartitionReader(
      partition.asInstanceOf[WspInputPartition], required, tsLo, tsHi, conf, retries)

  // the scan is COLUMNAR: ring slots decode straight into column
  // vectors, so downstream whole-stage codegen consumes vectorized
  // batches instead of a row iterator — at a 100 TB scan this removes
  // the per-point virtual-call row path entirely. The row reader above
  // remains the contract fallback.
  override def supportColumnarReads(partition: InputPartition): Boolean = true
  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new WspColumnarReader(
      partition.asInstanceOf[WspInputPartition], required, tsLo, tsHi, conf, retries)
}

private[sources] object WspRead {
  /** Streaming-path default for transient-absence retries (~1 s of
    * 100 ms sleeps). */
  val StreamRetries = 10

  /** Read the full file image. With `retries > 0`, absorb the transient
    * windows a LIVE tree can expose between planning and read: on
    * schemes without an atomic replace ([[WspWrite]]'s delete+rename
    * fallback) a planned file can be momentarily absent, and a
    * checksummed read can race a sidecar swap — bounded retries, then
    * the real error (a file still missing after a second is genuinely
    * gone, and silently skipping it would be data loss). With
    * `retries == 0` — the batch-scan default — a missing file surfaces
    * immediately: a static tree has no transient window to absorb, and
    * a stall-then-fail would just tax every task of a failing scan.
    */
  def readWithRetry(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path,
      len: Int,
      path: String,
      retries: Int): Array[Byte] = {
    var attempt = 0
    while (true) {
      try {
        val bytes = new Array[Byte](len)
        val in = fs.open(p)
        try in.readFully(0, bytes) finally in.close()
        return bytes
      } catch {
        case e @ (_: java.io.FileNotFoundException |
                  _: org.apache.hadoop.fs.ChecksumException) =>
          attempt += 1
          if (attempt > retries) throw e
          Thread.sleep(100)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Per-file image read + slot decode + pushed ts filter — the shared
    * front half of both the row and columnar readers. Returns the
    * file's metric name and its filtered point iterator.
    */
  def openFile(
      file: (String, Long, String),
      tsLo: Long,
      tsHi: Long,
      conf: SerializableConfiguration,
      retries: Int): (String, Iterator[WspPoint]) = {
    val (path, len, metric) = file
    // the format's u32 offsets bound a .wsp at 4 GB; a JVM byte array at
    // 2 GB — fail with the real reason rather than a negative-size error
    // (a >2 GB whisper file implies a >50-year 1s retention; unseen in
    // practice, but the failure mode should name itself)
    require(len <= Int.MaxValue, s"$path: $len bytes exceeds the 2 GB single-file limit")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf.value)
    val bytes = readWithRetry(fs, p, len.toInt, path, retries)
    (metric, WspCodec.decodePoints(bytes, path)
      .filter(pt => pt.tsS >= tsLo && pt.tsS <= tsHi))
  }
}

/** Columnar twin of [[WspPartitionReader]]: fills `OnHeapColumnVector`
  * batches of up to [[WspColumnarReader.BatchRows]] rows. Batches may
  * span files (the metric bytes are cached per file and written per
  * row); every column is non-null by the format's construction.
  */
final class WspColumnarReader(
    partition: WspInputPartition,
    required: StructType,
    tsLo: Long,
    tsHi: Long,
    conf: SerializableConfiguration,
    retries: Int = 0)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector

  private val files = partition.files.iterator
  private var points: Iterator[WspPoint] = Iterator.empty
  private var metricBytes: Array[Byte] = _

  private val vectors =
    OnHeapColumnVector.allocateColumns(WspColumnarReader.BatchRows, required)
  private val batch = new org.apache.spark.sql.vectorized.ColumnarBatch(
    vectors.asInstanceOf[Array[org.apache.spark.sql.vectorized.ColumnVector]])

  private val fillers: Array[(Int, WspPoint) => Unit] =
    required.fields.zipWithIndex.map { case (f, i) =>
      f.name match {
        case "metric" => (row: Int, _: WspPoint) =>
          { vectors(i).putByteArray(row, metricBytes, 0, metricBytes.length); () }
        case "archive" => (row: Int, pt: WspPoint) => vectors(i).putInt(row, pt.archive)
        case "spp" => (row: Int, pt: WspPoint) => vectors(i).putInt(row, pt.spp)
        case "points" => (row: Int, pt: WspPoint) => vectors(i).putInt(row, pt.points)
        case "ts_s" => (row: Int, pt: WspPoint) => vectors(i).putLong(row, pt.tsS)
        case "value" => (row: Int, pt: WspPoint) => vectors(i).putDouble(row, pt.value)
        case other => throw new IllegalArgumentException(s"unknown wsp column $other")
      }
    }

  private def nextFile(): Boolean = {
    if (!files.hasNext) return false
    val (metric, pts) = WspRead.openFile(files.next(), tsLo, tsHi, conf, retries)
    metricBytes = metric.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    points = pts
    true
  }

  override def next(): Boolean = {
    while (!points.hasNext) if (!nextFile()) return false
    var i = 0
    while (i < vectors.length) { vectors(i).reset(); i += 1 }
    var n = 0
    // drain across file boundaries until the batch is full
    while (n < WspColumnarReader.BatchRows &&
        (points.hasNext || nextFile())) {
      if (points.hasNext) {
        val pt = points.next()
        var c = 0
        while (c < fillers.length) { fillers(c)(n, pt); c += 1 }
        n += 1
      }
    }
    batch.setNumRows(n)
    n > 0
  }

  override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = batch

  override def close(): Unit = batch.close()
}

object WspColumnarReader {
  /** Rows per ColumnarBatch — the standard vectorized-reader batch size
    * (matches the parquet reader default). */
  val BatchRows = 4096
}

/** Decodes each file of the partition in turn. One file image is held at
  * a time — bounded by the file's retention config (whisper pre-allocates
  * the full ring; the format has no streaming-unfriendly surprises, the
  * image IS the ring).
  */
final class WspPartitionReader(
    partition: WspInputPartition,
    required: StructType,
    tsLo: Long,
    tsHi: Long,
    conf: SerializableConfiguration,
    retries: Int = 0) extends PartitionReader[InternalRow] {

  private val files = partition.files.iterator
  private var points: Iterator[WspPoint] = Iterator.empty
  private var metricU8: UTF8String = _
  private var current: WspPoint = _

  // column extractors resolved once against the pruned schema; the hot
  // loop fills one reusable row (the DSv2 contract allows reuse — the
  // consumer copies when it retains), no per-row boxing of the getters
  private val getters: Array[WspPoint => Any] = required.fields.map { f =>
    f.name match {
      case "metric" => (_: WspPoint) => metricU8
      case "archive" => (p: WspPoint) => p.archive
      case "spp" => (p: WspPoint) => p.spp
      case "points" => (p: WspPoint) => p.points
      case "ts_s" => (p: WspPoint) => p.tsS
      case "value" => (p: WspPoint) => p.value
      case other => throw new IllegalArgumentException(s"unknown wsp column $other")
    }
  }
  private val row =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(getters.length)

  private def nextFile(): Boolean = {
    if (!files.hasNext) return false
    val (metric, pts) = WspRead.openFile(files.next(), tsLo, tsHi, conf, retries)
    metricU8 = UTF8String.fromString(metric)
    points = pts
    true
  }

  override def next(): Boolean = {
    while (!points.hasNext) if (!nextFile()) return false
    current = points.next()
    true
  }

  override def get(): InternalRow = {
    var i = 0
    while (i < getters.length) { row.update(i, getters(i)(current)); i += 1 }
    row
  }

  override def close(): Unit = ()
}
