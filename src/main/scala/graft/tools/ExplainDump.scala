package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Regenerate EXPLAIN.md: formatted physical plans of the headline
  * queries with a note on the property each plan is expected to show
  * (the same properties PlanSpec asserts). Run:
  * `sbt "runMain graft.tools.ExplainDump"` from /root/repo.
  */
object ExplainDump {

  private val Keys: Seq[(String, String)] = Seq(
    "fetch_dense_series" ->
      ("Time bounds reach the parquet scan as `PushedFilters` on the RAW " +
        "ts column (row-group pruning); the dense spine joins the " +
        "aggregate via `BroadcastHashJoin` — no sort-merge shuffle for a " +
        "bounded range."),
    "upsert_batch_lww" ->
      ("LWW dedup is an aggregation, not a window: `partial_max_by` " +
        "(map-side combine) bounds shuffle volume by distinct buckets, " +
        "not input rows."),
    "agg_avg_xff" ->
      ("The xFF gate is a post-aggregation filter on already-reduced " +
        "rows; the aggregate itself keeps the partial/final split."),
    "agg_avg_zero" ->
      ("graphite's avg_zero (method id 6): sum over the FULL window " +
        "slot count — the divisor is a literal folded at plan time, so " +
        "the plan is the same partial/final hash aggregate as agg_sum " +
        "plus one codegen'd division; absent-slot zeros never " +
        "materialize as rows."),
    "agg_absmax" ->
      ("graphite's absmax (id 7): ONE max_by over the " +
        "(abs, -ts, -value) ordering struct — partial/final " +
        "SortAggregate (struct-ordered max_by is not hash-aggregable) " +
        "with map-side combine before the one exchange, no window, no " +
        "self-join; whisper's earliest-first magnitude tiebreak is " +
        "encoded in the struct order, not a second pass."),
    "dedup_minhash" ->
      ("The LSH path: shingle set materialized once (checkpoint scan), " +
        "16 seed-hashes projected in one codegen stage, band buckets " +
        "grouped — NO CartesianProduct anywhere; exact verification " +
        "joins only candidate docs (broadcast semi-join)."),
    "similarity_topk" ->
      ("The 10-query side broadcasts; the candidate scan is one " +
        "embarrassingly parallel pass with a single codegen'd dot " +
        "product (`dot_f`) per pair."),
    "similarity_topk_agg" ->
      ("Same result as similarity_topk through a typed Aggregator: " +
        "`partial_topkagg` map-side buffers replace the per-group sort — " +
        "shuffle is k rows per query, no Window operator."),
    "similarity_ann_ivf" ->
      ("IVF serving over the PERSISTED index (codebook + inverted " +
        "assignment built once per dataset generation into the shared " +
        "tmp root): the plan reads two parquet scans, probes nprobe=4 " +
        "clusters per query — broadcast joins everywhere, no all-pairs " +
        "shuffle and no rebuild inside the query."),
    "rollup_serve_1h" ->
      ("The RollupRewrite optimizer rule fired: NO aggregate or exchange " +
        "remains — the plan is a bare scan of the pre-materialized " +
        "points_3600s level (the 1h table IS this aggregation of the 5m " +
        "level)."),
    "sessionize" ->
      ("Canonical sessionization: one shuffle keyed by metric, " +
        "in-partition sort, gap flag via lag, running-sum session ids, " +
        "then a hash aggregate."),
    "sample_stratified" ->
      ("Deterministic sampling is a pure map-side filter: scan → filter " +
        "→ (output sort only). No join, no aggregate, no extra " +
        "exchange beyond the final ORDER BY."),
    "source_cap" ->
      ("Per-domain capping: ONE window partitioned BY SOURCE (per-source " +
        "sorts, never global), no join, no aggregate — the salted-hash " +
        "rank is a uniform reproducible sample of each source."),
    "split_assign_safe" ->
      ("Leakage-safe split: the doc frame left-joins the near-dup " +
        "cluster map (bounded by docs-in-pairs) keyed on doc_id, then " +
        "the split hash is map-side over the coalesced group id — " +
        "uncluttered docs keep split_assign's identical assignment."),
    "similarity_ann_kmeans" ->
      ("Trained IVF, same persisted-index serving plan as " +
        "similarity_ann_ivf — the Lloyd training (broadcast-join " +
        "assignment + map-side partial per-dimension means) runs ONCE " +
        "at index-build time and is absent from the serving plan."),
    "multimodal_join_bucketed" ->
      ("The shuffle-free co-located join: both scans carry the bucket " +
        "spec (SelectedBucketsCount in the scan nodes), the sort-merge " +
        "join's distribution requirement is satisfied by the layout, " +
        "and the ONLY exchange in the plan is the final orderBy's " +
        "rangepartitioning — neither join side re-hashes."),
    "dedup_substring_salted" ->
      ("The explicit skew-salt: the docfreq join keys on (sk, salt) " +
        "with the per-key side exploded across 16 salts, so one " +
        "Zipf-head span key spreads over 16 reducers. Output pinned " +
        "row-identical to dedup_substring_capped."),
    "similarity_ann_srp_probe" ->
      ("Multi-probe SRP serving: same signature-index scan, but the " +
        "broadcast probe table carries each query band key XOR its 4 " +
        "Hamming-1 flips (200 rows) — recall 0.46 → 0.98 with zero " +
        "plan-shape change vs the exact-band key."),
    "similarity_ann_srp" ->
      ("SRP-LSH serving: the persisted signature parquet (vec, norm, 4 " +
        "band keys) is the only corpus-sized input — candidates come " +
        "from a band-equality hash join against the broadcast 40-row " +
        "query-band table, then the exact re-rank joins real vectors " +
        "for the deduped pair set only. The 16 literal-plane dot " +
        "products live in the one-time index build; no dotproductf " +
        "over raw embeddings appears before the re-rank."),
    "dedup_containment" ->
      ("Asymmetric containment pairs served from the materialized pair " +
        "index (one scan + sort); the build behind it is rare-shingle " +
        "blocking — docfreq-capped keys bound the bucket pair blowup — " +
        "with exact intersection only over candidate docs (broadcast " +
        "semi-join), never all-pairs."),
    "similarity_ann_pq" ->
      ("Product-quantization serving: the candidate pass scans the " +
        "persisted CODES parquet (~12 B/vector — 4 one-byte codes + a " +
        "stored norm; the raw vectors never stream), joins the " +
        "broadcast 640-row per-query lookup table, and hash-aggregates " +
        "the four subspace contributions in fixed order. Only the " +
        "shortlist (50 ids/query) fetches real vectors for the exact " +
        "re-rank. Training lives in the one-time index build."),
    "embed_quantize" ->
      ("Symmetric int8 quantization audit: one posexplode, two " +
        "vec-keyed hash aggregations with map-side combine (scale, " +
        "then reconstruction stats) — no per-element lambda HOFs, no " +
        "window, no join beyond the scale broadcast."),
    "decontaminate_frac" ->
      ("Benchmark-centric coverage fractions: same broadcast-benchmark " +
        "semi-join as decontaminate; the extra shuffles key on " +
        "(bench_id, doc_id) HIT pairs — bounded by actual overlap, " +
        "not corpus size — and the worst-contaminator argmax is a " +
        "50-group max_by."),
    "dedup_incremental" ->
      ("Incremental batch-vs-reference dedup: the `bloom_might_contain` " +
        "probe (native codegen expression over the reference's Bloom " +
        "sketch) sits in a map-side Filter — bloom-negative rows bypass " +
        "the join entirely via the union branch; only bloom hits reach " +
        "the exact-confirm `LeftAnti` on md5(text), so the shuffle is " +
        "bounded by hit volume, never batch size."),
    "text_boilerplate" ->
      ("Cross-doc boilerplate fraction: one shingle-keyed doc-frequency " +
        "aggregate (partial/final on 16 B keys) joined back to the " +
        "shared shingle index, then a doc_id-keyed conditional count — " +
        "no window, no second corpus scan (the index is the amortized " +
        "build every dedup-family consumer shares)."),
    "dsir_weight" ->
      ("DSIR importance weights: ONE token explode, reduced on the spot " +
        "to the compact (doc, source, bucket) count frame whose single " +
        "exchange both consumers share (ReusedExchange — the bucket " +
        "model does NOT re-scan the corpus), and the <=256-row " +
        "bucket->weight table returns via BroadcastHashJoin — real " +
        "volume is never shuffle-joined twice. Since r14 the output " +
        "edge is pure BIGINT arithmetic (half-up integer division) " +
        "plus ONE final CAST/1e6 — no engine-evaluated double ops."),
    "dsir_select" ->
      ("The DSIR resampling step: Gumbel noise (two portable-ln chains " +
        "over a doc-keyed md5 uniform) lands as codegen'd projections " +
        "over the serve fold — everything up to score_q is map-side; " +
        "the only additions past dsir_weight's plan are the global " +
        "row_number window (exact top-k; threshold-broadcast at scale) " +
        "and the keep projection."),
    "dsir_select_scalable" ->
      ("dsir_select's 100-TB form: the k-th boundary row comes from " +
        "TakeOrderedAndProject (per-partition top-k, one k-row merge — " +
        "no global sort, no single-partition window), returns via " +
        "BroadcastNestedLoopJoin as ONE row, and the keep flag is a " +
        "codegen'd at-or-better comparison. The scored frame is " +
        "eagerly checkpointed (it feeds both the boundary and the keep " +
        "pass), so the plan shows scans of the materialized scores. " +
        "Pinned row-identical to the window form."),
    "ann_nprobe_sweep" ->
      ("The IVF tuning curve: ONE scored (query, candidate) lattice — " +
        "lazily persisted (r18) because three subtrees consume it " +
        "(brute truth, arm hits, arm candidate counts); the one " +
        "materialization now runs inside the query's own action " +
        "instead of at construction — then per-arm windows over " +
        "prn<=np slices and two tiny aggregates. The expensive pass is " +
        "deliberate: this key IS the brute-force audit, run on a " +
        "sample at scale."),
    "ann_shortlist_sweep" ->
      ("The PQ re-rank budget curve: the shared ADC-ranked lattice " +
        "joined to real vectors for exact scores, lazily persisted " +
        "(three consumers; r18 — the eager construct-time checkpoint " +
        "moved into the action), then per-arm re-rank windows and two " +
        "tiny aggregates — the same audit shape as the nprobe sweep, " +
        "on the other knob."),
    "wsp_set_agg" ->
      ("whisper-set-aggregation-method end-to-end: the plan is the " +
        "standard 1m->5m consolidation (BatchScan wsp -> partial/final " +
        "hash aggregate with the xff gate) — the point is WHICH method " +
        "the aggregate applies: Max/0.25 adopted from the binary-" +
        "patched header, checked against a literal-Max oracle."),
    "doc_chunk" ->
      ("Overlapping token-window chunking (retrieval-corpus prep): " +
        "sequence/slice/concat_ws are codegen'd collection expressions " +
        "evaluated inside the scan stage — a pure map-side 1->N fan-out " +
        "with no exchange before the presentation sort."),
    "zorder_key" ->
      ("Z-order (Morton) layout key: the min-max bounds ride ONE " +
        "broadcast one-row agg (the range-sample pass); quantization + " +
        "staged bit-spread interleave are pure per-row codegen'd " +
        "arithmetic — no shuffle beyond the final presentation sort; " +
        "the clustered rewrite (zorderWrite) adds a single " +
        "repartitionByRange exchange."),
    "decontaminate" ->
      ("The benchmark shingle set is the BROADCAST side; the corpus " +
        "shingle index semi-joins it map-side and partially aggregates " +
        "per doc — the corpus never shuffles by content."),
    "dedup_collapse" ->
      ("The near-dup cluster assignment (bounded by docs-in-pairs) " +
        "joins the corpus manifest; the membership count aggregates the " +
        "small assignment frame, never the corpus text."),
    "text_repetition" ->
      ("Relational repetition features: explode → partial-aggregated " +
        "(doc, token) counts → per-doc max/sum — codegen throughout, no " +
        "interpreted per-row array lambdas."),
    "dedup_embedding" ->
      ("Exact pair scan as a tiled equi-join: the broadcast tile index " +
        "bounds each task to one (block_a, block_b) tile — no " +
        "CartesianProduct, no unbounded nested loop."),
    "curate" ->
      ("The end-to-end manifest: ONE exploded token-frequency pass " +
        "feeds both repetition and quality gates (one text scan where " +
        "the standalone ops take two), star-joined on doc_id with the " +
        "cluster assignment and contamination flags (each served from " +
        "the shared materialized shingle/pair indexes) and the " +
        "map-side split."),
    "sessionize_scalable" ->
      ("Two-pass skew-safe sessionization: the event-level window keys " +
        "by (metric, day) — the hot metric spreads across days — and " +
        "only the tiny local-session frame windows by metric alone."),
    "fetch_many" ->
      ("Batched multi-metric fetch: the (metrics × buckets) spine " +
        "broadcasts against one per-(metric, bucket) aggregate — one " +
        "scan serves every metric's dense series."),
    "fetch_summarize" ->
      ("Graphite summarize(10min, sum): the coarse re-aggregate runs on " +
        "the SPARSE per-minute aggregate (null-skipping sum makes the " +
        "dense 60 s spine unnecessary) — the second exchange's input is " +
        "already reduced to ≤ range/spp × metrics rows, and density is " +
        "restored once at interval granularity via the broadcast spine."),
    "fetch_maxdatapoints" ->
      ("Render consolidation under a point budget: same sparse-first " +
        "shape as fetch_summarize with origin-aligned (from + " +
        "floor((b-from)/step')·step') group arithmetic folded into the " +
        "aggregate key — no Window, no per-series collect; the output " +
        "spine (96 × metrics) broadcasts."),
    "fetch_per_second" ->
      ("Graphite perSecond(): the lag window partitions BY METRIC over " +
        "the request-bounded dense series — never a global " +
        "single-partition window — and the None-on-gap/reset CASE is " +
        "codegen'd over the windowed frame; the heavy reduction to " +
        "per-bucket averages happens before the window sees a row."),
    "render_target_fill" ->
      ("integral(keepLastValue(glob, 3)): the run-length bridge and the " +
        "running total stack three Window functions over ONE " +
        "metric-partitioned sort — a single exchange feeds all of them; " +
        "the pointwise tier never adds a shuffle."),
    "render_target_top" ->
      ("highestAverage(shard*.*, 3): the ranking side reduces to one " +
        "row per series, is sorted-and-limited (a 20-row global " +
        "TakeOrdered, not a data-volume sort), then rejoins as a " +
        "BroadcastHashJoin LeftSemi — the full frames never shuffle for " +
        "the selection."),
    "render_target" ->
      ("A COMPOSED render-API target string — summarize(perSecond(" +
        "glob), '10min', 'sum') — evaluated by RenderTarget: ONE " +
        "glob-pruned scan feeds dense-series build, rate window and " +
        "coarse re-aggregate in a single plan; each stage is the same " +
        "physical shape as its standalone fetch_* key, fused by " +
        "Catalyst with no intermediate materialization."),
    "render_target_consolidate" ->
      ("consolidateBy(xFilesFactor(glob, 0.3), 'max') under a " +
        "maxDataPoints cap: the render-frame consolidation is a pure " +
        "re-aggregation of the request-bounded dense frame — one extra " +
        "group-by above the leaf plan, no new scan; the xff gate is a " +
        "codegen'd CASE over the (known, total) counts."),
    "render_target_wavg" ->
      ("weightedAverage(shard glob, shard glob, 1): BOTH series lists " +
        "resolve to the same shared leaf aggregate (identical leaf " +
        "regexes — one scan + one shuffle, reused), the node-keyed " +
        "dedup reduces each side to one row per (key, bucket), and the " +
        "final Σv·w/Σw is a join of two request-bounded frames."),
    "render_target_holt_input" ->
      ("The Holt-Winters recurrence's INPUT frame as its own key: the " +
        "request window extended by the 6h bootstrap reaches the scan " +
        "as a pushed ts range, members consolidate per-minute with " +
        "map-side partials, and the combine is one hash aggregate over " +
        "the dense spine. Everything relational about the holt key, " +
        "oracle-checked; only the per-series recurrence stays typed."),
    "render_target_holt_bands" ->
      ("The band/aberration algebra over a 48-row synthetic forecast " +
        "frame both engines generate from one integer formula — a " +
        "spec key, deliberately tiny: it pins the deployed hwUpper/" +
        "hwLower/hwAberr functions (shared with the recurrence arms) " +
        "against SQL, not a data-volume plan."),
    "render_target_apply" ->
      ("applyByNode(shard*.click, 0, 'asPercent(%.click, sumSeries(" +
        "%.*))'): the template evaluates once per node-prefix, but " +
        "every prefix subtree re-filters the SAME shared (metric, " +
        "bucket) aggregate — exchange reuse executes the scan + partial " +
        "aggregate once, and the per-prefix work above it is bounded by " +
        "series × buckets; the prefix list itself is the one bounded " +
        "driver collect."),
    "render_target_lists" ->
      ("divideSeriesLists(shard0.*, shard1.*): both lists resolve off " +
        "the shared leaf aggregate; each side's name-rank is a " +
        "row_number over its request-bounded DISTINCT-name frame (a " +
        "20-row sort, not a data sort), broadcast back, and the " +
        "pairwise divide is an equi-join on (rank, bucket) — no " +
        "cartesian pairing."),
    "render_target_useabove" ->
      ("useSeriesAbove(shard*.click, 90, 'click', 'view'): the " +
        "qualifying-series max reduces to one row per series, the " +
        "search→replace rewrite is a codegen'd regexp_replace on that " +
        "tiny frame, and the rewritten names semi-join back into the " +
        "shared aggregate as a BroadcastHashJoin — the second 'fetch' " +
        "never rescans, and no name list touches the driver."),
    "fetch_check_empty" ->
      ("go-whisper's CheckEmpty range probe: each window is an " +
        "EXISTENCE check — CollectLimit(1) directly above the pushed " +
        "time/metric parquet filter, so the scan stops at the first " +
        "hit (or reads nothing when row-group pruning proves the " +
        "window empty). Never a dense fetch."),
    "fetch_relative_tz" ->
      ("The tz-aware request layer (from=midnight&tz=US/Eastern): the " +
        "timezone math happens at PARSE time on the driver — the plan " +
        "is byte-identical to the UTC fetch (pushed ts bounds on the " +
        "raw column, broadcast spine join), just with the caller-zone " +
        "window constants. tz support costs the cluster nothing."),
    "render_target_gen" ->
      ("The seeded random-walk generator: a pure range() grid, a " +
        "codegen'd integer-hash projection, and ONE metric-keyed " +
        "running-sum window — no table scan at all. The window is " +
        "per-series (single generator series), bounded by the request " +
        "grid, never a data-volume operator."),
    "render_target_events" ->
      ("events(*tags): a per-bucket COUNT from the raw point stream — " +
        "the one render function that cannot reuse the shared AVG " +
        "aggregate. Its own scan pushes the ts range and the " +
        "event-type IN-list to parquet, aggregates map-side, and " +
        "broadcast-joins the request spine; leafGlobs keeps the tags " +
        "out of the shared-scan regex so the two scans stay minimal."),
    "dedup_semantic" ->
      ("SemDeDup: the quadratic embedding pair scan collapsed to " +
        "within-cluster pairs — ONE equi-join keyed on cent_id against " +
        "the persisted k-means assignment (two parquet scans, no Lloyd " +
        "stage in the plan, same index similarity_ann_kmeans serves " +
        "from), a codegen'd dot product per surviving pair, and a " +
        "per-vector window for the best-neighbor pick. No all-pairs " +
        "stage anywhere."),
    "dedup_substring" ->
      ("Substring-level dedup (the Lee-et-al suffix-array pass as " +
        "rolling spans): one linear explode to (doc, span-md5), a " +
        "docfreq hash aggregate keyed on the 16-byte span hash with " +
        "map-side partials, the dup-key join back, and a per-doc fold. " +
        "Shuffles carry hashes and counts — span text never moves."),
    "dedup_substring_capped" ->
      ("The production twin with the Zipf-head docfreq cap: identical " +
        "plan plus ONE filter right after the docfreq join, dropping " +
        "instances of spans shared by >64 positions BEFORE the per-doc " +
        "shuffle — the stop-word-run skew never reaches a downstream " +
        "stage."),
    "upsert_for_archive" ->
      ("UpdateManyForArchive's relational core: the caller-chosen 5m " +
        "archive's own retention window as a pushed scan predicate, " +
        "then the same partial_max_by LWW aggregate as upsert_batch_lww " +
        "at the archive's resolution — routing bypass costs nothing at " +
        "plan level, it IS the absence of the routing CASE."),
    "knn_classify_ann" ->
      ("knn_classify on its production candidate path: both scans read " +
        "the PERSISTED trained IVF index, the 50-anchor probe ranks 16 " +
        "broadcast centroids per anchor, candidates stream cluster-" +
        "locally through the broadcast probe join, and the unchanged " +
        "vote stage aggregates k·|anchors| rows. No training stage, no " +
        "corpus-wide scored pass — the brute-force key keeps that as " +
        "the small-scale oracle."),
    "mix_temperature" ->
      ("Temperature-scaled source resampling: pass 1 reduces the corpus " +
        "to k per-source token sums (map-side partial aggregation), the " +
        "sqrt-weight budget table is tiny and broadcast back, pass 2 is " +
        "one per-source window over the salted hash order. Two scans, " +
        "one window, no global sort."),
    "dedup_ngram_jaccard" ->
      ("Exact pairwise Jaccard, the small-scale oracle arm of the LSH " +
        "path: ONE exchange of the shared shingle index (group by g), " +
        "df=1 shingles drop before any pair exists, pairs generate by " +
        "double explode of the per-shingle doc list (no index self-join " +
        "— the r13 form shuffled the index twice and joined), then the " +
        "pair-count hash aggregate and two BROADCAST size joins (one " +
        "row per doc; the r14 form re-shuffled the pair frame twice). " +
        "Output is the identical ordered-pair set the oracle's " +
        "self-join emits."),
    "multimodal_decode_real" ->
      ("The real-codec oracle gate: BMP fixture synthesis, the REAL " +
        "javax.imageio decode and the REAL integer area-average " +
        "thumbnail all run inside ONE partition-wise object map; the " +
        "only exchanges are the 8-byte id fan-out ahead of the codec " +
        "stage (one small split would serialize the decode loop on a " +
        "single core) and the doc_id output sort. Cost is linear in " +
        "payload bytes; at 100 TB the fan-out is the media column's " +
        "own file splits."),
    "multimodal_audio_real" ->
      ("The audio sibling of the real-codec gate: WAV synthesis, the " +
        "REAL JavaSound header/PCM decode and the integer loudness " +
        "probe in ONE partition-wise object map after the 8-byte id " +
        "fan-out; no joins, no aggregates, output sort only."),
    "multimodal_video_geometry" ->
      ("The video GEOMETRY gate (r16): MJPEG fixture synthesis and the " +
        "marker-walk frame spans in ONE partition-wise 1→N flatMap " +
        "after the 8-byte id fan-out — same shape as the image/audio " +
        "gates, no joins, no aggregates, output sort only. Frame " +
        "count/offsets/lengths are pure marker arithmetic the oracle " +
        "re-derives; pixel content stays spec-gated (JPEG entropy " +
        "coding is not SQL-re-derivable)."),
    "carbon_ingest" ->
      ("The carbon line-protocol ingest: one text scan, ONE fenced " +
        "tokenization per line (r17: the drop-filter must reference the " +
        "token array as an ATTRIBUTE — unfenced, pushdown re-inlined " +
        "the regex into all five filter conjuncts, which FilterExec " +
        "codegen does not CSE, six regex passes per line), then the " +
        "standard U2 LWW hash aggregate. The shuffle is the same " +
        "bounded per-(metric, bucket) reduction as the parquet ingest " +
        "path."),
    "render_target_canary" ->
      ("FROZEN render-shaped bench canary (r16): the 2-leaf " +
        "divideSeries(sumSeries, sumSeries) target — ONE ranged parquet " +
        "scan feeding both leaf evaluations, dense spines, and the " +
        "broadcast one-row-per-bucket divisor join. The plan must " +
        "never change: it is the tripwire's ambient reference for the " +
        "render-evaluator shape."),
    "carbon_canary" ->
      ("FROZEN carbon-shaped bench canary (r16): the SAME staged line " +
        "tree as carbon_ingest re-parsed (one fenced tokenization per " +
        "line, like the ingest key) and LWW-aligned at the 5m level — " +
        "the tripwire's ambient reference for the text-parse + LWW-agg " +
        "shape."),
    "multimodal_codec_canary" ->
      ("FROZEN codec-shaped bench canary (r17): constant-pixel 48x32 " +
        "BMPs through the REAL javax.imageio decode inside one " +
        "partition-wise object map — id fan-out exchange, codec map, " +
        "output sort, nothing else. The tripwire's ambient reference " +
        "for the mapPartitions-JVM-codec shape (the r16 decode_real " +
        "elevation had no instrument of this shape)."),
    "wsp_roundtrip" ->
      ("The .wsp DataSource V2 scan: `BatchScan wsp` with the pushed " +
        "metric/ts bounds in the scan description — metric predicates " +
        "prune FILES at planning, ts ranges filter ring slots in the " +
        "decoder, and pruned columns never materialize."),
    "wsp_fetch" ->
      ("Whisper's Q1 against the .wsp tree itself: the scan description " +
        "shows metric=error (ONE file opened — whisper's single Open) " +
        "and the fetch window's ts bounds; the dense series is the same " +
        "broadcast spine left-join as the parquet fetch path."),
    "dedup_simhash" ->
      ("Shown plan = the materialized fingerprint INDEX scan (built once " +
        "per (JVM, data), shared with dedup_simhash_pairs). The build " +
        "itself folds the fingerprint as ONE typed aggregate " +
        "(`simhashagg(h64)`, ObjectHashAggregate with a partial step): " +
        "md5 votes pack into a single bigint in the scan's codegen " +
        "stage, one 65-long buffer per doc — not 64 interpreted bit-sum " +
        "expressions per token row (the r5 regression)."),
    "wsp_stream_ingest" ->
      ("The streamed live tree read back: the plan is the same pruned " +
        "`BatchScan wsp` as wsp_roundtrip — the streaming work (F3 gate, " +
        "U3 routing, U2 LWW, slot merge) ran in foreachBatch sinks " +
        "upstream and the tree IS the state, exactly whisper's model."),
    "dedup_simhash_pairs" ->
      ("SimHash at scale: one scan of the materialized fingerprint " +
        "index exploded to 4 band rows, bucket-local pair generation " +
        "(hash aggregate, no self-join), exact bit_count verification " +
        "on candidates only — no CartesianProduct anywhere."),
    "text_lm_score" ->
      ("Bigram LM scoring: instances from zipped slices in the scan's " +
        "codegen stage (no window, no extra shuffle), joined to the " +
        "PERSISTED quantized model table (trained once per corpus - " +
        "no training aggregate in the serving plan), per-doc exact " +
        "integer partial/final HashAggregate."),
    "wsp_fill" ->
      ("whisper-fill as a plan: shown is the filled tree's scan-back; " +
        "the fill itself is a slot-keyed left join + interval compare " +
        "(copy where dst's ring slot is empty or staler) feeding the " +
        "per-metric slot merge — current dst data is never rewritten."),
    "wsp_resize" ->
      ("whisper-resize --aggregate as a plan: the new tree's scan-back; " +
        "the derivation read the source tree ONCE (global ts window " +
        "pushed to the slot decoder), cross-joined the broadcast level " +
        "table, and consolidated every (level, metric, bucket) group in " +
        "a single hash aggregate into the executor-parallel export."),
    "wsp_resize_deep" ->
      ("Resize ACROSS retention tiers: the scan-back of a (10m:2d, " +
        "1h:30d) tree derived from the 3-level cascade source. ONE " +
        "source scan (the [now − maxHorizon, now) window pushed to the " +
        "slot decoder) cross-joined a broadcast level table; band " +
        "admission (live window, horizon clamp, finest-overlapping-" +
        "archive-wins) is inline and disjoint by construction, so one " +
        "hash aggregate with the float32 xff gate resolves every band — " +
        "consolidation, pass-through, and copy alike. History beyond " +
        "the finest archive's span survives — the r6 data-loss gap " +
        "this key exists to pin."),
    "stream_dedup" ->
      ("Streamed exact-dedup decisions read back: the state machine " +
        "(flatMapGroupsWithState keyed by content hash, one long per " +
        "distinct hash ever seen) ran across two id-ordered arrival " +
        "waves and a checkpoint restart upstream; the oracle checks " +
        "per-row is_first/canonical against the batch min rule."),
    "stream_sessionize" ->
      ("Streamed session_window sessions read back: merged-interval " +
        "state with watermark eviction ran upstream (append-mode " +
        "finalization forced by two sentinel files one batch apart); " +
        "rows equal the batch sessionize operator's, checked by the " +
        "SAME oracle SQL."),
    "stream_asof" ->
      ("Streamed as-of enrichment read back: the per-key scalar carry " +
        "(flatMapGroupsWithState, one (ts, value) pair per metric — " +
        "O(#metrics) state, never O(history)) ran across two event-time " +
        "arrival waves and a checkpoint restart upstream; every row " +
        "equals the batch lag window over (metric ORDER BY ts, " +
        "event_id), which is exactly the oracle's definition."),
    "shard_pack_scalable" ->
      ("Distributed prefix-sum shard assignment: per-block partial " +
        "sums, a windowed offset pass over the TINY block frame (the " +
        "only single-partition step — #blocks rows, ~n/512), offsets " +
        "broadcast back, every per-document window keyed by blk. The " +
        "direct global-window form is the oracle and the bottleneck " +
        "this replaces."),
    "bm25_search" ->
      ("Okapi BM25 served from the PERSISTED postings index (the " +
        "ANN-codebook/DSIR pattern): no Generate anywhere — the build's " +
        "one corpus explode is amortized, and the query-term In " +
        "predicate reaches the postings parquet scan as a pushed filter " +
        "(row-group pruning on the term column). Query table, df slice " +
        "and 1-row corpus stats all broadcast; the per-(query,doc) " +
        "sorted term fold is an ObjectHashAggregate; the top-10 cut " +
        "runs as WindowGroupLimit (partial + final) so no partition " +
        "ever sorts more than k rows per query."),
    "embed_project" ->
      ("Johnson-Lindenstrauss projection audit. The JL sign matrix is " +
        "16 literal 64-float rows baked into the projection, one " +
        "codegen'd `dot_f` per output dim — the whole audit is Scan → " +
        "Project with the ONLY exchange being the presentation sort. At " +
        "100 TB this is a single map-side pass over the embedding table."),
    "knn_classify" ->
      ("kNN label propagation: the 50-anchor side broadcasts " +
        "(BroadcastNestedLoopJoin on the `query_id <> vec_id` predicate " +
        "— the request-bounded anchor fan-out, not a corpus cartesian), " +
        "the neighbor top-10 runs as WindowGroupLimit, and the vote is " +
        "a hash aggregate over k·|anchors| rows. Swapping the candidate " +
        "generator to the persisted IVF/PQ index leaves everything " +
        "above the scored pass unchanged."),
    "mine_negatives" ->
      ("Hard-negative triplet mining: one broadcast-anchor scored pass " +
        "feeds both the positive (rank-1 same-label) and negative " +
        "(top-5 different-label) windows — each a WindowGroupLimit — " +
        "and the margin join back to the positives is a broadcast hash " +
        "join on query_id."),
    "fetch_asof" ->
      ("As-of / LOCF grid sampling by composition: points and the " +
        "hourly grid marks union into one frame, a single per-metric " +
        "window (ts ASC, is_point DESC) carries the last observation " +
        "forward. One metric-keyed exchange feeds the window sort; both " +
        "time bounds reach the parquet scan as PushedFilters (pinned " +
        "with the other fetch keys). The DuckDB oracle is a NATIVE " +
        "`ASOF LEFT JOIN` — the composed form is checked against a " +
        "first-class implementation of the operator."),
    "text_entropy" ->
      ("Token-distribution entropy: explode → (doc, token) count " +
        "aggregate (map-side partial on the doc_id-keyed exchange) → " +
        "per-doc ObjectHashAggregate folding c·ln(c) over the " +
        "token-sorted count list. No window, no join; the only " +
        "exchanges are the two keyed aggregations and the presentation " +
        "sort."),
    "fetch_downsample" ->
      ("LTOB visual downsampling: lag/lead neighbor windows and the " +
        "per-bucket rank all share the one metric-keyed exchange " +
        "(HashPartitioning(metric) already clusters (metric, bucket), " +
        "so the rank window adds a Sort but no shuffle). Both time " +
        "bounds are pushed into the parquet scan; the minute aggregate " +
        "is partial-combined before its shuffle. The per-bucket argmax " +
        "runs as WindowGroupLimit."),
    "token_pmi" ->
      ("PMI collocation mining: bigram instances from the " +
        "staggered-slice zip (codegen, zero shuffle), two token-keyed " +
        "partial-aggregated count tables, a 1-row total broadcast, and " +
        "TakeOrderedAndProject for the top-k — no global sort anywhere."),
    "fetch_asof_scalable" ->
      ("The skew-safe two-pass as-of carry: pass 1's window keys by " +
        "(metric, block) — the hot metric spreads across its blocks — " +
        "and pass 2 stitches boundaries over the per-(metric, block) " +
        "TAIL frame (#blocks rows, broadcast back), never event " +
        "volume. Row-identical to fetch_asof by pin; same pushed time " +
        "bounds at the scan."),
    "source_overlap" ->
      ("Cross-source duplication matrix: the shared shingle index " +
        "reduces to DISTINCT (source, shingle), self-joins by shingle " +
        "(per-shingle pair fan-out bounded by k²/2 for k sources), and " +
        "the k-row size table returns as a broadcast join onto the " +
        "k²/2-row pair lattice — the corpus text never moves."),
    "token_bpe_merges" ->
      ("BPE merge training, Sennrich's vocab-table form: the ONE corpus " +
        "pass lives in the eager localCheckpoint (the ExistingRDD " +
        "leaves), so every iteration is a pair explode + map-side-" +
        "combined aggregate over |vocab| rows with the winning pair " +
        "riding a 1-row broadcast back into the merge rewrite — NO " +
        "documents scan anywhere in this plan (pinned)."),
    "cluster_stats" ->
      ("The k-means partition-health audit: two parquet scans of the " +
        "persisted index (codebook broadcast onto the assignment), one " +
        "dot product per vector, one hash aggregate keyed by cent_id " +
        "(k rows out), and the 1-row corpus total broadcast back for " +
        "the fraction. No Lloyd stage — the training plan must never " +
        "leak into an index consumer (pinned)."),
    "text_blocklist" ->
      ("The C4 blocklist gate: the wordlist is a literal inside one " +
        "codegen'd filter lambda over the token array — a pure map-side " +
        "projection whose only exchange is the presentation sort " +
        "(pinned). A real wordlist swaps in as a broadcast variable " +
        "without changing the shape."),
    "rank_fusion" ->
      ("RRF hybrid retrieval: the BM25 arm still serves from the " +
        "persisted postings index with the term In predicate pushed " +
        "(pinned — fusing must not degrade the arms), the cosine arm " +
        "broadcasts its queries, and the fusion is a UNION + per-pair " +
        "max aggregate over the top-k lists (r18 — Spark cannot " +
        "broadcast an equi full-outer join, so the old form paid a " +
        "SortMergeJoin with an exchange+sort per arm; the aggregate " +
        "rebuilds the identical rows with each arm computed once)."),
    "corpus_report" ->
      ("The per-source dashboard: five summary aggregates in ONE " +
        "groupBy(source) pass (pinned no-join); the count-distinct " +
        "expansion shuffles 16-byte md5 keys with map-side partials, " +
        "never document text."),
    "rollup_drift" ->
      ("The avg-of-avg bias audit: both hourly recomputes (cascaded " +
        "via 5m, direct from 1m) branch off the one lww base pass as " +
        "partial-aggregated bucket shuffles; the final equi-join is " +
        "keyed by (metric, 1h bucket) — rollup-sized, not points."),
    "embed_isotropy" ->
      ("Corpus isotropy in two linear passes: the exploded per-dim " +
        "normalized sums (64-row partial-agg shuffle) and the scalar " +
        "count/norm pass, joined by a 1-row broadcast — the ‖Σu‖² " +
        "identity replaces any pairwise scan."),
    "minhash_audit" ->
      ("The Broder estimator audit, served from its persisted parquet " +
        "(the shared-index lifecycle): build cost — signatures one " +
        "pass, candidates bucket-local, exact verification bounded by " +
        "the candidate doc set — amortizes across runs like the ANN " +
        "and BM25 indexes."),
    "sketch_hll" ->
      ("Deterministic HLL: one linear pass over the shingle index " +
        "(md5-prefix value, comparison-ladder rank — all codegen'd " +
        "arithmetic), a 256-row register aggregate, and the scalar " +
        "correction algebra. The exact arm's count-distinct expansion " +
        "is the comparison the sketch exists to avoid."),
    "sketch_cms" ->
      ("Count-Min: the build explodes 4 (row, col) pairs per token " +
        "occurrence into a <=1024-group map-side-combined aggregate — " +
        "the counter table IS the aggregation state; serving probes " +
        "the top-k tokens against the broadcast counters with a " +
        "min-of-rows fold."),
    "token_bpe_apply" ->
      ("The BPE encode: the same checkpointed vocab chain as training " +
        "(no documents scan — Sennrich's frequency-weighted word " +
        "table), one more merge application, and a single scalar " +
        "aggregate for the chars-per-token report."),
    "sketch_quantile" ->
      ("The quantile sketch: one linear pass folds doc lengths into " +
        "the ~530-bin exponential histogram (map-side combined); the " +
        "rank walk, interpolation and exact-percentile audit all run " +
        "on the bin table and a 3-row percentile frame via 1-row " +
        "broadcasts."),
    "data_validate" ->
      ("Constraint validation: all seven checks ride ONE conditional " +
        "aggregate over the corpus (the uniqueness distinct-expansion " +
        "shuffles only doc_id); stack unpivots the summary row, so no " +
        "per-constraint branch re-aggregates."),
    "curate_funnel" ->
      ("The drop-accounting report: one aggregation over the curate " +
        "manifest's gate flags — the cluster contraction, broadcast " +
        "decontamination and single-pass features all belong to " +
        "curate's own plan and amortize with it."),
    "minhash_band_sweep" ->
      ("The LSH banding tuning curve, served from the shared persisted " +
        "index like minhash_audit (a calibration runs once per corpus; " +
        "5.3 s live vs 0.05 s served at sf0.1). The BUILD is one " +
        "checkpointed signature pass feeding all four banding arms — " +
        "band-key explode, bucket collect, two counts each — plus the " +
        "exact-Jaccard ground truth on the ngram pair frame's single " +
        "exchange; no all-pairs stage anywhere."),
    "dedup_threshold_sweep" ->
      ("Tau sensitivity in ONE aggregate: the SemDeDup pair scan " +
        "(persisted-index equi-join, never all-pairs) reduces to " +
        "per-vector best-neighbor cosine, then every threshold is a " +
        "conditional sum over that frame, stack-unpivoted."),
    "split_balance" ->
      ("The stratification audit: split assignment is the map-side " +
        "md5 arithmetic inline (no join), features ride the same row, " +
        "and the only exchanges are the tens-of-groups (split, lang) " +
        "aggregate plus the broadcast of per-split totals."))

  /** Make a formatted plan diff-stable (r15 verdict #5): Catalyst
    * expression ids and plan_ids are JVM-global counters, so a
    * regeneration with ZERO plan changes used to rewrite every id in
    * the file (the r15 close produced a 7,692-line diff for no intended
    * change, making plan-regression review by diff impossible).
    * Renumber both id families by FIRST APPEARANCE within each plan —
    * deterministic for an unchanged plan shape, still distinct within
    * a plan — and mask the run-local components of shared-index tmp
    * roots (content digest changes with testdata regeneration, pid
    * with every JVM).
    */
  private[tools] def normalizePlan(plan: String): String = {
    def renumber(s: String, pat: scala.util.matching.Regex,
        fmt: Int => String): String = {
      val ids = scala.collection.mutable.LinkedHashMap[String, Int]()
      pat.replaceAllIn(s, m =>
        scala.util.matching.Regex.quoteReplacement(
          fmt(ids.getOrElseUpdate(m.group(1), ids.size + 1))))
    }
    val exprIds = renumber(plan, "#(\\d+)".r, n => s"#$n")
    val planIds = renumber(exprIds, "plan_id=(\\d+)".r, n => s"plan_id=$n")
    // rdd ids renumber like the other families (NOT a single mask:
    // two distinct checkpointed RDDs must stay distinguishable so a
    // subtree switching sources still shows up in the diff)
    val rddIds = renumber(planIds, "rdd_([0-9]+)".r, n => s"rdd_$n")
    rddIds
      .replaceAll("(graft_[A-Za-z0-9_]+?)_[0-9a-f]{32}_p[0-9]+",
        "$1_DIGEST_pPID")
      // JVM object identities: typed-aggregate instances, broadcast
      // byte arrays, ObjectMapPartitions lambdas
      .replaceAll("\\$\\$Lambda\\$[0-9]+/0x[0-9a-fA-F]+", "\\$\\$Lambda")
      // identity hashes, anchored to contexts that actually look like
      // JVM `toString` output (r16 ADVICE: the bare `\w@hex` form also
      // rewrote legitimate plan text such as a string literal 'a@cafe'
      // in a filter, silently corrupting the dump): either the token
      // before '@' is package/inner-class-qualified (contains '.' or
      // '$' — every Spark plan identity we mask prints an FQCN or a
      // lambda/anon suffix), or the hex run is 6+ digits (a short
      // all-hex WORD like 'cafe' no longer qualifies on its own)
      .replaceAll("([\\w$.\\]]*[.$][\\w$\\]]*)@[0-9a-fA-F]{1,16}\\b",
        "$1@HASH")
      // JVM array-type toStrings ('[B@4a2f', '[[J@ff') are bare (no
      // dot/$) and ~0.05% of identities hash under 6 hex digits — mask
      // them at ANY length or a zero-change regeneration can still
      // produce a spurious one-line diff (r17 review)
      .replaceAll("(\\[+[BCDFIJSZ])@[0-9a-fA-F]{1,16}\\b", "$1@HASH")
      .replaceAll("([\\w\\]])@[0-9a-fA-F]{6,16}\\b", "$1@HASH")
      // RDD creation-site annotations ('MapPartitionsRDD[534] at
      // localCheckpoint at Similarity.scala:539'): the LINE NUMBER
      // moves with every edit ABOVE the call site — a scaladoc-only
      // change to the file produced a 6-hunk spurious diff at the r17
      // close. The file name stays (a subtree switching sources must
      // still diff); only the line is masked.
      .replaceAll("(at [A-Za-z0-9_]+\\.scala):\\d+", "$1:LINE")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("EXPLAIN.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# EXPLAIN — headline physical plans\n\n")
    sb.append(s"Generated by `graft.tools.ExplainDump` at `$sfDir` " +
      "(plan SHAPE is scale-invariant; only row counts change with SF).\n" +
      "Each section names the property the plan must show — the same " +
      "properties `PlanSpec` asserts in CI.\n")
    for ((key, note) <- Keys) {
      val df = SparkEntry.queries(key)(spark, sfDir)
      val plan = normalizePlan(
        df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      sb.append(s"\n## $key\n\n$note\n\n```\n$plan```\n")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // scalastyle:off println
    println(s"[explain] wrote $out (${Keys.size} plans)")
    // scalastyle:on println
    spark.stop()
  }
}
