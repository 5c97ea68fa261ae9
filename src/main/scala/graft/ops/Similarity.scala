package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings(vec_id, embedding float[64], label)`
  * (SURVEY.md §2.9 X3).
  *
  * Two paths, same output shape:
  *  - [[similarityTopk]]: brute-force cosine top-k — the exactness
  *    baseline. O(|Q|·n) dot products; the query side is broadcast, so
  *    the candidate scan is a single embarrassingly parallel pass — at
  *    100 TB this is the correctness oracle you run on a sample, not the
  *    production path.
  *  - [[similarityAnnIvf]]: IVF-style ANN — a fixed-k coarse quantizer
  *    (a deterministic k-sample of the vectors as centroids) assigns
  *    every vector to its nearest centroid once (one broadcast pass),
  *    then each query probes its nprobe nearest clusters: the candidate
  *    scan shrinks to ~nprobe/k of the corpus. Both the assignment and
  *    the probe are broadcast joins — no all-pairs shuffle anywhere.
  *    Recall < 1 by design; the candidate sets are deterministic, so the
  *    DuckDB oracle still matches exactly.
  *
  * Dot products run entirely in codegen'd higher-order functions
  * (`zip_with` + `aggregate`, doubles) — no UDF, no collect.
  */
object Similarity {

  /** Number of query vectors (vec_id < 10) and neighbors per query. */
  val NumQueries = 10
  val TopK = 5
  /** IVF centroid count k. Real IVF trains k centroids with k fixed
    * (or ~sqrt(n) capped); the round-1 every-50th-vector rule made k grow
    * O(n) and assignment cost O(n²/50). Here: the k vectors with the
    * smallest md5(vec_id) — a deterministic pseudo-random sample both
    * engines compute identically, with O(n·k) assignment.
    *
    * k is THE scale knob for the within-cluster quadratics downstream
    * ([[dedupSemantic]] and its sweep scan n²/k pairs in expectation, so
    * holding k fixed while n grows 10× grows the pair work ~100× — the
    * r17 full-suite sf1 sweep measured exactly that as exponents of
    * 1.2–1.3 on the three SemDeDup-family keys). A deployment sizes
    * k ∝ n (or ~sqrt(n) when only ANN probe cost matters, not pair
    * enumeration); `SPARK_GRAFT_CENTROIDS` overrides it for scale
    * experiments so the k∝n prescription is MEASURABLE, not just a
    * design note (SCALING.md). Default 16 — the round-to-round
    * correctness fixture — and every oracle SQL interpolates this same
    * value, so engine and DuckDB agree at ANY k. The persisted codebook
    * lives under a per-JVM tmp root ([[Dedup.sharedIndexPath]] appends
    * the pid), so runs at different k can never share an index.
    */
  val NumCentroids: Int = {
    val k = sys.env.get("SPARK_GRAFT_CENTROIDS").map { v =>
      // name the knob in the failure: a bare toInt here would surface
      // as an opaque ExceptionInInitializerError on the whole object
      try v.trim.toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_CENTROIDS must be an integer, got '$v'")
      }
    }.getOrElse(16)
    require(k >= 4, s"SPARK_GRAFT_CENTROIDS must be >= 4 " +
      s"(the NProbe floor would exceed k): $k")
    // 2^20 cap: far above any useful k for these corpora, and it keeps
    // the SweepNProbes power ladder safely inside Int (past 2^30 the
    // doubling iterator would overflow negative and never terminate)
    require(k <= (1 << 20), s"SPARK_GRAFT_CENTROIDS too large: $k")
    k
  }

  /** Clusters probed per query. nprobe > 1 is standard IVF practice:
    * recall grows with the probed fraction while the candidate scan stays
    * nprobe/k of the corpus. Derived as k/4 (floor 4) rather than a
    * fixed count because the PROBED FRACTION is the recall invariant: a
    * `SPARK_GRAFT_CENTROIDS` scale experiment that grew k with nprobe
    * fixed would silently shrink the probed fraction and read a recall
    * drop that is really a mis-held knob (AnnRecallSpec's floor holds
    * at any k this way). Default k=16 → the historical nprobe 4.
    */
  val NProbe: Int = math.max(4, NumCentroids / 4)

  import graft.functions.VectorOps.dot_f

  /** Vector L2 norm — precompute once per row before a pair join so each
    * candidate pair costs ONE dot product, not three.
    */
  def normExpr(a: String): Column = sqrt(dot_f(col(a), col(a)))

  /** DuckDB equivalent (lists cast to DOUBLE[] so both engines sum
    * doubles; ~1e-15 association noise is absorbed by round(..., 6)).
    */
  def cosineSql(a: String, b: String): String =
    s"(list_dot_product($a::DOUBLE[], $b::DOUBLE[]) / " +
      s"(sqrt(list_dot_product($a::DOUBLE[], $a::DOUBLE[])) * " +
      s"sqrt(list_dot_product($b::DOUBLE[], $b::DOUBLE[]))))"

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet").select(col("vec_id"), col("embedding"))

  /** `similarity_topk`: exact cosine top-5 for the 10 query vectors.
    * Norms are projected once per side before the pair join — each
    * (query, candidate) pair costs exactly one dot product.
    */
  def similarityTopk(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).withColumn("cn", normExpr("embedding"))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("cn").as("qn"))
    val scored = e.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .withColumn("score", dot_f(col("qe"), col("embedding")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("query_id"), col("vec_id").as("cand_id"),
        round(col("score"), 6).as("score"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  val similarityTopkSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
       |           FROM embeddings WHERE vec_id < $NumQueries),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS cand_id,
       |         ${cosineSql("q.qe", "e.embedding")} AS score
       |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, cand_id, round(score, 6) AS score,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY score DESC, cand_id) AS rnk
       |  FROM scored)
       |SELECT query_id, cand_id, score, rnk FROM ranked
       |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin

  /** `similarity_topk_agg`: the same exact top-k as [[similarityTopk]],
    * computed with the typed [[graft.functions.TopKAgg]] Aggregator
    * instead of a window — map-side partial top-k buffers bound shuffle
    * volume by k·#queries instead of sorting every candidate per group
    * (the better shape when #candidates per group is huge). Shares
    * [[similarityTopkSql]] as its oracle: both forms must produce
    * byte-identical results.
    */
  def similarityTopkAgg(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).withColumn("cn", normExpr("embedding"))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("cn").as("qn"))
    val topk = udaf(new graft.functions.TopKAgg(TopK),
      Encoders.product[graft.functions.ScoredId])
    e.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        (dot_f(col("qe"), col("embedding")) / (col("qn") * col("cn"))).as("score"))
      .groupBy("query_id")
      .agg(topk(col("cand_id"), col("score")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.cand_id").as("cand_id"),
        round(col("t.score"), 6).as("score"), (col("pos") + 1).as("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** Builds — or reuses — the on-disk IVF index for `embeddings.parquet`
    * under `dir`: `<root>/cents` is the codebook `(cent_id, ce, ce_n)`,
    * `<root>/assigned` the inverted assignment `(vec_id, embedding, cn,
    * cent_id)`. Real ANN deployments build the index OFFLINE and serve
    * many queries against it; this persists the build under the shared
    * tmp-index lifecycle ([[Dedup.sharedIndexPath]]: freshness-keyed,
    * pruned on regeneration, swept on JVM exit) so every serving call —
    * and every warm bench run — pays only the probe. The parquet
    * round-trip is exact (float32 arrays and doubles are stored
    * bit-identically), so results match the recompute-everything oracle.
    *
    * `trained = false`: the codebook is the deterministic md5-sample
    * (plans as TakeOrderedAndProject — per-partition top-k, no global
    * sort). `trained = true`: [[KMeansIters]] Lloyd iterations from that
    * same seed — per iteration one broadcast assignment pass (`max_by`
    * over k centroid scores, a plain hash aggregation; O(n·k), no window
    * over raw rows) and one per-dimension mean whose `groupBy(cent, pos)`
    * partially aggregates map-side, so the shuffle carries k·64 partial
    * sums per partition, not n·64 rows. Centroid means round to 6
    * decimals and cast to float32 IN BOTH ENGINES — the trained codebook
    * is bit-identical despite double-summation order differing (the same
    * absorb-the-ulps trick the xFF gate uses).
    */
  private def annIndexShared(s: SparkSession, dir: String, trained: Boolean)
      : (DataFrame, DataFrame) = {
    val name = if (trained) "ivf_trained" else "ivf_seed"
    val root = Dedup.sharedIndexPath(s, dir, "embeddings.parquet", name) { p =>
      val e = emb(s, dir).withColumn("cn", normExpr("embedding"))
      var cents = e.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        .limit(NumCentroids)
        .select(col("vec_id").as("cent_id"), col("embedding").as("ce"),
          col("cn").as("ce_n"))
      // nearest centroid per vector: max (cscore, -cent_id) → ties to
      // the smaller cent_id
      def assignTo(c: DataFrame): DataFrame =
        e.crossJoin(broadcast(c))
          .withColumn("cscore",
            dot_f(col("embedding"), col("ce")) / (col("cn") * col("ce_n")))
          .groupBy("vec_id")
          .agg(max_by(col("cent_id"), struct(col("cscore"), -col("cent_id")))
            .as("cent_id"))
      if (trained) {
        for (_ <- 1 to KMeansIters) {
          val assign = assignTo(cents)
          val means = e.join(assign, "vec_id")
            .select(col("cent_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
            .groupBy("cent_id", "pos")
            .agg(round(sum(col("v").cast("double")) / count(lit(1)), 6).as("cv"))
          // rebuild the dim-ordered float32 array; eager pin — each
          // trained codebook feeds the next assignment pass
          cents = means.groupBy("cent_id")
            .agg(expr("transform(array_sort(collect_list(struct(pos, cv)))," +
              " x -> CAST(x.cv AS FLOAT))").as("ce"))
            .withColumn("ce_n", normExpr("ce"))
            .localCheckpoint(true)
        }
      }
      // overwrite, matching the other shared-index builds: a transient
      // failure between the two writes must not poison the root for
      // every retry in this JVM (getOrElseUpdate only caches success)
      cents.write.mode("overwrite").parquet(s"$p/cents")
      val centsR = s.read.parquet(s"$p/cents")
      e.join(assignTo(centsR), "vec_id").write.mode("overwrite").parquet(s"$p/assigned")
    }
    (s.read.parquet(s"$root/cents"), s.read.parquet(s"$root/assigned"))
  }

  /** Serving path shared by both ANN variants: each query probes its
    * [[NProbe]] nearest clusters (the probe ranking is a window over
    * [[NumCentroids]] centroid scores per query — NumQueries × k rows,
    * 10 × 16 at the default config), candidates
    * are scanned cluster-locally via a broadcast join on the probed
    * cent_id, exact cosine re-ranks. A candidate lives in exactly one
    * cluster, so the probe join yields each (query, candidate) pair at
    * most once — no dedup needed.
    */
  /** The IVF probe lattice shared verbatim by [[serveAnn]],
    * [[annNprobeSweep]] and [[knnClassifyAnn]] (r16 review — three
    * near-identical inline copies risked a scoring or tie-break tweak
    * desyncing the sweep curve / classifier from the serving path they
    * audit): every query row in `queries` (vec_id, embedding, cn +
    * any carry columns, pre-filtered to the query set) is scored
    * against the broadcast centroid table and probe-ranked by
    * (cscore DESC, cent_id). `maxProbe = Some(n)` keeps the n nearest
    * cells and drops the rank (the serving form); `None` carries the
    * FULL lattice with its `prn` column (the sweep form, which filters
    * per arm downstream).
    */
  private def probeLattice(queries: DataFrame, cents: DataFrame,
      maxProbe: Option[Int]): DataFrame = {
    val probeW = Window.partitionBy("vec_id")
      .orderBy(col("cscore").desc, col("cent_id"))
    val ranked = queries
      .crossJoin(broadcast(cents))
      .withColumn("cscore",
        dot_f(col("embedding"), col("ce")) / (col("cn") * col("ce_n")))
      .withColumn("prn", row_number().over(probeW))
    val cut = maxProbe.fold(ranked)(n => ranked.filter(col("prn") <= n))
    val carries = queries.columns
      .filterNot(Set("vec_id", "embedding", "cn")).map(col).toSeq
    cut.select(Seq(col("vec_id").as("query_id"),
      col("embedding").as("qe"), col("cn").as("qn"),
      col("cent_id").as("qcent")) ++ carries ++
      (if (maxProbe.isEmpty) Seq(col("prn")) else Nil): _*)
  }

  private def serveAnn(cents: DataFrame, assigned: DataFrame): DataFrame = {
    val q = probeLattice(
      assigned.select(col("vec_id"), col("embedding"), col("cn"))
        .filter(col("vec_id") < NumQueries),
      cents, Some(NProbe))
    val scored = assigned.join(broadcast(q),
        col("cent_id") === col("qcent") && col("query_id") =!= col("vec_id"))
      .withColumn("score", dot_f(col("qe"), col("embedding")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("query_id"), col("vec_id").as("cand_id"),
        round(col("score"), 6).as("score"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** `similarity_ann_ivf`: IVF coarse-quantized ANN with multi-probe,
    * served from the persisted [[annIndexShared]] index (seed codebook).
    */
  def similarityAnnIvf(s: SparkSession, dir: String): DataFrame = {
    val (cents, assigned) = annIndexShared(s, dir, trained = false)
    serveAnn(cents, assigned)
  }

  /** Lloyd iterations for [[similarityAnnKmeans]]. Two suffice to move
    * every centroid off its seed vector onto a cluster mean (the point of
    * the exercise: the partition rests on data structure, not on which
    * vectors the md5 sample happened to pick).
    */
  val KMeansIters = 2

  /** `similarity_ann_kmeans`: IVF-ANN over TRAINED centroids — k-means on
    * the full vector set, initialized from the deterministic md5 sample
    * [[similarityAnnIvf]] uses as-is (training details in
    * [[annIndexShared]]); the serving path is identical, only the
    * partition quality changes.
    *
    * At 100 TB: same plan per iteration (broadcast k centroids, one
    * corpus pass, k·dim-sized shuffle); you train on a sample and freeze
    * the codebook, which is exactly this pipeline with a sampled input —
    * and the frozen codebook + inverted assignment ARE the persisted
    * index the shared root holds.
    */
  def similarityAnnKmeans(s: SparkSession, dir: String): DataFrame = {
    val (cents, assigned) = annIndexShared(s, dir, trained = true)
    serveAnn(cents, assigned)
  }

  private def assignCte(name: String, cents: String): String =
    s"""$name AS (
       |  SELECT vec_id, cent_id FROM (
       |    SELECT e.vec_id, c.cent_id,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosineSql("e.embedding", "c.ce")} DESC, c.cent_id) AS arn
       |    FROM embeddings e, $cents c)
       |  WHERE arn = 1)""".stripMargin

  private def centsCte(name: String, assign: String): String =
    s"""$name AS (
       |  SELECT cent_id, list(cv ORDER BY pos)::FLOAT[] AS ce FROM (
       |    SELECT a.cent_id, x.pos, round(sum(CAST(x.v AS DOUBLE)) / count(*), 6) AS cv
       |    FROM embeddings e
       |    JOIN $assign a ON a.vec_id = e.vec_id,
       |    LATERAL (SELECT generate_subscripts(e.embedding, 1) AS pos,
       |                    unnest(e.embedding) AS v) x
       |    GROUP BY a.cent_id, x.pos)
       |  GROUP BY cent_id)""".stripMargin

  /** Name of the final trained-codebook CTE inside [[kmeansTrainedCtes]]. */
  private val KMeansFinalCents = s"cents$KMeansIters"

  /** The deterministic Lloyd unroll as a reusable CTE chain —
    * `cents0, assign1, cents1, …, assign_f` — assignment t feeds
    * per-dimension means (same round-to-6 + float32 cast as the engine),
    * cents t feeds assignment t+1, and `assign_f` is the final
    * vector→cluster map. Shared by [[similarityAnnKmeansSql]] and
    * [[dedupSemanticSql]] so the two oracles can never train different
    * codebooks than the ONE persisted index both engine paths serve from.
    */
  private[ops] val kmeansTrainedCtes: String = {
    val train = (1 to KMeansIters).map { t =>
      assignCte(s"assign$t", s"cents${t - 1}") + ",\n" +
        centsCte(s"cents$t", s"assign$t")
    }.mkString(",\n")
    s"""cents0 AS (
       |  SELECT vec_id AS cent_id, embedding AS ce
       |  FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $NumCentroids),
       |$train,
       |${assignCte("assign_f", KMeansFinalCents)}""".stripMargin
  }

  /** Oracle: [[kmeansTrainedCtes]] + serving CTEs mirroring
    * [[similarityAnnIvfSql]].
    */
  val similarityAnnKmeansSql: String = {
    val cf = KMeansFinalCents
    s"""WITH $kmeansTrainedCtes,
       |q AS (
       |  SELECT query_id, qe, qcent FROM (
       |    SELECT e.vec_id AS query_id, e.embedding AS qe, c.cent_id AS qcent,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosineSql("e.embedding", "c.ce")} DESC, c.cent_id) AS prn
       |    FROM embeddings e, $cf c
       |    WHERE e.vec_id < $NumQueries)
       |  WHERE prn <= $NProbe),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS cand_id,
       |         ${cosineSql("q.qe", "e.embedding")} AS score
       |  FROM q
       |  JOIN assign_f a ON a.cent_id = q.qcent
       |  JOIN embeddings e ON e.vec_id = a.vec_id
       |  WHERE e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, cand_id, round(score, 6) AS score,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY score DESC, cand_id) AS rnk
       |  FROM scored)
       |SELECT query_id, cand_id, score, rnk FROM ranked
       |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin
  }

  /** Cosine threshold above which two same-cluster embeddings count as
    * semantic duplicates. Lower than [[graft.ops.Dedup.dedupEmbedding]]'s
    * exact-pair 0.45 on purpose: SemDeDup prunes *semantically redundant*
    * items, not just near-copies.
    */
  val SemDedupTau = 0.4

  /** The within-cluster earlier-vs-later pair scan — `(vec_id, prev_id,
    * cos)` for every pair sharing a cluster with `prev_id < vec_id` —
    * single-sourced between [[dedupSemantic]] and
    * [[dedupThresholdSweep]] so the sweep can never report a curve for
    * different pair semantics than the dedup key deploys (the
    * [[Tokens]] desync rule applied to a plan fragment).
    */
  private def semanticPairs(assigned: DataFrame): DataFrame = {
    val a = assigned.select(col("cent_id"), col("vec_id"), col("embedding"),
      col("cn"))
    val prev = a.select(col("cent_id").as("pcent"),
      col("vec_id").as("prev_id"), col("embedding").as("pe"),
      col("cn").as("pn"))
    a.join(prev,
        col("pcent") === col("cent_id") && col("prev_id") < col("vec_id"))
      .withColumn("cos",
        dot_f(col("embedding"), col("pe")) / (col("cn") * col("pn")))
      .select(col("vec_id"), col("prev_id"), col("cos"))
  }

  /** SQL twin of [[semanticPairs]] as the `pr` CTE body (expects the
    * [[kmeansTrainedCtes]] chain in scope).
    */
  private val semanticPairsCte: String =
    s"""pr AS (
       |  SELECT a.vec_id, p.vec_id AS prev_id,
       |         ${cosineSql("a.embedding", "p.embedding")} AS cos
       |  FROM embeddings a
       |  JOIN assign_f fa ON fa.vec_id = a.vec_id
       |  JOIN assign_f fp ON fp.cent_id = fa.cent_id AND fp.vec_id < a.vec_id
       |  JOIN embeddings p ON p.vec_id = fp.vec_id)""".stripMargin

  /** `dedup_semantic`: SemDeDup (Abbas et al., arXiv:2303.09540) —
    * semantic dedup via k-means clustering + within-cluster cosine.
    * Reuses the SAME persisted trained codebook/assignment as
    * [[similarityAnnKmeans]]; a vector is a duplicate iff some
    * lower-vec_id vector in its cluster has cosine ≥ [[SemDedupTau]]
    * (the deterministic stand-in for the paper's keep-one-per-group
    * choice). Emits one row per vector: cluster, is_dup, and the
    * CLOSEST earlier in-cluster neighbor (highest cosine, ties →
    * lowest id). Note `dup_of` may itself be flagged — this is the
    * greedy-by-index approximation, so A~B~C with A≁C prunes both B
    * and C; chase chains through [[graft.ops.Dedup.dedupCluster]]'s
    * contraction when a kept-representative mapping is needed.
    *
    * At 100 TB this is THE scale story for embedding dedup: the
    * quadratic pair scan collapses to within-cluster pairs (n²/k per
    * cluster in expectation) behind one equi-join keyed on cent_id —
    * no all-pairs stage anywhere, and the index is built once and
    * persisted, so re-runs pay only the join. A pathological mega
    * cluster re-splits by raising k (or sub-clustering recursively);
    * the join itself is AQE-skew-splittable since only the JOIN key is
    * the cluster.  [[graft.ops.Dedup.dedupEmbedding]] remains the exact
    * small-scale oracle for the pair semantics.
    */
  def dedupSemantic(s: SparkSession, dir: String): DataFrame = {
    val (_, assigned) = annIndexShared(s, dir, trained = true)
    val a = assigned.select(col("cent_id"), col("vec_id"))
    val pairs = semanticPairs(assigned)
      .filter(col("cos") >= SemDedupTau)
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("prev_id"))
    val best = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("prev_id").as("dup_of"),
        round(col("cos"), 6).as("cosine"))
    a.select("vec_id", "cent_id").join(best, Seq("vec_id"), "left")
      .withColumn("is_dup", col("dup_of").isNotNull.cast("int"))
      .select("vec_id", "cent_id", "is_dup", "dup_of", "cosine")
      .orderBy("vec_id")
  }

  /** Oracle: [[kmeansTrainedCtes]] + the within-cluster pair scan as a
    * three-way join on `assign_f`.
    */
  val dedupSemanticSql: String =
    s"""WITH $kmeansTrainedCtes,
       |$semanticPairsCte,
       |best AS (
       |  SELECT vec_id, prev_id AS dup_of, round(cos, 6) AS cosine
       |  FROM (SELECT vec_id, prev_id, cos,
       |               row_number() OVER (PARTITION BY vec_id
       |                                  ORDER BY cos DESC, prev_id) AS rn
       |        FROM pr WHERE cos >= $SemDedupTau)
       |  WHERE rn = 1)
       |SELECT f.vec_id, f.cent_id,
       |       CASE WHEN b.dup_of IS NULL THEN 0 ELSE 1 END AS is_dup,
       |       b.dup_of, b.cosine
       |FROM assign_f f LEFT JOIN best b USING (vec_id)
       |ORDER BY f.vec_id""".stripMargin

  // ------------------------------------------- X67 IVF nprobe sweep

  /** Probe counts swept by [[annNprobeSweep]] — powers of two strictly
    * below [[NumCentroids]], then NumCentroids itself as the final rung
    * (so the last arm scans every cluster and its recall is 1.0 by
    * construction: the built-in self-check, pinned by AnnRecallSpec).
    * Derived, not listed, so a `SPARK_GRAFT_CENTROIDS` override keeps
    * the exhaustive-arm invariant; at the default k=16 this is exactly
    * the historical Seq(1, 2, 4, 8, 16).
    */
  val SweepNProbes: Seq[Int] = probeLadder(NumCentroids)

  /** The sweep ladder for a given centroid count: powers of two
    * strictly below k, then k itself — extracted pure so the k-generic
    * invariants (last rung exhaustive, strictly increasing, no
    * duplicate when k is itself a power of two) are unit-pinnable
    * without forking a JVM per `SPARK_GRAFT_CENTROIDS` value.
    */
  private[graft] def probeLadder(k: Int): Seq[Int] =
    (Iterator.iterate(1)(_ * 2).takeWhile(_ < k) ++ Iterator(k)).toSeq

  /** The sweep tail shared by [[annNprobeSweep]] and
    * [[annShortlistSweep]] (r16 review — the brute/arms/hits/recall
    * chain was duplicated verbatim with only the knob column renamed,
    * so a denominator or tie-break fix had four edit sites): from a
    * scored lattice (persisted here, lazily) `(query_id, cand_id, <rankCol>,
    * score)`, derive the brute-force top-[[TopK]] truth over the FULL
    * lattice, cut one arm per knob value by `rankCol <= knob`, and emit
    * `(knob, candidates, hits, recall)` with recall = hits /
    * (NumQueries·TopK) on the shared round6.
    */
  private def sweepTail(s: SparkSession, lat0: DataFrame, rankCol: String,
      knobCol: String, knobValues: Seq[Int]): DataFrame = {
    import s.implicits._
    // LAZY persist, not an eager localCheckpoint (r18; r17 verdict #3):
    // the lattice feeds THREE subtrees (brute truth, arm hits, arm
    // candidate counts), so it must be shared — but the r16 eager
    // checkpoint ran the whole scoring job at query CONSTRUCTION, which
    // the bench pays again on every rep (measured ~0.5 s per
    // construction on both sweep keys). persist() defers the one
    // materialization into the query's own execution and the cache
    // serves the other two subtrees; Bench.quiesce / callers' cache
    // clears release the blocks as before.
    val lat = lat0.persist()
    val bw = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("cand_id"))
    val brute = lat.withColumn("brnk", row_number().over(bw))
      .filter(col("brnk") <= TopK)
      .select(col("query_id"), col("cand_id"))
    val arms = lat
      .crossJoin(broadcast(knobValues.toDF(knobCol)))
      .filter(col(rankCol) <= col(knobCol))
    val aw = Window.partitionBy(knobCol, "query_id")
      .orderBy(col("score").desc, col("cand_id"))
    val hits = arms.withColumn("rnk", row_number().over(aw))
      .filter(col("rnk") <= TopK)
      .join(brute, Seq("query_id", "cand_id"))
      .groupBy(knobCol).agg(count(lit(1)).as("hits"))
    arms.groupBy(knobCol).agg(count(lit(1)).as("candidates"))
      .join(hits, Seq(knobCol), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .select(col(knobCol), col("candidates"), col("hits"),
        Buckets.round6(expr(
          s"CAST(hits AS DOUBLE) / CAST(${NumQueries * TopK} AS DOUBLE)"))
          .as("recall"))
      .orderBy(knobCol)
  }

  /** `ann_nprobe_sweep`: the IVF operating-point evidence — recall@k
    * and candidates-scanned at every probe count in [[SweepNProbes]],
    * against the brute-force top-k ground truth. The tuning curve an
    * ANN deployment reads BEFORE committing `nprobe` (the X61
    * threshold-sweep pattern applied to the retrieval knob): fixture
    * shows the recall/cost knee so the default [[NProbe]] = 4 is a
    * measured choice, not folklore.
    *
    * Shape: ONE scored pass — every (query, candidate) pair exists in
    * exactly one cluster, so tagging each pair with the PRN of the
    * candidate's cluster for that query lets all sweep arms share it:
    * arm `np` is just `prn <= np` + the per-(np, query) top-k window,
    * and brute force is the same frame un-filtered (prn ≤ k covers the
    * whole corpus). Hits and candidate counts are integers; the only
    * division is one `hits / (|Q|·k)` recall per arm on the pinned
    * round6 — cross-engine exact because the underlying scores are the
    * ANN keys' already-hash-matched cosines.
    *
    * At 100 TB the scored pass IS the expensive arm (it is deliberately
    * the brute-force audit, run on a sample); production serving keeps
    * the prn ≤ nprobe filter INSIDE the probe join as the ANN keys do,
    * never materializing the full lattice.
    */
  def annNprobeSweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (cents, assigned) = annIndexShared(s, dir, trained = false)
    val q = probeLattice(
      assigned.select(col("vec_id"), col("embedding"), col("cn"))
        .filter(col("vec_id") < NumQueries),
      cents, maxProbe = None)
    // shared across sweepTail's three subtrees via its lazy persist
    // (was an eager construct-time localCheckpoint — r18, verdict #3)
    val scored = assigned.join(broadcast(q),
        col("cent_id") === col("qcent") && col("query_id") =!= col("vec_id"))
      .withColumn("score",
        dot_f(col("qe"), col("embedding")) / (col("qn") * col("cn")))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        col("score"), col("prn"))
    sweepTail(s, scored, "prn", "nprobe", SweepNProbes)
  }

  /** Oracle: the IVF seed-codebook CTEs with the probe rank CARRIED
    * (not filtered), the same one scored lattice, and the sweep arms as
    * a VALUES cross join — window/tie-break text identical to the
    * engine's.
    */
  val annNprobeSweepSql: String =
    s"""WITH cents AS (
       |  SELECT vec_id AS cent_id, embedding AS ce
       |  FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $NumCentroids),
       |assign AS (
       |  SELECT vec_id, cent_id FROM (
       |    SELECT e.vec_id, c.cent_id,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosineSql("e.embedding", "c.ce")} DESC, c.cent_id) AS arn
       |    FROM embeddings e, cents c)
       |  WHERE arn = 1),
       |q AS (
       |  SELECT e.vec_id AS query_id, e.embedding AS qe, c.cent_id AS qcent,
       |         row_number() OVER (PARTITION BY e.vec_id
       |           ORDER BY ${cosineSql("e.embedding", "c.ce")} DESC, c.cent_id) AS prn
       |  FROM embeddings e, cents c
       |  WHERE e.vec_id < $NumQueries),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS cand_id,
       |         ${cosineSql("q.qe", "e.embedding")} AS score, q.prn
       |  FROM q
       |  JOIN assign a ON a.cent_id = q.qcent
       |  JOIN embeddings e ON e.vec_id = a.vec_id
       |  WHERE e.vec_id <> q.query_id),
       |brute AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT query_id, cand_id,
       |           row_number() OVER (PARTITION BY query_id
       |             ORDER BY score DESC, cand_id) AS brnk
       |    FROM scored)
       |  WHERE brnk <= $TopK),
       |arms AS (
       |  SELECT s.*, np.nprobe
       |  FROM scored s
       |  CROSS JOIN (VALUES ${SweepNProbes.map(n => s"($n)").mkString(", ")})
       |    AS np(nprobe)
       |  WHERE s.prn <= np.nprobe),
       |hits AS (
       |  SELECT nprobe, count(*) AS hits FROM (
       |    SELECT a.nprobe, a.query_id, a.cand_id,
       |           row_number() OVER (PARTITION BY a.nprobe, a.query_id
       |             ORDER BY a.score DESC, a.cand_id) AS rnk
       |    FROM arms a)
       |  JOIN brute b USING (query_id, cand_id)
       |  WHERE rnk <= $TopK
       |  GROUP BY nprobe),
       |cand AS (SELECT nprobe, count(*) AS candidates FROM arms GROUP BY nprobe)
       |SELECT c.nprobe, c.candidates, coalesce(h.hits, 0) AS hits,
       |       ${Buckets.round6Sql(
                 s"CAST(coalesce(h.hits, 0) AS DOUBLE) / " +
                   s"CAST(${NumQueries * TopK} AS DOUBLE)")} AS recall
       |FROM cand c LEFT JOIN hits h USING (nprobe)
       |ORDER BY c.nprobe""".stripMargin

  val similarityAnnIvfSql: String =
    s"""WITH cents AS (
       |  SELECT vec_id AS cent_id, embedding AS ce
       |  FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $NumCentroids),
       |assign AS (
       |  SELECT vec_id, cent_id FROM (
       |    SELECT e.vec_id, c.cent_id,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosineSql("e.embedding", "c.ce")} DESC, c.cent_id) AS arn
       |    FROM embeddings e, cents c)
       |  WHERE arn = 1),
       |q AS (
       |  SELECT query_id, qe, qcent FROM (
       |    SELECT e.vec_id AS query_id, e.embedding AS qe, c.cent_id AS qcent,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosineSql("e.embedding", "c.ce")} DESC, c.cent_id) AS prn
       |    FROM embeddings e, cents c
       |    WHERE e.vec_id < $NumQueries)
       |  WHERE prn <= $NProbe),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS cand_id,
       |         ${cosineSql("q.qe", "e.embedding")} AS score
       |  FROM q
       |  JOIN assign a ON a.cent_id = q.qcent
       |  JOIN embeddings e ON e.vec_id = a.vec_id
       |  WHERE e.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, cand_id, round(score, 6) AS score,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY score DESC, cand_id) AS rnk
       |  FROM scored)
       |SELECT query_id, cand_id, score, rnk FROM ranked
       |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin

  /** `multimodal_join` (X4): documents ⋈ embeddings — one frame carrying
    * text metadata plus the vector column and derived vector stats.
    * doc_id = vec_id is a 1:1 key join; at scale both sides bucket by id
    * (broadcast is wrong here — both sides are big), and the array column
    * rides along as first-class Parquet data.
    */
  def multimodalJoin(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(s"$dir/documents.parquet")
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    d.join(e, d("doc_id") === e("vec_id"))
      .select(d("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("label"), size(col("embedding")).as("dim"),
        round(normExpr("embedding"), 6).as("norm"))
      .orderBy("doc_id")
  }

  val multimodalJoinSql: String =
    s"""SELECT d.doc_id, d.lang, d.source, d.n_chars, e.label,
       |       len(e.embedding) AS dim,
       |       round(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])), 6) AS norm
       |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
       |ORDER BY d.doc_id""".stripMargin

  /** Bucket count for the co-located layout. At 100 TB this is sized to
    * executor memory (thousands); the PROPERTY under test — the scan's
    * bucketing satisfies the join's distribution requirement, so no
    * Exchange appears — is bucket-count-invariant.
    */
  val JoinBuckets = 8

  /** One-time bucketed layout of both join sides, catalog-registered so
    * the read-back carries the bucket spec (plain parquet loses it).
    * The PATHS ride [[Dedup.sharedIndexPath]] — same freshness digest
    * (a regenerated corpus gets a NEW table, never stale rows), same
    * pid tag (two JVMs on one dir cannot overwrite-vs-read race one
    * path), same shutdown-hook cleanup (no orphaned /tmp trees) — and
    * the catalog table NAME carries the identical (digest, pid) key,
    * so name resolution and file freshness can never disagree.
    */
  private def bucketedTables(s: SparkSession, dir: String): (String, String) = {
    def ensure(kind: String, src: String, key: String): String = {
      val table =
        s"graft_bkt_${kind}_${Dedup.freshDigest(s, dir, src)}_p${Dedup.jvmTag}"
      Dedup.sharedIndexPath(s, dir, src, s"bkt_$kind") { p =>
        s.read.parquet(s"$dir/$src").write
          .bucketBy(JoinBuckets, key).sortBy(key)
          .option("path", p).mode("overwrite")
          .format("parquet").saveAsTable(table)
      }
      table
    }
    (ensure("docs", "documents.parquet", "doc_id"),
      ensure("embs", "embeddings.parquet", "vec_id"))
  }

  /** `multimodal_join_bucketed` (X65): the SAME 1:1 join as
    * [[multimodalJoin]], served SHUFFLE-FREE from a bucketed layout —
    * both sides written once with `bucketBy(k, id).sortBy(id)`, so the
    * scans' bucketing satisfies the sort-merge join's distribution
    * requirement and NO `Exchange hashpartitioning` appears on either
    * side (PlanSpec pins it; the `merge` hint keeps AQE's broadcast
    * conversion from masking the property at test scale). This is the
    * driver brief's bucketing bullet made concrete: at 100 TB both
    * sides are too big to broadcast, and the clustered write replaces
    * the per-query shuffle of BOTH tables. Shares [[multimodalJoinSql]]
    * as its oracle — the layout must not change a single row.
    */
  def multimodalJoinBucketed(s: SparkSession, dir: String): DataFrame = {
    val (dn, en) = bucketedTables(s, dir)
    val d = s.table(dn)
    val e = s.table(en)
    d.hint("merge").join(e, d("doc_id") === e("vec_id"))
      .select(d("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("label"), size(col("embedding")).as("dim"),
        round(normExpr("embedding"), 6).as("norm"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------- product quantization

  /** PQ geometry: [[PqM]] subspaces of [[PqSubDim]] dims each (64 = 4×16),
    * [[PqK]] codewords per subspace → a vector compresses to 4 one-byte
    * codes + one stored norm (~12 B vs 256 B raw, 21×). One Lloyd
    * iteration refines the md5-seeded codebook ([[PqIters]]); queries
    * shortlist [[PqShortlist]] candidates by ADC before the exact re-rank.
    */
  val PqM = 4
  val PqSubDim = 16
  val PqK = 16
  val PqIters = 2
  val PqShortlist = 50

  /** Per-subspace views of a float vector column: one row per (id, m,
    * 16-dim float slice). `slice` is a codegen'd collection expression;
    * the four slices explode from one array literal, so subvectors
    * materialize in the scan's own stage.
    */
  private def pqSubs(e: DataFrame, idCol: String, vecCol: String): DataFrame =
    e.select(col(idCol),
      posexplode(array((0 until PqM).map(m =>
        slice(col(vecCol), m * PqSubDim + 1, PqSubDim)): _*)).as(Seq("m", "sub")))

  /** Nearest codeword per (vector, subspace). L2 argmin dropping the
    * codeword-independent ‖x_m‖² term: d2 = ‖c‖² − 2·x_m·c (same ordering,
    * one dot product per pair). `min_by` over the lexicographic
    * (d2, k) struct ties to the smaller codeword id — a plain hash
    * aggregation over the broadcast codebook, O(n·K) with no window.
    */
  private def pqAssign(subs: DataFrame, cb: DataFrame): DataFrame =
    subs.join(broadcast(cb), "m")
      .withColumn("d2", col("cwn2") - lit(2.0) * dot_f(col("sub"), col("cw")))
      .groupBy("vec_id", "m")
      .agg(min_by(col("k"), struct(col("d2"), col("k"))).as("code"))

  /** Builds — or reuses — the on-disk PQ index: `<root>/codebook` is
    * `(m, k, cw float[16])`, `<root>/codes` the encoded corpus
    * `(vec_id, codes int[4], cn double)` — the PQ memory layout that
    * makes 100 TB of embeddings ANN-servable from RAM: the candidate
    * scoring pass reads ~12 B/vector (codes + norm), never the vectors.
    *
    * Training mirrors [[annIndexShared]]'s discipline per subspace:
    * deterministic md5-sample seeds (codeword k = rank in the md5
    * order), [[PqIters]] Lloyd pass(es) whose per-dimension means round
    * to 6 decimals and cast to float32 in both engines (bit-identical
    * codebooks despite summation-order ulps), broadcast-only joins. An
    * emptied codeword drops out of the means — identically in the
    * oracle — so ids need no re-packing.
    */
  private def pqIndexShared(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val root = Dedup.sharedIndexPath(s, dir, "embeddings.parquet", "pq") { p =>
      val e = emb(s, dir)
      val subs = pqSubs(e, "vec_id", "embedding")
      val seedW = Window.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      val seeds = e.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        .limit(PqK)
        .withColumn("k", row_number().over(seedW) - 1)
      var cb = pqSubs(seeds.withColumnRenamed("vec_id", "seed_id")
          .withColumnRenamed("k", "vec_id"), "vec_id", "embedding")
        .select(col("m"), col("vec_id").as("k"), col("sub").as("cw"))
        .withColumn("cwn2", dot_f(col("cw"), col("cw")))
      for (_ <- 1 to PqIters) {
        val a = pqAssign(subs, cb)
        cb = subs.join(a, Seq("vec_id", "m"))
          .select(col("m"), col("code").as("k"),
            posexplode(col("sub")).as(Seq("pos", "v")))
          .groupBy("m", "k", "pos")
          .agg(round(sum(col("v").cast("double")) / count(lit(1)), 6).as("cv"))
          .groupBy("m", "k")
          .agg(expr("transform(array_sort(collect_list(struct(pos, cv)))," +
            " x -> CAST(x.cv AS FLOAT))").as("cw"))
          .withColumn("cwn2", dot_f(col("cw"), col("cw")))
          .localCheckpoint(true)
      }
      cb.select("m", "k", "cw").write.mode("overwrite").parquet(s"$p/codebook")
      val cbR = s.read.parquet(s"$p/codebook")
        .withColumn("cwn2", dot_f(col("cw"), col("cw")))
      pqAssign(subs, cbR)
        .groupBy("vec_id")
        .agg(expr("transform(array_sort(collect_list(struct(m, code)))," +
          " x -> x.code)").as("codes"))
        .join(e.withColumn("cn", normExpr("embedding"))
          .select(col("vec_id"), col("cn")), "vec_id")
        .write.mode("overwrite").parquet(s"$p/codes")
    }
    (s.read.parquet(s"$root/codebook"), s.read.parquet(s"$root/codes"))
  }

  /** `similarity_ann_pq`: product-quantization ANN — ADC shortlist over
    * the persisted codes, exact cosine re-rank of the shortlist. Per
    * query: one 16-dim dot per (subspace, codeword) builds the 64-entry
    * lookup table; every candidate then scores as FOUR table lookups
    * summed in fixed subspace order (`p0+p1+p2+p3` — explicit
    * association, so the oracle's sum matches bit-for-bit), normalized
    * by the STORED norms into an approximate cosine. The top
    * [[PqShortlist]] by (approx desc, id) fetch their real vectors for
    * the exact re-rank; output shape matches the other ANN keys.
    *
    * At 100 TB: the shortlist pass touches codes + norms only (~12
    * B/vector, broadcast 640-row LUT, map-side top-k); the vector table
    * is read for shortlist·|Q| rows, not n. Recall is gated against
    * brute force in AnnRecallSpec alongside IVF.
    */
  def similarityAnnPq(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).withColumn("cn", normExpr("embedding"))
    val short = pqAdcRanked(s, dir).filter(col("srn") <= PqShortlist)
    val rer = short.join(e.select(col("vec_id"), col("embedding"), col("cn").as("ecn")), "vec_id")
      .withColumn("score", dot_f(col("qe"), col("embedding")) / (col("qn") * col("ecn")))
    val rw = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    rer.withColumn("rnk", row_number().over(rw))
      .filter(col("rnk") <= TopK)
      .select(col("query_id"), col("vec_id").as("cand_id"),
        round(col("score"), 6).as("score"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** The ADC-ranked (query, candidate) lattice shared by
    * [[similarityAnnPq]] (which cuts it at [[PqShortlist]]) and
    * [[annShortlistSweep]] (which carries `srn` into every arm): per
    * pair, the four-lookup fixed-association ADC approximation ranked
    * per query, plus the columns the exact re-rank needs.
    */
  private def pqAdcRanked(s: SparkSession, dir: String): DataFrame = {
    val (cb, codes) = pqIndexShared(s, dir)
    val e = emb(s, dir).withColumn("cn", normExpr("embedding"))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("cn").as("qn"))
    val qlut = pqSubs(q.withColumnRenamed("query_id", "vec_id"), "vec_id", "qe")
      .join(broadcast(cb), "m")
      .select(col("vec_id").as("query_id"), col("m").as("qm"), col("k"),
        dot_f(col("sub"), col("cw")).as("pd"))
    val contrib = codes
      .select(col("vec_id"), col("cn"), posexplode(col("codes")).as(Seq("m", "code")))
      .join(broadcast(qlut), col("m") === col("qm") && col("code") === col("k"))
      .drop("qm", "k")
    // the per-subspace pivot + fixed-order re-add pins the float
    // addition order across engines; columns DERIVE from PqM (a knob
    // change used to silently truncate the score to the first four
    // subspaces in BOTH engines — hash-green, recall quietly sagging;
    // r16 review)
    val pCols = (0 until PqM)
      .map(m => sum(when(col("m") === m, col("pd"))).as(s"p$m"))
    val adc = contrib.groupBy("query_id", "vec_id", "cn")
      .agg(pCols.head, pCols.tail: _*)
    val sw = Window.partitionBy("query_id").orderBy(col("approx").desc, col("vec_id"))
    adc.filter(col("query_id") =!= col("vec_id"))
      .join(broadcast(q.select(col("query_id"), col("qn"), col("qe"))), "query_id")
      .withColumn("approx",
        (0 until PqM).map(m => col(s"p$m")).reduce(_ + _) /
          (col("qn") * col("cn")))
      .withColumn("srn", row_number().over(sw))
  }

  /** Shortlist sizes swept by [[annShortlistSweep]] — up to 2× the
    * production [[PqShortlist]] so the curve shows both sides of the
    * committed operating point.
    */
  val SweepShortlists: Seq[Int] = Seq(5, 10, 25, 50, 100)

  /** `ann_shortlist_sweep`: the PQ tuning curve — recall@k vs the exact
    * top-k at every ADC shortlist size in [[SweepShortlists]] — the
    * [[annNprobeSweep]] pattern applied to the OTHER retrieval knob (how
    * many ADC-approximate candidates get the exact re-rank). One
    * exact-scored lattice tagged with each pair's ADC rank serves every
    * arm (`srn ≤ S` + the per-(S, query) re-rank window) AND the brute
    * truth (the same lattice unfiltered); lazily persisted for its
    * three consumers inside [[sweepTail]]. Integers throughout; one round6 recall per arm.
    * At 100 TB the lattice pass is the deliberate brute-force audit run
    * on a sample — production serving keeps the shortlist cut inside
    * the window as [[similarityAnnPq]] does.
    */
  def annShortlistSweep(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).withColumn("cn", normExpr("embedding"))
    val lat = pqAdcRanked(s, dir)
      .join(e.select(col("vec_id"), col("embedding"), col("cn").as("ecn")), "vec_id")
      .withColumn("score", dot_f(col("qe"), col("embedding")) / (col("qn") * col("ecn")))
      .select(col("query_id"), col("vec_id").as("cand_id"), col("srn"),
        col("score"))
    sweepTail(s, lat, "srn", "shortlist", SweepShortlists)
  }

  /** The PQ train→encode→ADC-rank CTE chain shared by
    * [[similarityAnnPqSql]] and [[annShortlistSweepSql]] — same seed
    * order, same dropped-‖x‖² L2 argmin, same round-6/float32 codebook
    * cast, same fixed-association ADC sum; the final `ranked` CTE
    * carries the shortlist rank `srn` UN-filtered so each consumer cuts
    * it where its own key does.
    */
  private val pqRankedCtes: String = {
    val ms = (0 until PqM).mkString(", ")
    def sliceSql(v: String): String =
      s"list_slice($v, t.m * $PqSubDim + 1, t.m * $PqSubDim + $PqSubDim)"
    def d2Sql(sub: String, cw: String): String =
      s"(list_dot_product($cw::DOUBLE[], $cw::DOUBLE[]) - " +
        s"CAST(2.0 AS DOUBLE) * list_dot_product($sub::DOUBLE[], $cw::DOUBLE[]))"
    def assignCte(name: String, cb: String): String =
      s"""$name AS (
         |  SELECT vec_id, m, k AS code FROM (
         |    SELECT s.vec_id, s.m, c.k,
         |           row_number() OVER (PARTITION BY s.vec_id, s.m
         |             ORDER BY ${d2Sql("s.sub", "c.cw")}, c.k) AS rn
         |    FROM subs s JOIN $cb c ON c.m = s.m)
         |  WHERE rn = 1)""".stripMargin
    def meansCte(name: String, assign: String): String =
      s"""$name AS (
         |  SELECT m, k, list(cv ORDER BY pos)::FLOAT[] AS cw FROM (
         |    SELECT s.m, a.code AS k, x.pos,
         |           round(sum(CAST(x.v AS DOUBLE)) / count(*), 6) AS cv
         |    FROM subs s
         |    JOIN $assign a ON a.vec_id = s.vec_id AND a.m = s.m,
         |    LATERAL (SELECT generate_subscripts(s.sub, 1) AS pos,
         |                    unnest(s.sub) AS v) x
         |    GROUP BY s.m, a.code, x.pos)
         |  GROUP BY m, k)""".stripMargin
    val train = (1 to PqIters).map { t =>
      assignCte(s"assign$t", s"cb${t - 1}") + ",\n" +
        meansCte(s"cb$t", s"assign$t")
    }.mkString(",\n")
    val cbF = s"cb$PqIters"
    s"""seeds AS (
       |  SELECT vec_id, embedding,
       |         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS k
       |  FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $PqK),
       |subs AS (
       |  SELECT vec_id, t.m, ${sliceSql("embedding")} AS sub
       |  FROM embeddings, unnest([$ms]) AS t(m)),
       |cb0 AS (
       |  SELECT t.m, k, ${sliceSql("embedding")} AS cw
       |  FROM seeds, unnest([$ms]) AS t(m)),
       |$train,
       |${assignCte("codes", cbF)},
       |nrm AS (
       |  SELECT vec_id,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS cn
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id AS query_id, embedding AS qe,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qn
       |  FROM embeddings WHERE vec_id < $NumQueries),
       |qsubs AS (
       |  SELECT q.query_id, t.m, ${sliceSql("q.qe")} AS sub
       |  FROM q, unnest([$ms]) AS t(m)),
       |qlut AS (
       |  SELECT s.query_id, c.m, c.k,
       |         list_dot_product(s.sub::DOUBLE[], c.cw::DOUBLE[]) AS pd
       |  FROM qsubs s JOIN $cbF c ON c.m = s.m),
       |adc AS (
       |  SELECT l.query_id, co.vec_id,
       |         ${(0 until PqM).map(m =>
                  s"sum(CASE WHEN co.m = $m THEN l.pd END) AS p$m")
                  .mkString(",\n         ")}
       |  FROM codes co JOIN qlut l ON l.m = co.m AND l.k = co.code
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT a.query_id, a.vec_id,
       |         row_number() OVER (PARTITION BY a.query_id
       |           ORDER BY (${(0 until PqM).map(m => s"a.p$m")
                  .mkString(" + ")}) / (q.qn * n.cn) DESC,
       |                    a.vec_id) AS srn
       |  FROM adc a
       |  JOIN q ON q.query_id = a.query_id
       |  JOIN nrm n ON n.vec_id = a.vec_id
       |  WHERE a.vec_id <> a.query_id)""".stripMargin
  }

  /** Oracle: the identical train→encode→ADC→re-rank unroll as CTEs —
    * same seed order, same dropped-‖x‖² L2 argmin, same round-6/float32
    * codebook cast, same fixed-association ADC sum.
    */
  val similarityAnnPqSql: String =
    s"""WITH $pqRankedCtes,
       |short AS (
       |  SELECT query_id, vec_id FROM ranked WHERE srn <= $PqShortlist),
       |rer AS (
       |  SELECT s.query_id, s.vec_id AS cand_id,
       |         round(${cosineSql("q.qe", "e.embedding")}, 6) AS score,
       |         row_number() OVER (PARTITION BY s.query_id
       |           ORDER BY ${cosineSql("q.qe", "e.embedding")} DESC, s.vec_id) AS rnk
       |  FROM short s
       |  JOIN q ON q.query_id = s.query_id
       |  JOIN embeddings e ON e.vec_id = s.vec_id)
       |SELECT query_id, cand_id, score, rnk FROM rer
       |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin

  /** Oracle for the shortlist sweep: the shared PQ chain with `srn`
    * carried, the exact-scored lattice, arms as a VALUES cross join —
    * window/tie-break text identical to the engine's.
    */
  val annShortlistSweepSql: String =
    s"""WITH $pqRankedCtes,
       |lat AS (
       |  SELECT r.query_id, r.vec_id AS cand_id, r.srn,
       |         ${cosineSql("q.qe", "e.embedding")} AS score
       |  FROM ranked r
       |  JOIN q ON q.query_id = r.query_id
       |  JOIN embeddings e ON e.vec_id = r.vec_id),
       |brute AS (
       |  SELECT query_id, cand_id FROM (
       |    SELECT query_id, cand_id,
       |           row_number() OVER (PARTITION BY query_id
       |             ORDER BY score DESC, cand_id) AS brnk
       |    FROM lat)
       |  WHERE brnk <= $TopK),
       |arms AS (
       |  SELECT l.*, sl.shortlist
       |  FROM lat l
       |  CROSS JOIN (VALUES ${SweepShortlists.map(n => s"($n)").mkString(", ")})
       |    AS sl(shortlist)
       |  WHERE l.srn <= sl.shortlist),
       |hits AS (
       |  SELECT shortlist, count(*) AS hits FROM (
       |    SELECT a.shortlist, a.query_id, a.cand_id,
       |           row_number() OVER (PARTITION BY a.shortlist, a.query_id
       |             ORDER BY a.score DESC, a.cand_id) AS rnk
       |    FROM arms a)
       |  JOIN brute b USING (query_id, cand_id)
       |  WHERE rnk <= $TopK
       |  GROUP BY shortlist),
       |cand AS (SELECT shortlist, count(*) AS candidates FROM arms GROUP BY shortlist)
       |SELECT c.shortlist, c.candidates, coalesce(h.hits, 0) AS hits,
       |       ${Buckets.round6Sql(
                 s"CAST(coalesce(h.hits, 0) AS DOUBLE) / " +
                   s"CAST(${NumQueries * TopK} AS DOUBLE)")} AS recall
       |FROM cand c LEFT JOIN hits h USING (shortlist)
       |ORDER BY c.shortlist""".stripMargin

  // --------------------------------------------------- int8 quantization

  /** `embed_quantize`: symmetric per-vector int8 scalar quantization —
    * scale = max|v|/127, q_i = round(v_i/scale) — with its reconstruction
    * audit (mse, max abs error, reconstructed-vs-original cosine). The
    * 4× memory cut (plus exactly-representable dequantization) is the
    * standard first rung before PQ for serving embeddings at scale.
    *
    * Relational shape: one posexplode, two doc-keyed hash aggregations
    * with map-side combine — no per-element lambda HOFs, no window. The
    * all-zero vector edge (scale = 0) reconstructs as zeros via the
    * guarded division IN BOTH ENGINES.
    */
  def embedQuantize(s: SparkSession, dir: String): DataFrame = {
    val ex = emb(s, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("v", col("v").cast("double"))
    val scales = ex.groupBy("vec_id")
      .agg((max(abs(col("v"))) / 127.0).as("scale"))
    val rec = ex.join(scales, "vec_id")
      .withColumn("qv",
        when(col("scale") === 0.0, lit(0.0))
          .otherwise(round(col("v") / col("scale")) * col("scale")))
      .withColumn("err", col("v") - col("qv"))
    rec.groupBy("vec_id", "scale")
      .agg(round(sum(col("err") * col("err")) / count(lit(1)), 6).as("mse"),
        round(max(abs(col("err"))), 6).as("max_abs_err"),
        sum(col("v") * col("qv")).as("s_vq"),
        (sqrt(sum(col("v") * col("v"))) * sqrt(sum(col("qv") * col("qv"))))
          .as("s_den"))
      // the all-zero vector has a 0 denominator: NULL cosine by
      // explicit guard in BOTH engines (the oracle mirrors this CASE;
      // modern DuckDB is IEEE — 0/0 would be NaN there, and Spark ANSI
      // would throw — so neither side may divide unguarded)
      .select(col("vec_id"), round(col("scale"), 6).as("scale"),
        col("mse"), col("max_abs_err"),
        round(when(col("s_den") === 0.0, lit(null))
          .otherwise(col("s_vq") / col("s_den")), 6).as("cos_recon"))
      .orderBy("vec_id")
  }

  val embedQuantizeSql: String =
    s"""WITH ex AS (
       |  SELECT vec_id, x.pos, CAST(x.v AS DOUBLE) AS v
       |  FROM embeddings,
       |  LATERAL (SELECT generate_subscripts(embedding, 1) AS pos,
       |                  unnest(embedding) AS v) x),
       |scales AS (
       |  SELECT vec_id, max(abs(v)) / CAST(127.0 AS DOUBLE) AS scale FROM ex GROUP BY 1),
       |rec AS (
       |  SELECT e.vec_id, s.scale, e.v,
       |         CASE WHEN s.scale = 0.0 THEN 0.0
       |              ELSE round(e.v / s.scale) * s.scale END AS qv
       |  FROM ex e JOIN scales s ON s.vec_id = e.vec_id)
       |SELECT vec_id, round(scale, 6) AS scale,
       |       round(sum((v - qv) * (v - qv)) / count(*), 6) AS mse,
       |       round(max(abs(v - qv)), 6) AS max_abs_err,
       |       round(CASE WHEN sqrt(sum(v * v)) * sqrt(sum(qv * qv)) = 0.0
       |                  THEN NULL
       |                  ELSE sum(v * qv) /
       |                       (sqrt(sum(v * v)) * sqrt(sum(qv * qv))) END,
       |             6) AS cos_recon
       |FROM rec GROUP BY vec_id, scale ORDER BY vec_id""".stripMargin

  // -------------------------------------- X39 Johnson-Lindenstrauss audit

  /** JL projection geometry: 64 input dims → 16 output dims with a ±1
    * sign matrix (Achlioptas 2003, "Database-friendly random
    * projections": Rademacher entries preserve pairwise distances with
    * the same JL guarantee as Gaussians and cost one add per element).
    * Scaling by 1/√outDim makes the projected norm an unbiased estimate
    * of the original norm, so `distortion ≈ 1` IS the JL property under
    * audit.
    */
  val JlInDim = 64
  val JlOutDim = 16

  private def md5Hex(str: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(str.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The sign matrix, derived from md5 parity so BOTH engines can
    * reconstruct it independently: sign(i, j) = +1 iff the first hex
    * nibble of md5("jl|i|j") is odd. ±1 is exact in float, and every
    * product against a float embedding element is exact in double — the
    * projection arithmetic has NO rounding of its own, only the final
    * in-order summation.
    */
  val JlSigns: IndexedSeq[Array[Float]] = (0 until JlOutDim).map { j =>
    (0 until JlInDim).map { i =>
      if ("13579bdf".contains(md5Hex(s"jl|$i|$j").charAt(0))) 1.0f else -1.0f
    }.toArray
  }

  /** The 1/√outDim scaling divisor, DERIVED from [[JlOutDim]] (a
    * hardcoded `4.0` would silently break the unbiased-norm property on
    * a dimension change while both engines kept agreeing). The shortest
    * `Double.toString` round-trips to the identical double in DuckDB's
    * literal parser, so interpolating it into the oracle is exact.
    */
  val JlScale: Double = math.sqrt(JlOutDim.toDouble)

  /** `embed_project`: JL signed random projection 64 → 16 dims plus its
    * distortion audit — per vector the first two projected components,
    * the original and projected L2 norms, and their ratio (≈1 by the JL
    * lemma; the zero vector reports NULL). The dimensionality-reduction
    * rung below int8/PQ: 4× fewer floats per vector while approximately
    * preserving distances, i.e. the cheap first pass for clustering or
    * coarse ANN over 100 TB of embeddings.
    *
    * Scale shape: the matrix is 16 LITERAL 64-float rows baked into the
    * plan (a constant, not data), each output dim one codegen'd
    * [[graft.functions.DotProductF]] — a pure map-side pass, zero
    * shuffle, no groupBy anywhere. The norm accumulates as a fixed
    * left-associated chain p0²+p1²+…, the same left fold the oracle's
    * `list_reduce(… ORDER BY j)` performs, so the audit is bit-stable.
    * The oracle re-derives the matrix from the md5 rule in SQL — a hash
    * mismatch would catch a drifted matrix, not just drifted arithmetic.
    */
  def embedProject(s: SparkSession, dir: String): DataFrame = {
    val base = emb(s, dir).withColumn("no_", normExpr("embedding"))
    val withP = (0 until JlOutDim).foldLeft(base) { (df, j) =>
      df.withColumn(s"p$j",
        dot_f(col("embedding"), typedlit(JlSigns(j))) / lit(JlScale))
    }
    val nproj2 = (0 until JlOutDim)
      .map(j => col(s"p$j") * col(s"p$j")).reduceLeft(_ + _)
    withP.withColumn("np_", sqrt(nproj2))
      .select(col("vec_id"),
        round(col("p0"), 6).as("p0"), round(col("p1"), 6).as("p1"),
        round(col("no_"), 6).as("norm_orig"),
        round(col("np_"), 6).as("norm_proj"),
        round(when(col("no_") === 0.0, lit(null))
          .otherwise(col("np_") / col("no_")), 6).as("distortion"))
      .orderBy("vec_id")
  }

  val embedProjectSql: String =
    s"""WITH m AS (
       |  SELECT j, list(CASE WHEN strpos('13579bdf',
       |                   substr(md5('jl|' || i || '|' || j), 1, 1)) > 0
       |                 THEN CAST(1.0 AS DOUBLE) ELSE -CAST(1.0 AS DOUBLE) END ORDER BY i) AS srow
       |  FROM generate_series(0, ${JlOutDim - 1}) AS gj(j),
       |       generate_series(0, ${JlInDim - 1}) AS gi(i)
       |  GROUP BY j),
       |pj AS (
       |  SELECT e.vec_id, m.j,
       |         list_dot_product(e.embedding::DOUBLE[], m.srow) / CAST($JlScale AS DOUBLE)
       |           AS p
       |  FROM embeddings e CROSS JOIN m),
       |agg AS (
       |  SELECT vec_id,
       |         max(CASE WHEN j = 0 THEN p END) AS p0,
       |         max(CASE WHEN j = 1 THEN p END) AS p1,
       |         sqrt(list_reduce(list(p * p ORDER BY j), (a, b) -> a + b))
       |           AS np_
       |  FROM pj GROUP BY 1),
       |base AS (
       |  SELECT vec_id, sqrt(list_dot_product(embedding::DOUBLE[],
       |           embedding::DOUBLE[])) AS no_
       |  FROM embeddings)
       |SELECT vec_id, round(p0, 6) AS p0, round(p1, 6) AS p1,
       |       round(no_, 6) AS norm_orig, round(np_, 6) AS norm_proj,
       |       round(CASE WHEN no_ = 0.0 THEN NULL ELSE np_ / no_ END, 6)
       |         AS distortion
       |FROM agg JOIN base USING (vec_id) ORDER BY vec_id""".stripMargin

  // ------------------------------------------------ X40 kNN label audit

  /** kNN-classification parameters: 50 held-out queries, 10 neighbors. */
  val KnnQueries = 50
  val KnnK = 10

  private def embWithLabel(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label"))

  /** The ONE label-aware scored pass [[knnClassify]] and
    * [[mineNegatives]] share: anchors = the first `nQueries` vectors
    * (broadcast, with their label as `qlab`), candidates = everything
    * else, `score` = cosine via the codegen'd dot product. Factored so
    * a scoring tweak (zero-norm guard, candidate-source swap to the
    * ANN index) lands in both consumers — and in both oracles via
    * [[labeledScoredSqlCtes]] — at once.
    */
  private def labeledScoredPass(s: SparkSession, dir: String,
      nQueries: Int): DataFrame = {
    val e = embWithLabel(s, dir).withColumn("cn", normExpr("embedding"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("label").as("qlab"),
        col("embedding").as("qe"), col("cn").as("qn"))
    e.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .withColumn("score",
        dot_f(col("qe"), col("embedding")) / (col("qn") * col("cn")))
  }

  /** DuckDB twin of [[labeledScoredPass]] — `e`/`q`/`scored` CTEs
    * yielding `scored(query_id, qlab, cand_id, lab, score)`.
    */
  private def labeledScoredSqlCtes(nQueries: Int): String =
    s"""e AS (
       |  SELECT vec_id, embedding, label,
       |         sqrt(list_dot_product(embedding::DOUBLE[],
       |           embedding::DOUBLE[])) AS cn
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, label AS qlab, embedding AS qe,
       |             cn AS qn
       |      FROM e WHERE vec_id < $nQueries),
       |scored AS (
       |  SELECT q.query_id, q.qlab, e.vec_id AS cand_id, e.label AS lab,
       |         list_dot_product(q.qe::DOUBLE[], e.embedding::DOUBLE[]) /
       |           (q.qn * e.cn) AS score
       |  FROM q JOIN e ON e.vec_id <> q.query_id)""".stripMargin

  /** `knn_classify`: k-nearest-neighbor label prediction over the
    * embedding space — per query vector the majority label of its
    * [[KnnK]] nearest (cosine) neighbors, vote count, and whether it
    * matches the true label. This is the standard embedding-quality /
    * weak-supervision primitive of a curation pipeline: propagate labels
    * from a labeled seed set to unlabeled data (or audit an embedding
    * model by its leave-one-out kNN accuracy).
    *
    * Scale shape: identical to [[similarityTopk]] — the query/seed side
    * broadcasts, candidates stream through one scored pass, and the vote
    * is a (query, label) aggregate over k·|Q| rows. In production the
    * candidate generator swaps to the persisted IVF/PQ index
    * ([[similarityAnnKmeans]]/[[similarityAnnPq]]) with the vote stage
    * unchanged. Ties break deterministically: neighbor rank by (score
    * DESC, vec_id), vote rank by (votes DESC, label).
    *
    * Testdata caveat (same as [[TextAnalysis.textLangid]]'s): the
    * synthetic embeddings are label-independent noise, so leave-one-out
    * ACCURACY here sits at chance (~1/10) — the deterministic
    * rank/vote machinery is what the oracle checks and what transfers
    * to real embedding spaces.
    */
  def knnClassify(s: SparkSession, dir: String): DataFrame =
    knnVote(labeledScoredPass(s, dir, KnnQueries))

  /** The kNN vote — rank the scored candidates per query, majority
    * label over the top [[KnnK]], deterministic ties ((score DESC,
    * vec_id) then (votes DESC, label)). ONE implementation serves both
    * the brute-force oracle key and the ANN-shortlisted production key:
    * the candidate GENERATOR is the only thing that differs between
    * them, by construction.
    */
  private def knnVote(scored: DataFrame): DataFrame = {
    val wN = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id"))
    val votes = scored.withColumn("rnk", row_number().over(wN))
      .filter(col("rnk") <= KnnK)
      .groupBy(col("query_id"), col("qlab"), col("label").as("lab"))
      .agg(count(lit(1)).as("votes"))
    val wV = Window.partitionBy("query_id")
      .orderBy(col("votes").desc, col("lab"))
    votes.withColumn("vr", row_number().over(wV))
      .filter(col("vr") === 1)
      .select(col("query_id").as("vec_id"), col("qlab").as("label"),
        col("lab").as("pred_label"), col("votes"),
        when(col("lab") === col("qlab"), 1).otherwise(0).as("correct"))
      .orderBy("vec_id")
  }

  /** SQL twin of [[knnVote]] — the `nn`/`votes`/`best` chain over a
    * `scored(query_id, qlab, cand_id, lab, score)` CTE, shared verbatim
    * by both knn oracles.
    */
  private val knnVoteSqlTail: String =
    s"""nn AS (
       |  SELECT query_id, qlab, lab,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY score DESC, cand_id) AS rnk
       |  FROM scored),
       |votes AS (
       |  SELECT query_id, qlab, lab, count(*) AS votes
       |  FROM nn WHERE rnk <= $KnnK GROUP BY 1, 2, 3),
       |best AS (
       |  SELECT query_id, qlab, lab, votes,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY votes DESC, lab) AS vr
       |  FROM votes)
       |SELECT query_id AS vec_id, qlab AS label, lab AS pred_label, votes,
       |       CASE WHEN lab = qlab THEN 1 ELSE 0 END AS correct
       |FROM best WHERE vr = 1 ORDER BY vec_id""".stripMargin

  val knnClassifySql: String =
    s"""WITH ${labeledScoredSqlCtes(KnnQueries)},
       |$knnVoteSqlTail""".stripMargin

  /** `knn_classify_ann`: [[knnClassify]] on its PRODUCTION candidate
    * path — the scored pass reads the persisted trained IVF index
    * ([[annIndexShared]], the same codebook/assignment every other ANN
    * key serves from) and scores only the [[NProbe]]-probed clusters'
    * members; the vote stage is [[knnVote]], unchanged. At 100 TB the
    * brute-force pass scores |Q|·N pairs while this scores
    * |Q|·N·(probes/k) against an index built once — the swap the
    * brute-force key's scaladoc promises, delivered as its own
    * oracle-checked key (the oracle re-derives the identical codebook
    * via [[kmeansTrainedCtes]], so shortlist recall is part of the
    * pinned spec, not a fudge factor).
    */
  def knnClassifyAnn(s: SparkSession, dir: String): DataFrame = {
    val (cents, assigned) = annIndexShared(s, dir, trained = true)
    val al = assigned.join(
      embWithLabel(s, dir).select(col("vec_id"), col("label")), "vec_id")
    // drop the query's OWN cluster id before probing — the probe ranks
    // ALL centroids (and two cent_id columns would collide); the label
    // rides the lattice as a carry column
    val q = probeLattice(
      al.filter(col("vec_id") < KnnQueries)
        .select(col("vec_id"), col("label").as("qlab"),
          col("embedding"), col("cn")),
      cents, Some(NProbe))
    val scored = al.join(broadcast(q),
        col("cent_id") === col("qcent") && col("query_id") =!= col("vec_id"))
      .withColumn("score",
        dot_f(col("qe"), col("embedding")) / (col("qn") * col("cn")))
    knnVote(scored)
  }

  val knnClassifyAnnSql: String = {
    val cf = KMeansFinalCents
    s"""WITH $kmeansTrainedCtes,
       |el AS (
       |  SELECT vec_id, embedding, label,
       |         sqrt(list_dot_product(embedding::DOUBLE[],
       |           embedding::DOUBLE[])) AS cn
       |  FROM embeddings),
       |q AS (
       |  SELECT query_id, qlab, qe, qn, qcent FROM (
       |    SELECT e.vec_id AS query_id, e.label AS qlab, e.embedding AS qe,
       |           e.cn AS qn, c.cent_id AS qcent,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosineSql("e.embedding", "c.ce")} DESC,
       |               c.cent_id) AS prn
       |    FROM el e, $cf c
       |    WHERE e.vec_id < $KnnQueries)
       |  WHERE prn <= $NProbe),
       |scored AS (
       |  SELECT q.query_id, q.qlab, e.vec_id AS cand_id, e.label AS lab,
       |         list_dot_product(q.qe::DOUBLE[], e.embedding::DOUBLE[]) /
       |           (q.qn * e.cn) AS score
       |  FROM q
       |  JOIN assign_f a ON a.cent_id = q.qcent
       |  JOIN el e ON e.vec_id = a.vec_id
       |  WHERE e.vec_id <> q.query_id),
       |$knnVoteSqlTail""".stripMargin
  }

  // -------------------------------------- X41 hard-negative mining

  /** `mine_negatives`: triplet mining for contrastive embedding
    * training — per anchor (the [[NumQueries]] query vectors) the
    * hardest positive (most-similar same-label vector) and the
    * [[TopK]] hardest negatives (most-similar different-label vectors),
    * with the triplet margin `pos_score − neg_score` per negative. Small
    * or negative margins are exactly the informative triplets batch
    * construction wants (FaceNet-style semi-hard mining).
    *
    * Scale shape: one scored pass with the anchor side broadcast — the
    * same single-scan plan as [[similarityTopk]], with the label
    * predicate splitting the window into the positive and negative
    * streams. In production the candidate set comes from the persisted
    * ANN index; the mining windows then run over shortlist·|anchors|
    * rows, not the corpus.
    */
  def mineNegatives(s: SparkSession, dir: String): DataFrame = {
    val scored = labeledScoredPass(s, dir, NumQueries)
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id"))
    val pos = scored.filter(col("label") === col("qlab"))
      .withColumn("pr", row_number().over(w)).filter(col("pr") === 1)
      .select(col("query_id"), col("vec_id").as("pos_id"),
        col("score").as("ps_"))
    val neg = scored.filter(col("label") =!= col("qlab"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= TopK)
      .select(col("query_id"), col("vec_id").as("neg_id"),
        col("score").as("ns_"), col("rnk"))
    neg.join(pos, Seq("query_id"), "left")
      .select(col("query_id"), col("pos_id"),
        round(col("ps_"), 6).as("pos_score"),
        col("neg_id"), round(col("ns_"), 6).as("neg_score"),
        round(col("ps_") - col("ns_"), 6).as("margin"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  val mineNegativesSql: String =
    s"""WITH ${labeledScoredSqlCtes(NumQueries)},
       |pos AS (
       |  SELECT query_id, cand_id AS pos_id, score AS ps_
       |  FROM (SELECT query_id, cand_id, score,
       |               row_number() OVER (PARTITION BY query_id
       |                 ORDER BY score DESC, cand_id) AS pr
       |        FROM scored WHERE lab = qlab)
       |  WHERE pr = 1),
       |neg AS (
       |  SELECT query_id, cand_id AS neg_id, score AS ns_, rnk
       |  FROM (SELECT query_id, cand_id, score,
       |               row_number() OVER (PARTITION BY query_id
       |                 ORDER BY score DESC, cand_id) AS rnk
       |        FROM scored WHERE lab <> qlab)
       |  WHERE rnk <= $TopK)
       |SELECT n.query_id, p.pos_id, round(p.ps_, 6) AS pos_score,
       |       n.neg_id, round(n.ns_, 6) AS neg_score,
       |       round(p.ps_ - n.ns_, 6) AS margin, n.rnk
       |FROM neg n LEFT JOIN pos p ON p.query_id = n.query_id
       |ORDER BY n.query_id, n.rnk""".stripMargin

  // ------------------------------------------------ X51 hybrid rank fusion

  /** RRF smoothing constant — the value the original paper fixed and
    * every production implementation defaults to (Cormack, Clarke &
    * Buettcher, SIGIR 2009: k = 60).
    */
  val RrfK = 60

  /** Queries fused: the BM25 workload defines the query ids (0 until its
    * size) and the embedding side serves vec_id 0–9, so the fusable
    * intersection is exactly the BM25 id range under the corpus'
    * doc_id ≡ vec_id mapping. Derived, not hardcoded — growing the BM25
    * workload grows the fusion with it. LAZY (as is [[rankFusionSql]])
    * because object init can arrive here mid-TextAnalysis-init via the
    * TextAnalysis → Dedup → Similarity reference chain — an eager read
    * of a TextAnalysis val on that path sees null (JVM re-entrant class
    * init), which a spec touching TextAnalysis first exposed.
    */
  lazy val RrfQueries: Int = TextAnalysis.Bm25Queries.length

  /** `rank_fusion`: hybrid lexical+semantic retrieval via Reciprocal
    * Rank Fusion — the standard way production search combines a BM25
    * list with an embedding ANN list without score calibration (ranks
    * are comparable when raw scores are not). Per query: full-outer join
    * of the BM25 top-10 and cosine top-5 on doc id, fused score
    * `Σ 1/(k + rank)` over the lists containing the doc, re-ranked.
    *
    * Composes the two PERSISTED index paths end to end: the lexical arm
    * serves from the BM25 postings index (term predicate pushed), the
    * semantic arm is the brute-force oracle here and swaps to the
    * IVF/PQ index at scale with this fusion stage unchanged. The fusion
    * itself is a join over (queries × top-k) rows — thousands, never
    * corpus-sized — so at 100 TB its cost is noise; the arms' own scale
    * stories carry the key.
    */
  def rankFusion(s: SparkSession, dir: String): DataFrame = {
    val bm = TextAnalysis.bm25Search(s, dir)
      .filter(col("query_id") < RrfQueries)
      .select(col("query_id").cast("long").as("query_id"),
        col("doc_id").cast("long").as("doc_id"), col("rnk").as("lex_rnk"))
    val em = similarityTopk(s, dir)
      .filter(col("query_id") < RrfQueries)
      .select(col("query_id").cast("long").as("query_id"),
        col("cand_id").cast("long").as("doc_id"), col("rnk").as("sem_rnk"))
    // both 1/(k+r) terms and their sum are the identical IEEE expression
    // tree in the oracle (integer rank + double literal), so the fused
    // doubles are bit-equal and the (rrf DESC, doc_id) order total.
    // FULL OUTER spelled as UNION + per-pair aggregate (guide §2.4
    // "remove shuffles outright", §3.1; r17 verdict #5): Spark ≤4.1
    // cannot broadcast an equi full-outer join — the hint is ignored and
    // the two ≤|Q|·k-row arms pay a SortMergeJoin with one
    // exchange+sort EACH; a LEFT∪ANTI broadcast rewrite (tried first)
    // computes each arm TWICE. Instead: pad each arm with a null twin
    // column, union, and group by the pair — max() over (value, null)
    // is the value, and each arm contributes at most one row per
    // (query_id, doc_id) (row_number output, keys non-null), so the
    // aggregate rebuilds exactly the full outer's rows: both ranks on
    // matches, one rank + null otherwise. Each arm computes ONCE, the
    // join disappears, and the only new exchange is one ≤2|Q|·k-row
    // hash aggregate (oracle hash unchanged).
    val fused = bm
      .select(col("query_id"), col("doc_id"), col("lex_rnk"),
        lit(null).cast("int").as("sem_rnk"))
      .unionByName(em.select(col("query_id"), col("doc_id"),
        lit(null).cast("int").as("lex_rnk"), col("sem_rnk")))
      .groupBy("query_id", "doc_id")
      .agg(max(col("lex_rnk")).as("lex_rnk"),
        max(col("sem_rnk")).as("sem_rnk"))
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("lex_rnk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("sem_rnk")), lit(0.0)), 6))
    val w = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("fused_rnk", row_number().over(w))
      .select(col("query_id"), col("doc_id"), col("lex_rnk"), col("sem_rnk"),
        col("rrf"), col("fused_rnk"))
      .orderBy("query_id", "fused_rnk")
  }

  /** Oracle: the two arms' own oracle SQLs as derived tables (nested
    * WITH — DuckDB scopes them cleanly), fused with the identical RRF
    * arithmetic. Lazy — see [[RrfQueries]]'s init-order note.
    */
  lazy val rankFusionSql: String = {
    val one = "CAST(1.0 AS DOUBLE)"
    s"""WITH bm AS (SELECT * FROM (${TextAnalysis.bm25SearchSql})),
       |em AS (SELECT * FROM ($similarityTopkSql)),
       |f AS (
       |  SELECT CAST(coalesce(b.query_id, e.query_id) AS BIGINT) AS query_id,
       |         CAST(coalesce(b.doc_id, e.cand_id) AS BIGINT) AS doc_id,
       |         b.rnk AS lex_rnk, e.rnk AS sem_rnk
       |  FROM bm b FULL JOIN em e
       |    ON e.query_id = b.query_id AND e.cand_id = b.doc_id
       |  WHERE coalesce(b.query_id, e.query_id) < $RrfQueries),
       |r AS (
       |  SELECT query_id, doc_id, lex_rnk, sem_rnk,
       |         round(coalesce($one / ($RrfK + lex_rnk), CAST(0 AS DOUBLE)) +
       |               coalesce($one / ($RrfK + sem_rnk), CAST(0 AS DOUBLE)), 6)
       |           AS rrf
       |  FROM f)
       |SELECT query_id, doc_id, lex_rnk, sem_rnk, rrf,
       |       row_number() OVER (PARTITION BY query_id
       |                          ORDER BY rrf DESC, doc_id) AS fused_rnk
       |FROM r ORDER BY query_id, fused_rnk""".stripMargin
  }

  // ------------------------------------- X61 dedup threshold sensitivity

  /** Cosine thresholds swept by [[dedupThresholdSweep]] — spelled as
    * literal strings so both engines parse the identical doubles.
    */
  val SweepTaus: Seq[String] = Seq("0.3", "0.35", "0.4", "0.45", "0.5")

  /** `dedup_threshold_sweep`: how sensitive is semantic-dedup volume to
    * the cosine threshold — for each candidate τ, the number and
    * fraction of vectors [[dedupSemantic]] would prune. τ is THE knob
    * a dedup deployment argues about; this one-query sensitivity curve
    * (run before committing a threshold) shows whether the choice sits
    * on a plateau or a cliff.
    *
    * One pass over the SAME within-cluster pair scan the dedup key uses
    * (persisted index, cent_id equi-join — never all-pairs), reduced to
    * each vector's best earlier-neighbor cosine (`max` — order-exact),
    * then ALL thresholds evaluated as conditional sums over that
    * per-vector frame and unpivoted with `stack` — the sweep costs ONE
    * aggregate regardless of how many τ values it reports.
    */
  def dedupThresholdSweep(s: SparkSession, dir: String): DataFrame = {
    val (_, assigned) = annIndexShared(s, dir, trained = true)
    val best = semanticPairs(assigned)
      .groupBy("vec_id").agg(max(col("cos")).as("max_cos"))
    // dot-free column labels: a '.' in a name breaks stack's resolution
    def lbl(t: String): String = "d_" + t.replace(".", "_")
    val sums = SweepTaus.map { t =>
      sum(when(expr(s"max_cos >= CAST($t AS DOUBLE)"), 1L).otherwise(0L))
        .as(lbl(t))
    }
    val total = assigned.agg(count(lit(1)).as("n_vecs"))
    val stacked = SweepTaus.map { t =>
      s"CAST($t AS DOUBLE), ${lbl(t)}"
    }.mkString(", ")
    best.agg(sums.head, sums.tail: _*)
      .crossJoin(broadcast(total))
      .select(col("n_vecs"), expr(
        s"stack(${SweepTaus.size}, $stacked) AS (tau, n_dups)"))
      .select(col("tau"), col("n_vecs"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"))
      // empty-table guard: Spark's non-ANSI x/0 is NULL but DuckDB's
      // IEEE float division is NaN — make both emit NULL explicitly
      .withColumn("frac", when(col("n_vecs") === 0, lit(null))
        .otherwise(round(col("n_dups").cast("double") / col("n_vecs"), 6)))
      .orderBy("tau")
  }

  /** Oracle: the dedup key's pair CTEs without the τ filter, reduced to
    * per-vector best cosine, counted per threshold.
    */
  val dedupThresholdSweepSql: String = {
    val arms = SweepTaus.map { t =>
      s"""SELECT CAST($t AS DOUBLE) AS tau,
         |       CAST(coalesce(sum(CASE WHEN max_cos >= CAST($t AS DOUBLE)
         |                               THEN 1 ELSE 0 END), 0) AS BIGINT)
         |         AS n_dups
         |FROM best""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $kmeansTrainedCtes,
       |$semanticPairsCte,
       |best AS (SELECT vec_id, max(cos) AS max_cos FROM pr GROUP BY 1),
       |tot AS (SELECT count(*) AS n_vecs FROM embeddings)
       |SELECT tau, n_vecs, n_dups,
       |       CASE WHEN n_vecs = 0 THEN NULL
       |            ELSE round(CAST(n_dups AS DOUBLE) / n_vecs, 6) END AS frac
       |FROM ($arms) s, tot
       |ORDER BY tau""".stripMargin
  }

  // ---------------------------------------------- X53 isotropy audit

  /** `embed_isotropy`: corpus-level embedding-space health report —
    * vector count, mean norm, normalized-mean norm, and the EXACT mean
    * pairwise cosine (the anisotropy measure of Ethayarajh, EMNLP 2019:
    * values near 0 = directions spread; near 1 = embeddings collapse
    * into a cone and cosine retrieval/dedup thresholds stop meaning
    * anything — the audit you run before trusting [[SemDedupTau]]-style
    * constants on a new embedding model).
    *
    * The pairwise mean needs no pair scan: over unit vectors `u_i`,
    * `mean_{i≠j} cos(u_i,u_j) = (‖Σu‖² − n) / (n(n−1))` — so the whole
    * audit is two cheap linear passes (the exploded per-dimension sums
    * of normalized coordinates — a 64-row partial-aggregated shuffle —
    * and the scalar count/norm pass) plus scalar algebra. At 100 TB:
    * identical plan, 64 partial sums per partition on the wire, no
    * candidate generation anywhere. Unordered double sums are absorbed
    * by the output round-6 (the codebook rule).
    */
  def embedIsotropy(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).withColumn("cn", normExpr("embedding"))
    // zero-norm guard (the embedQuantize/embedProject rule, closed
    // r16): a zero vector has no direction, so it joins the corpus
    // counts but is EXCLUDED from the unit-vector statistics — without
    // the filter Spark NULL-skips its u = v/cn terms (non-ANSI x/0)
    // while DuckDB's 0.0/0.0 is NaN and poisons every per-pos sum,
    // desyncing the engines on exactly the edge the siblings support.
    // The cosine identity below therefore runs over n_unit, not n_vecs.
    val unit = e.filter(col("cn") =!= 0)
    val sums = unit
      .select(col("cn"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("pos").agg(sum(col("v") / col("cn")).as("sd"))
    val s2 = sums.agg(sum(col("sd") * col("sd")).as("s2"))
    val tot = e.agg(count(lit(1)).as("n_vecs"), sum(col("cn")).as("sumn"),
      count(when(col("cn") =!= 0, 1)).as("n_unit"))
    // degenerate-corpus guards (the dedupThresholdSweep rule): on 0/1
    // vectors Spark's non-ANSI x/0 yields NULL while DuckDB's IEEE
    // division yields NaN/Inf — pin both engines to NULL explicitly
    tot.crossJoin(s2)
      .select(col("n_vecs"),
        round(when(col("n_vecs") > 0, col("sumn") / col("n_vecs")), 6)
          .as("mean_norm"),
        round(when(col("n_unit") > 0, sqrt(col("s2")) / col("n_unit")), 6)
          .as("mu_norm"),
        round(when(col("n_unit") >= 2, (col("s2") - col("n_unit")) /
          (col("n_unit") * (col("n_unit") - 1))), 6).as("anisotropy"))
  }

  val embedIsotropySql: String =
    s"""WITH e AS (
       |  SELECT embedding,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
       |           AS cn
       |  FROM embeddings),
       |d AS (
       |  SELECT x.pos, x.v / e.cn AS u
       |  FROM e, LATERAL (SELECT generate_subscripts(e.embedding, 1) AS pos,
       |                          unnest(e.embedding) AS v) x
       |  WHERE e.cn <> 0),
       |sums AS (SELECT pos, sum(u) AS sd FROM d GROUP BY 1),
       |s2 AS (SELECT sum(sd * sd) AS s2 FROM sums),
       |tot AS (SELECT count(*) AS n_vecs, sum(cn) AS sumn,
       |               sum(CASE WHEN cn <> 0 THEN 1 ELSE 0 END) AS n_unit
       |        FROM e)
       |SELECT n_vecs,
       |       round(CASE WHEN n_vecs > 0 THEN sumn / n_vecs END, 6)
       |         AS mean_norm,
       |       round(CASE WHEN n_unit > 0 THEN sqrt(s2) / n_unit END, 6)
       |         AS mu_norm,
       |       round(CASE WHEN n_unit >= 2
       |             THEN (s2 - n_unit) / (n_unit * (n_unit - 1)) END, 6)
       |         AS anisotropy
       |FROM tot, s2""".stripMargin

  // -------------------------------------------- X49 cluster-quality audit

  /** `cluster_stats`: per-cluster quality report over the persisted
    * trained k-means index — size, corpus fraction, mean and worst
    * cosine-to-centroid. This is the audit that decides whether the ANN/
    * SemDeDup partition is healthy: a mega-cluster (high `frac`) says
    * raise k or sub-cluster before [[dedupSemantic]]'s within-cluster
    * pair scan blows up; a low `min_cos` tail says the coarse quantizer
    * is misassigning and IVF recall will sag at that cell.
    *
    * Serving reads ONLY the persisted index ([[annIndexShared]]'s two
    * parquet roots — no Lloyd stage in this plan, same contract as the
    * ANN serving keys, pinned in PlanSpec): centroids broadcast against
    * the assignment, one dot product per vector, one hash aggregation
    * keyed by cent_id (k rows out), the 1-row corpus total broadcast
    * back for the fraction. At 100 TB: one index scan, k·cols of
    * shuffle — the report is free relative to any consumer of the index.
    *
    * `mean_cos` is `round(sum/count, 6)` — the same absorb-the-ulps rule
    * the codebook means rely on; `min_cos` is order-exact.
    */
  def clusterStats(s: SparkSession, dir: String): DataFrame = {
    val (cents, assigned) = annIndexShared(s, dir, trained = true)
    val total = assigned.agg(count(lit(1)).as("n_total"))
    assigned.join(broadcast(cents), "cent_id")
      .withColumn("cos",
        dot_f(col("embedding"), col("ce")) / (col("cn") * col("ce_n")))
      .groupBy("cent_id")
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(col("cos")) / count(lit(1)), 6).as("mean_cos"),
        round(min(col("cos")), 6).as("min_cos"))
      .crossJoin(broadcast(total))
      .select(col("cent_id"), col("n_vecs"),
        round(col("n_vecs").cast("double") / col("n_total"), 6).as("frac"),
        col("mean_cos"), col("min_cos"))
      .orderBy("cent_id")
  }

  /** Oracle: [[kmeansTrainedCtes]] re-derives the same codebook and
    * assignment, then mirrors the per-cluster aggregate.
    */
  val clusterStatsSql: String = {
    val cf = KMeansFinalCents
    s"""WITH $kmeansTrainedCtes,
       |cosd AS (
       |  SELECT f.cent_id, ${cosineSql("e.embedding", "c.ce")} AS cos
       |  FROM assign_f f
       |  JOIN embeddings e ON e.vec_id = f.vec_id
       |  JOIN $cf c ON c.cent_id = f.cent_id),
       |stats AS (
       |  SELECT cent_id, count(*) AS n_vecs,
       |         round(sum(cos) / count(*), 6) AS mean_cos,
       |         round(min(cos), 6) AS min_cos
       |  FROM cosd GROUP BY 1)
       |SELECT cent_id, n_vecs,
       |       round(CAST(n_vecs AS DOUBLE) /
       |             (SELECT count(*) FROM embeddings), 6) AS frac,
       |       mean_cos, min_cos
       |FROM stats ORDER BY cent_id""".stripMargin
  }

  // ------------------------------------------------ X64 SRP-LSH ANN

  /** Signed-random-projection LSH (Charikar 2002): [[SrpPlanes]]
    * Rademacher hyperplanes, [[SrpBands]] bands of
    * [[SrpPlanes]]/[[SrpBands]] sign bits each — the third major ANN
    * family next to IVF (coarse quantizer) and PQ (compressed re-rank):
    * candidate generation by HASH BUCKET equality with zero training,
    * the right pick when the corpus churns too fast to retrain a
    * codebook.
    */
  val SrpPlanes = 16
  val SrpBands = 4
  private val SrpBandBits = SrpPlanes / SrpBands

  /** Fixture embedding dimensionality (the plane table's width;
    * [[graft.functions.DotProductF]] min-lengths, so a narrower vector
    * degrades gracefully rather than erroring).
    */
  val SrpDims = 64

  /** Plane p's dimension-d entry: ±1 by the parity of the first hex
    * digit of md5("p|d") — a deterministic Rademacher matrix (valid
    * for SRP by Achlioptas 2003's database-friendly projections) both
    * engines reproduce exactly; the oracle derives the SAME entries
    * with DuckDB's md5/strpos.
    */
  private def srpSign(p: Int, d: Int): Float = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p|$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if ("0123456789abcdef".indexOf(hex.charAt(0)) % 2 == 0) 1.0f else -1.0f
  }

  private def srpPlaneArr(p: Int): Column =
    array((0 until SrpDims).map(d => lit(srpSign(p, d))): _*)
      .cast("array<float>")

  /** Append the [[SrpBands]] band-key columns to any frame carrying an
    * `embedding` column — 16 literal-plane sign bits folded into 4
    * keys, all map-side codegen'd projection (no join, no shuffle, no
    * state): exactly the shape a STREAMING probe needs per arriving
    * row. Shared verbatim by the index build so the stream and batch
    * sides can never hash differently.
    */
  private[graft] def withSrpBands(df: DataFrame): DataFrame = {
    val bitCols = (0 until SrpPlanes).map(i =>
      when(dot_f(col("embedding"), srpPlaneArr(i)) > 0, 1).otherwise(0)
        .as(s"b$i"))
    val bandCols = (0 until SrpBands).map { b =>
      (0 until SrpBandBits)
        .map(j => col(s"b${b * SrpBandBits + j}") * lit(1 << j))
        .reduce(_ + _).as(s"band$b")
    }
    val keep = df.columns.map(col).toSeq
    df.select(keep ++ bitCols: _*).select(keep ++ bandCols: _*)
  }

  /** The persisted SRP index: per vector, its embedding + norm + the
    * [[SrpBands]] band keys, built in ONE projection pass — the 16
    * sign bits are [[graft.functions.VectorOps.dot_f]] calls against
    * LITERAL plane arrays (constants in the codegen'd stage: no plane
    * join, no explode, no shuffle at all before the write). The bit
    * rule `dot > 0` is cross-engine exact because both engines fold
    * the identical (double)float × ±1 products in element order.
    * At 100 TB this is the canonical LSH deployment shape: signatures
    * materialized once next to the corpus, every query served from
    * bucket-equality joins against them.
    */
  private[graft] def srpIndexShared(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(Dedup.sharedIndexPath(s, dir, "embeddings.parquet",
        "srp_sigs") { p =>
      withSrpBands(emb(s, dir).withColumn("cn", normExpr("embedding")))
        .write.mode("overwrite").parquet(p)
    })

  /** `similarity_ann_srp`: SRP-LSH ANN served from the persisted
    * signature index — candidates are vectors sharing ≥1 band key with
    * the query (bucket-local equality join, one pass over the exploded
    * band column against a broadcast of the 10×4 query bands), exact
    * cosine re-ranks the deduped candidate set. No training, no probe
    * ranking — band equality IS the probe.
    */
  def similarityAnnSrp(s: SparkSession, dir: String): DataFrame =
    srpServe(srpIndexShared(s, dir), probe = false)

  /** `similarity_ann_srp_probe`: MULTI-PROBE SRP (Lv et al. 2007's
    * probing idea on the banded signature): each query probes its
    * exact band key PLUS the [[SrpBandBits]] Hamming-1 flips of it —
    * 5 keys × 4 bands per query. A near neighbor that disagrees with
    * the query on exactly one plane of a band (the most likely miss)
    * still becomes a candidate, so recall rises with ZERO extra
    * signature planes and no rebuild of the index — the candidate scan
    * grows by the probed-bucket occupancy only. Same serving plan
    * shape; the probe table is still a broadcast (10 queries × 4 bands
    * × 5 keys = 200 rows).
    */
  def similarityAnnSrpProbe(s: SparkSession, dir: String): DataFrame =
    srpServe(srpIndexShared(s, dir), probe = true)

  /** Shared SRP serving tail: band-bucket candidate join (exact keys,
    * or exact + Hamming-1 flips when probing) → dedup → exact cosine
    * re-rank top-k.
    */
  private def srpServe(sigs: DataFrame, probe: Boolean): DataFrame = {
    val bandArr = array((0 until SrpBands).map(b => col(s"band$b")): _*)
    val sigBands = sigs.select(col("vec_id"),
      posexplode(bandArr).as(Seq("band_id", "band_key")))
    val exactQ = sigBands.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("band_id"), col("band_key"))
    val qBands =
      if (!probe) exactQ
      else {
        val flips = array((Seq(0) ++ (0 until SrpBandBits).map(1 << _))
          .map(lit(_)): _*)
        exactQ.withColumn("f", explode(flips))
          .select(col("query_id"), col("band_id"),
            col("band_key").bitwiseXOR(col("f")).as("band_key"))
      }
    val pairs = sigBands.join(broadcast(qBands), Seq("band_id", "band_key"))
      .filter(col("query_id") =!= col("vec_id"))
      .select("query_id", "vec_id").distinct()
    val e = sigs.select(col("vec_id"), col("embedding"), col("cn"))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("cn").as("qn"))
    val scored = pairs.join(broadcast(q), "query_id").join(e, "vec_id")
      .withColumn("score",
        dot_f(col("qe"), col("embedding")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("query_id"), col("vec_id").as("cand_id"),
        round(col("score"), 6).as("score"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** The plane-derivation → sign-bit → band-key CTE chain shared by
    * every SRP oracle (exact-band, multi-probe, and the streaming
    * probe), so no two oracles can band differently.
    */
  private[graft] val srpBandsCtes: String =
    s"""planes AS (
       |  SELECT p, list(CASE WHEN strpos('0123456789abcdef',
       |        substr(md5(p::VARCHAR || '|' || d::VARCHAR), 1, 1)) % 2 = 1
       |      THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END
       |      ORDER BY d) AS pe
       |  FROM range($SrpPlanes) tp(p), range($SrpDims) td(d)
       |  GROUP BY p),
       |bits AS (
       |  SELECT e.vec_id, pl.p,
       |         CASE WHEN list_dot_product(e.embedding::DOUBLE[], pl.pe) > 0
       |              THEN 1 ELSE 0 END AS bit
       |  FROM embeddings e, planes pl),
       |bands AS (
       |  SELECT vec_id, p // $SrpBandBits AS band_id,
       |         CAST(sum(bit * (CASE p % $SrpBandBits ${(0 until SrpBandBits)
                  .map(j => s"WHEN $j THEN ${1 << j}").mkString(" ")}
       |                    ELSE 0 END))
       |           AS BIGINT) AS band_key
       |  FROM bits GROUP BY vec_id, p // $SrpBandBits)""".stripMargin

  /** Oracle: the identical plane derivation (md5-parity Rademacher
    * entries), sign bits, band keys, bucket-equality candidates, and
    * exact re-rank, all from the raw parquet.
    */
  val similarityAnnSrpSql: String =
    s"""WITH $srpBandsCtes,
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
       |  FROM bands q
       |  JOIN bands c ON c.band_id = q.band_id AND c.band_key = q.band_key
       |  WHERE q.vec_id < $NumQueries AND c.vec_id <> q.vec_id),
       |scored AS (
       |  SELECT cd.query_id, cd.cand_id,
       |         ${cosineSql("eq.embedding", "ec.embedding")} AS score
       |  FROM cand cd
       |  JOIN embeddings eq ON eq.vec_id = cd.query_id
       |  JOIN embeddings ec ON ec.vec_id = cd.cand_id),
       |ranked AS (
       |  SELECT query_id, cand_id, round(score, 6) AS score,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY score DESC, cand_id) AS rnk
       |  FROM scored)
       |SELECT query_id, cand_id, score, rnk FROM ranked
       |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin

  /** Oracle for the multi-probe variant: identical planes/bits/bands,
    * the probe cross-join adds the Hamming-1 band-key flips
    * (`xor(key, {0,1,2,4,8})`), then the same exact re-rank.
    */
  val similarityAnnSrpProbeSql: String = {
    val flips = (Seq(0) ++ (0 until SrpBandBits).map(1 << _))
      .map(f => s"($f)").mkString(", ")
    s"""WITH $srpBandsCtes,
       |probes AS (
       |  SELECT q.vec_id AS query_id, q.band_id,
       |         xor(q.band_key, f.f) AS band_key
       |  FROM bands q, (VALUES $flips) f(f)
       |  WHERE q.vec_id < $NumQueries),
       |cand AS (
       |  SELECT DISTINCT p.query_id, c.vec_id AS cand_id
       |  FROM probes p
       |  JOIN bands c ON c.band_id = p.band_id AND c.band_key = p.band_key
       |  WHERE c.vec_id <> p.query_id),
       |scored AS (
       |  SELECT cd.query_id, cd.cand_id,
       |         ${cosineSql("eq.embedding", "ec.embedding")} AS score
       |  FROM cand cd
       |  JOIN embeddings eq ON eq.vec_id = cd.query_id
       |  JOIN embeddings ec ON ec.vec_id = cd.cand_id),
       |ranked AS (
       |  SELECT query_id, cand_id, round(score, 6) AS score,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY score DESC, cand_id) AS rnk
       |  FROM scored)
       |SELECT query_id, cand_id, score, rnk FROM ranked
       |WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin
  }
}
