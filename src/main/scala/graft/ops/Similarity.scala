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
  /** Fixed IVF centroid count. Real IVF trains k centroids with k fixed
    * (or ~sqrt(n) capped); the round-1 every-50th-vector rule made k grow
    * O(n) and assignment cost O(n²/50). Here: the 16 vectors with the
    * smallest md5(vec_id) — a deterministic pseudo-random sample both
    * engines compute identically, with O(n·k) assignment. At 100 TB, k
    * would be sized ~sqrt(n); [[similarityAnnKmeans]] is the trained
    * variant (Lloyd iterations from this same seed sample); the plan
    * shape — broadcast centroids, one assignment pass, per-cluster
    * probe — is unchanged.
    */
  val NumCentroids = 16

  /** Clusters probed per query. nprobe > 1 is standard IVF practice:
    * recall grows with the probed fraction while the candidate scan stays
    * nprobe/k of the corpus.
    */
  val NProbe = 4

  /** Cosine similarity of two float-array columns, accumulated in double
    * in deterministic element order. Uses the native codegen'd
    * [[graft.functions.DotProductF]] (same summation order as the
    * `zip_with`/`aggregate` composition it replaced — see its scaladoc).
    */
  import graft.functions.VectorOps.dot_f

  def cosineExpr(a: String, b: String): Column =
    dot_f(col(a), col(b)) /
      (sqrt(dot_f(col(a), col(a))) * sqrt(dot_f(col(b), col(b))))

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
    * k=16 centroid scores per query — 10 queries × 16 rows), candidates
    * are scanned cluster-locally via a broadcast join on the probed
    * cent_id, exact cosine re-ranks. A candidate lives in exactly one
    * cluster, so the probe join yields each (query, candidate) pair at
    * most once — no dedup needed.
    */
  private def serveAnn(cents: DataFrame, assigned: DataFrame): DataFrame = {
    val probeW = Window.partitionBy("vec_id")
      .orderBy(col("cscore").desc, col("cent_id"))
    val q = assigned.select(col("vec_id"), col("embedding"), col("cn"))
      .filter(col("vec_id") < NumQueries)
      .crossJoin(broadcast(cents))
      .withColumn("cscore",
        dot_f(col("embedding"), col("ce")) / (col("cn") * col("ce_n")))
      .withColumn("prn", row_number().over(probeW))
      .filter(col("prn") <= NProbe)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("cn").as("qn"), col("cent_id").as("qcent"))
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

  /** Oracle: the identical Lloyd unroll as CTEs — assignment t feeds
    * per-dimension means (same round-to-6 + float32 cast), cents t feeds
    * assignment t+1; the serving CTEs mirror [[similarityAnnIvfSql]].
    */
  val similarityAnnKmeansSql: String = {
    def assignCte(name: String, cents: String): String =
      s"""$name AS (
         |  SELECT vec_id, cent_id FROM (
         |    SELECT e.vec_id, c.cent_id,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${cosineSql("e.embedding", "c.ce")} DESC, c.cent_id) AS arn
         |    FROM embeddings e, $cents c)
         |  WHERE arn = 1)""".stripMargin
    def centsCte(name: String, assign: String): String =
      s"""$name AS (
         |  SELECT cent_id, list(cv ORDER BY pos)::FLOAT[] AS ce FROM (
         |    SELECT a.cent_id, x.pos, round(sum(CAST(x.v AS DOUBLE)) / count(*), 6) AS cv
         |    FROM embeddings e
         |    JOIN $assign a ON a.vec_id = e.vec_id,
         |    LATERAL (SELECT generate_subscripts(e.embedding, 1) AS pos,
         |                    unnest(e.embedding) AS v) x
         |    GROUP BY a.cent_id, x.pos)
         |  GROUP BY cent_id)""".stripMargin
    val train = (1 to KMeansIters).map { t =>
      assignCte(s"assign$t", s"cents${t - 1}") + ",\n" +
        centsCte(s"cents$t", s"assign$t")
    }.mkString(",\n")
    val cf = s"cents$KMeansIters"
    s"""WITH cents0 AS (
       |  SELECT vec_id AS cent_id, embedding AS ce
       |  FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $NumCentroids),
       |$train,
       |${assignCte("assign_f", cf)},
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
}
