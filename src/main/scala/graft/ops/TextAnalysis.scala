package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` (SURVEY.md §2.9 X5 plus the
  * north-star extras: language-ID, quality scoring, token counting,
  * fingerprinting). All per-document work is codegen'd higher-order
  * functions — embarrassingly parallel, no shuffle except the final
  * summaries; `explode` blowup is bounded by document length.
  *
  * Testdata caveat: document text is synthetic word salad drawn from one
  * shared vocabulary, so the language-ID heuristic's *accuracy* is
  * meaningless here — the operator demonstrates the deterministic scoring
  * machinery (marker-token counts → argmax with a fixed priority order),
  * which is what transfers to real corpora.
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private val toksExpr = Tokens.toksExpr
  private val toksSql = Tokens.toksSql

  // ------------------------------------------------------- X5 token stats

  /** `text_token_stats`: per-language corpus summary. */
  def textTokenStats(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).withColumn("toks", expr(toksExpr))
    // averages as round6(CAST(sum AS DOUBLE)/count) with the identical
    // expression shape in the oracle SQL: both engines then perform the
    // same single IEEE division on the same exact integers (a native
    // avg() may accumulate differently below the rounding epsilon), and
    // the shared round6 pins the midpoint decision both ways — native
    // round(x, 6) differs between the engines exactly there (the
    // Buckets.scala r10 class; r16 review, applied file-wide)
    val perLang = d.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("toks"))).as("n_tokens"),
      Buckets.round6(sum(size(col("toks"))).cast("double") / count(lit(1)))
        .as("avg_tokens"),
      Buckets.round6(sum(col("n_chars")).cast("double") / count(lit(1)))
        .as("avg_chars"))
    val distinctToks = d.select(col("lang"), explode(col("toks")).as("t"))
      .groupBy("lang").agg(countDistinct(col("t")).as("n_distinct_tokens"))
    perLang.join(distinctToks, "lang")
      .select("lang", "n_docs", "n_tokens", "n_distinct_tokens", "avg_tokens", "avg_chars")
      .orderBy("lang")
  }

  val textTokenStatsSql: String =
    s"""WITH d AS (SELECT lang, n_chars, $toksSql AS toks FROM documents),
       |per_lang AS (
       |  SELECT lang, count(*) AS n_docs, CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
       |         ${Buckets.round6Sql(
                 "CAST(sum(len(toks)) AS DOUBLE) / count(*)")} AS avg_tokens,
       |         ${Buckets.round6Sql(
                 "CAST(sum(n_chars) AS DOUBLE) / count(*)")} AS avg_chars
       |  FROM d GROUP BY lang),
       |dt AS (
       |  SELECT lang, count(DISTINCT t) AS n_distinct_tokens
       |  FROM (SELECT lang, unnest(toks) AS t FROM d) GROUP BY lang)
       |SELECT lang, n_docs, n_tokens, n_distinct_tokens, avg_tokens, avg_chars
       |FROM per_lang JOIN dt USING (lang)
       |ORDER BY lang""".stripMargin

  // ------------------------------------------------------- quality scoring

  /** `text_quality`: per-document quality features — token count,
    * type-token ratio, stopword ratio, mean token length — and a simple
    * composite score. All single-pass array expressions.
    */
  def textQuality(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn("toks", expr(toksExpr))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        Buckets.round6(
          expr("size(array_distinct(toks)) / CAST(size(toks) AS DOUBLE)")).as("ttr"),
        Buckets.round6(
          expr(s"size(filter(toks, t -> ${Tokens.stopPred("t")})) / CAST(size(toks) AS DOUBLE)"))
          .as("stop_ratio"),
        Buckets.round6(
          expr("aggregate(toks, 0, (acc, t) -> acc + length(t)) / CAST(size(toks) AS DOUBLE)"))
          .as("avg_token_len"),
        Buckets.round6(
          expr("(size(array_distinct(toks)) / CAST(size(toks) AS DOUBLE)) * " +
          s"(1 - size(filter(toks, t -> ${Tokens.stopPred("t")})) / CAST(size(toks) AS DOUBLE))"))
          .as("quality"))
      .orderBy("doc_id")

  val textQualitySql: String =
    s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents)
       |SELECT doc_id, len(toks) AS n_tokens,
       |       ${Buckets.round6Sql(
                 "len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)")} AS ttr,
       |       ${Buckets.round6Sql(
                 s"len(list_filter(toks, t -> ${Tokens.stopPred("t")})) / CAST(len(toks) AS DOUBLE)")} AS stop_ratio,
       |       ${Buckets.round6Sql(
                 "list_sum(list_transform(toks, t -> length(t))) / CAST(len(toks) AS DOUBLE)")} AS avg_token_len,
       |       ${Buckets.round6Sql(
                 "(len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)) * " +
                 s"(1 - len(list_filter(toks, t -> ${Tokens.stopPred("t")})) / CAST(len(toks) AS DOUBLE))")} AS quality
       |FROM d ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------- language ID

  /** Marker-token sets per language (n-gram-heuristic stand-in). */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("agg", "hash", "join", "fast"),
    "en" -> Seq("the", "a", "key", "row", "table"),
    "es" -> Seq("data", "sort", "value", "stream"),
    "fr" -> Seq("window", "query", "order", "merge"),
    "zh" -> Seq("batch", "spark", "big", "small"))

  private def markerPredList(t: String, words: Seq[String]): String =
    words.map(w => s"$t = '$w'").mkString(" OR ")

  /** `text_langid`: score each language by marker-token hits; predict the
    * argmax with a fixed priority order (de,en,es,fr,zh) on ties.
    *
    * Accuracy note: the SYNTHETIC corpus's `lang` label is uncorrelated
    * with its token stream (every document draws from one English-ish
    * vocabulary), so measured `hit` hovers at the majority-class prior
    * by construction — no text-based classifier can beat it here, and
    * no accuracy gate is pinned (contrast AnnRecallSpec, whose fixture
    * HAS signal). On real data the operator's quality lives in the
    * marker table, which is the swappable part.
    */
  def textLangid(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).withColumn("toks", expr(toksExpr))
    val scored = markers.foldLeft(base) { case (df, (lang, words)) =>
      df.withColumn(s"s_$lang",
        expr(s"size(filter(toks, t -> ${markerPredList("t", words)}))"))
    }
    val langs = markers.map(_._1)
    val pred = langs.zipWithIndex.foldRight(lit(langs.last): org.apache.spark.sql.Column) {
      case ((lang, i), elseCol) =>
        if (i == langs.size - 1) elseCol
        else {
          val geAll = langs.drop(i + 1)
            .map(o => col(s"s_$lang") >= col(s"s_$o")).reduce(_ && _)
          when(geAll, lit(lang)).otherwise(elseCol)
        }
    }
    scored.select(col("doc_id"), col("lang"), pred.as("pred_lang"))
      .withColumn("hit", (col("lang") === col("pred_lang")).cast("int"))
      .orderBy("doc_id")
  }

  val textLangidSql: String = {
    val scores = markers.map { case (lang, words) =>
      s"len(list_filter(toks, t -> ${markerPredList("t", words)})) AS s_$lang"
    }.mkString(",\n       ")
    val langs = markers.map(_._1)
    val arms = langs.dropRight(1).zipWithIndex.map { case (lang, i) =>
      val geAll = langs.drop(i + 1).map(o => s"s_$lang >= s_$o").mkString(" AND ")
      s"WHEN $geAll THEN '$lang'"
    }.mkString(" ")
    s"""WITH d AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
       |scored AS (SELECT doc_id, lang,
       |       $scores
       |FROM d)
       |SELECT doc_id, lang,
       |       CASE $arms ELSE '${langs.last}' END AS pred_lang,
       |       CAST(lang = (CASE $arms ELSE '${langs.last}' END) AS INT) AS hit
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------- token counting

  /** `text_token_count`: whitespace tokens vs a BPE-ish regex token count
    * (letter runs / digit runs / single non-alphanumerics).
    */
  def textTokenCount(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
        col("doc_id"),
        expr(s"size($toksExpr)").as("ws_tokens"),
        expr("size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")
          .as("re_tokens"))
      .orderBy("doc_id")

  val textTokenCountSql: String =
    s"""SELECT doc_id, len($toksSql) AS ws_tokens,
       |       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------- length distribution

  /** `token_len_quantiles`: per-language document-length distribution —
    * exact interpolated p50/p90/p99 of the token count (the diagnostic a
    * curation pass reads before setting length filters). Exact
    * `percentile` rather than `percentile_approx`: approximate sketches
    * are engine-specific and would never cross-check; the exact form is
    * one partial-aggregated shuffle keyed by lang here, and at 100 TB
    * you run it on [[PipelineOps.sampleStratified]]'s sample (where
    * exactness over the sample still beats an un-checkable sketch).
    */
  def tokenLenQuantiles(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn("n", expr(s"size($toksExpr)"))
      .groupBy("lang")
      .agg(
        Buckets.round6(expr("percentile(n, 0.5D)")).as("p50"),
        Buckets.round6(expr("percentile(n, 0.9D)")).as("p90"),
        Buckets.round6(expr("percentile(n, 0.99D)")).as("p99"),
        count(lit(1)).as("n_docs"))
      .orderBy("lang")

  val tokenLenQuantilesSql: String =
    s"""SELECT lang,
       |       ${Buckets.round6Sql(s"quantile_cont(len($toksSql), 0.5)")} AS p50,
       |       ${Buckets.round6Sql(s"quantile_cont(len($toksSql), 0.9)")} AS p90,
       |       ${Buckets.round6Sql(s"quantile_cont(len($toksSql), 0.99)")} AS p99,
       |       count(*) AS n_docs
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------ X58 quantile-sketch audit

  /** Exponential-histogram geometry (HdrHistogram's layout): values
    * below `2·SubBins` get an EXACT bin each; larger values split each
    * base-2 octave into [[QuantileSubBins]] linear sub-bins, so a bin's
    * width is ≤ 1/16 of its value — the bounded-relative-error property
    * that makes the histogram a quantile sketch rather than a guess.
    */
  val QuantileOctaves = 31
  val QuantileSubBins = 16

  /** `sketch_quantile`: the quantile member of the sketch trio (X55
    * distinct-count, X57 frequency, this one rank statistics) — per-doc
    * token-count quantiles estimated from the exponential histogram
    * ([[QuantileOctaves]] octaves × [[QuantileSubBins]] linear sub-bins,
    * exact bins below `2·SubBins`), audited against the exact
    * percentiles. Estimate = the first bin whose cumulative count
    * reaches the target rank, linearly interpolated inside the bin's
    * `[blo, bhi)` span (≤ 1/16 of the value wide); the `rel_err` column
    * is the price of a few hundred counters vs a full sort — what a
    * percentile dashboard over 100 TB actually pays.
    *
    * Scale shape: the histogram is ONE linear pass whose aggregation
    * state is the bin table — ≤ `2·SubBins + Octaves·SubBins` ≈ 530
    * counters, map-side combined; every window/join after it runs on
    * that bin table or the 3-row percentile frame. The exact arm
    * (`percentile`, mirrored by DuckDB's `quantile_cont` — the proven
    * [[tokenLenQuantiles]] parity) is the audit comparison, not the
    * production path. Everything is integer counts + the same IEEE
    * expression tree in both engines — fully deterministic, no
    * approx_percentile opacity.
    */
  /** The bin layout as one dialect-parameterized expression set (`idiv`
    * = `div` in Spark, `//` in DuckDB — the byteBucket two-renderings
    * pattern). Expects column `n`; yields `bin, blo, bhi`.
    */
  private[ops] def quantileBinExprs(idiv: String): Seq[(String, String)] = {
    val sb = QuantileSubBins
    val ladder = (0 until QuantileOctaves).map(k =>
      s"CASE WHEN n >= ${1L << k} THEN 1 ELSE 0 END").mkString(" + ")
    val lo = s"CAST(power(CAST(2 AS DOUBLE), ($ladder) - 1) AS BIGINT)"
    val small = s"n < ${2 * sb}"
    val sub = s"(((n - $lo) * $sb) $idiv $lo)"
    val step = s"($lo $idiv $sb)"
    Seq(
      "bin" -> s"CASE WHEN $small THEN n ELSE ($ladder) * $sb + $sub END",
      "blo" -> s"CASE WHEN $small THEN n ELSE $lo + $sub * $step END",
      "bhi" -> (s"CASE WHEN $small THEN n + 1 " +
        s"ELSE $lo + $sub * $step + $step END"))
  }

  def sketchQuantile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lens = docs(s, dir)
      .select(expr(s"size($toksExpr)").cast("long").as("n"))
    // ONE corpus pass shared by the histogram AND the exact audit arm
    // (guide §2.4 "share one exchange", §2.3 "aggregate before you
    // shuffle"; r17 verdict #4): aggregate to distinct (n, cnt) first.
    // Both consumers below hang off this SAME groupBy(n) aggregate, so
    // ReuseExchange computes the scan+tokenize once — the r17 phase
    // split measured the two independent corpus passes as the key's
    // dominant cost. The histogram re-groups the ≤|distinct n| rows;
    // the exact arm uses percentile's FREQUENCY form, which buffers a
    // value→count map exactly like the row-at-a-time form (bit-identical
    // doubles, pinned by the unchanged oracle hash). The exact
    // percentile stays the declared audit arm — r15 adjudication — only
    // its input encoding changed.
    val nvals = lens.groupBy("n").agg(count(lit(1)).as("cnt"))
    val binned = quantileBinExprs("div").foldLeft(nvals) {
      case (df, (name, e)) => df.withColumn(name, expr(e))
    }
    val hist = binned.groupBy("bin", "blo", "bhi").agg(sum(col("cnt")).as("c"))
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cumc", sum(col("c")).over(w))
      .withColumn("prevc", col("cumc") - col("c"))
    val tot = nvals.agg(sum(col("cnt")).as("n_docs"),
      Buckets.round6(expr("percentile(n, 0.5D, cnt)")).as("e50"),
      Buckets.round6(expr("percentile(n, 0.9D, cnt)")).as("e90"),
      Buckets.round6(expr("percentile(n, 0.99D, cnt)")).as("e99"))
    val ps = Seq(0.5, 0.9, 0.99).toDF("p")
    ps.crossJoin(broadcast(tot))
      .withColumn("rank", expr("CAST(ceil(p * n_docs) AS BIGINT)"))
      .crossJoin(broadcast(cum))
      .filter(col("cumc") >= col("rank"))
      .groupBy("p", "rank", "n_docs", "e50", "e90", "e99")
      .agg(min_by(struct(col("bin"), col("blo"), col("bhi"), col("c"),
        col("prevc")), col("bin")).as("pick"))
      .withColumn("est", Buckets.round6(expr(
        "CAST(pick.blo AS DOUBLE) + (pick.bhi - pick.blo) * " +
          "(rank - pick.prevc) / pick.c")))
      .withColumn("exact", expr(
        "CASE WHEN p = 0.5 THEN e50 WHEN p = 0.9 THEN e90 ELSE e99 END"))
      .select(col("p"), col("n_docs"), col("est"), col("exact"),
        Buckets.round6((col("est") - col("exact")) / col("exact"))
          .as("rel_err"))
      .orderBy("p")
  }

  val sketchQuantileSql: String = {
    val exprs = quantileBinExprs("//").toMap
    s"""WITH lens AS (
       |  SELECT CAST(len($toksSql) AS BIGINT) AS n FROM documents),
       |hist AS (
       |  SELECT ${exprs("bin")} AS bin, ${exprs("blo")} AS blo,
       |         ${exprs("bhi")} AS bhi, count(*) AS c
       |  FROM lens GROUP BY 1, 2, 3),
       |cum AS (
       |  SELECT bin, blo, bhi, c,
       |         sum(c) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cumc
       |  FROM hist),
       |cum2 AS (SELECT bin, blo, bhi, c, cumc, cumc - c AS prevc FROM cum),
       |tot AS (
       |  SELECT count(*) AS n_docs,
       |         ${Buckets.round6Sql("quantile_cont(n, 0.5)")} AS e50,
       |         ${Buckets.round6Sql("quantile_cont(n, 0.9)")} AS e90,
       |         ${Buckets.round6Sql("quantile_cont(n, 0.99)")} AS e99
       |  FROM lens),
       |ps(p) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
       |                 (CAST(0.99 AS DOUBLE))),
       |sel AS (
       |  SELECT pr.p, pr.n_docs, pr.rank, pr.e50, pr.e90, pr.e99,
       |         cum2.blo, cum2.bhi, cum2.c, cum2.prevc,
       |         row_number() OVER (PARTITION BY pr.p ORDER BY cum2.bin) AS rn
       |  FROM (SELECT ps.p, CAST(ceil(ps.p * t.n_docs) AS BIGINT) AS rank,
       |               t.n_docs, t.e50, t.e90, t.e99
       |        FROM ps, tot t) pr
       |  JOIN cum2 ON cum2.cumc >= pr.rank),
       |est AS (
       |  SELECT p, n_docs,
       |         ${Buckets.round6Sql(
                 "CAST(blo AS DOUBLE) + (bhi - blo) * (rank - prevc) / c")}
       |           AS est,
       |         CASE WHEN p = 0.5 THEN e50 WHEN p = 0.9 THEN e90
       |              ELSE e99 END AS exact
       |  FROM sel WHERE rn = 1)
       |SELECT p, n_docs, est, exact,
       |       ${Buckets.round6Sql("(est - exact) / exact")} AS rel_err
       |FROM est ORDER BY p""".stripMargin
  }

  // ------------------------------------------------- document frequency

  /** Rows kept in the `token_docfreq` index sample. */
  val DocfreqTopK = 100

  /** `token_docfreq`: the document-frequency index — per token, how many
    * distinct documents contain it and its total occurrence count; top
    * [[DocfreqTopK]] by df (token tie-break). This is the table
    * stopword derivation and df-based filtering read from. Scale: one
    * explode, one partial-aggregated `groupBy(token)` shuffle, then
    * `TakeOrderedAndProject` (per-partition top-k, no global sort).
    */
  def tokenDocfreq(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(expr(toksExpr)).as("t"))
      .groupBy("t")
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
      .select(col("t").as("token"), col("df"), col("tf"))
      .orderBy(col("df").desc, col("token"))
      .limit(DocfreqTopK)

  val tokenDocfreqSql: String =
    s"""SELECT t AS token, count(DISTINCT doc_id) AS df, count(*) AS tf
       |FROM (SELECT doc_id, unnest($toksSql) AS t FROM documents)
       |GROUP BY t ORDER BY df DESC, token LIMIT $DocfreqTopK""".stripMargin

  // ---------------------------------------------------------- fingerprints

  /** `doc_fingerprint`: rolling document fingerprint — MD5 of the full
    * text plus the minimum MD5 over 8-token shingles (winnowing-style
    * content fingerprint, stable under small edits away from the minimum
    * shingle).
    */
  def docFingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).withColumn("toks", expr(toksExpr))
      .select(
        col("doc_id"),
        md5(col("text")).as("md5_full"),
        expr("array_min(transform(sequence(1, size(toks) - 7), " +
          "i -> md5(array_join(slice(toks, i, 8), ' '))))").as("shingle_fp"))
      .orderBy("doc_id")

  val docFingerprintSql: String =
    s"""WITH d AS (SELECT doc_id, text, $toksSql AS toks FROM documents)
       |SELECT doc_id, md5(text) AS md5_full,
       |       list_aggregate(list_transform(generate_series(1, len(toks) - 7),
       |         i -> md5(array_to_string(list_slice(toks, i, i + 7), ' '))), 'min') AS shingle_fp
       |FROM d ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- bigram LM fluency

  /** `text_lm_score`: per-document mean bigram log-probability under an
    * add-one-smoothed bigram model trained on the corpus itself — the
    * perplexity-proxy fluency gate of classic corpus curation (a KenLM
    * stand-in that needs no external model):
    * `score(d) = mean over bigrams (t1,t2) of ln((c(t1,t2)+1)/(c(t1)+V))`.
    * Degenerate/boilerplate text scores high (its bigrams dominate the
    * corpus), dissimilar-to-corpus text scores low — filter both tails.
    *
    * Scale shape (r13): bigram instances come from two staggered slices
    * zipped positionally (codegen, zero shuffle — the [[graft.ops.Dedup
    * .shingleSet]] trick at width 2); the MODEL is a persisted
    * `(t1, t2, wq)` table — one portable-ln log-probability per
    * observed bigram type, quantized to integer micro-units — trained
    * once per corpus into the shared index store (the ANN-codebook
    * lifecycle; the two training explodes and the vocabulary action run
    * at build, never per query). Scoring joins instances to the model
    * by (t1, t2) and reduces per doc_id as an exact BIGINT sum. Every
    * shuffle key is a bigram or a doc_id — nothing corpus-wide ever
    * sits on one node. At 100 TB the model is Zipf-concentrated and
    * join-skewed on the head bigrams; AQE skew-join is the standard
    * answer, and a real deployment trains the model on a sample.
    */
  /** Adjacent-pair bigram instances `(doc_id, t1, t2)` — two staggered
    * slices zipped positionally (codegen, zero shuffle). The ONE bigram
    * construction [[textLmScore]] and [[tokenPmi]] share, with
    * [[bigramSqlCtes]] as its oracle twin, so a slice-boundary or
    * tokenization fix cannot desynchronize the two consumers.
    */
  private def bigramInstances(s: SparkSession, dir: String): DataFrame = {
    val n1 = greatest(size(col("t")) - 1, lit(0))
    docs(s, dir).select(col("doc_id"), expr(toksExpr).as("t"))
      .select(col("doc_id"),
        posexplode(arrays_zip(
          slice(col("t"), lit(1), n1).as("a"),
          slice(col("t"), lit(2), n1).as("b"))))
      .select(col("doc_id"), col("pos").as("i"),
        col("col.a").as("t1"), col("col.b").as("t2"))
  }

  /** Corpus unigram counts `(t1, cu)` — shared by the same two ops. */
  private def unigramCounts(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(explode(expr(toksExpr)).as("t1"))
      .groupBy("t1").agg(count(lit(1)).as("cu"))

  /** DuckDB twins of [[bigramInstances]]/[[unigramCounts]]:
    * `d`/`bi(doc_id, t1, t2)`/`uni(t1, cu)` CTEs.
    */
  private val bigramSqlCtes: String =
    s"""d AS (SELECT doc_id, $toksSql AS t FROM documents),
       |bi AS (
       |  SELECT doc_id, s.i AS i, t[s.i] AS t1, t[s.i + 1] AS t2
       |  FROM d, unnest(generate_series(1, len(t) - 1)) AS s(i)),
       |uni AS (
       |  SELECT t1, count(*) AS cu
       |  FROM (SELECT unnest(t) AS t1 FROM d) GROUP BY 1)""".stripMargin

  def textLmScore(s: SparkSession, dir: String): DataFrame = {
    // Bigram LM MODEL table (the dsir r13 pattern): one PORTABLE-ln
    // log-probability per observed bigram TYPE — no libm anywhere, so
    // the weights are bit-identical across engines — quantized to
    // integer micro-units at emission, TRAINED ONCE per corpus into
    // the amortized shared-index store (the ANN-codebook/DSIR
    // lifecycle: the two training explodes and the vocab action run at
    // build, never per query). SERVING is one corpus explode joined to
    // the broadcast model, reduced per doc as an EXACT BIGINT sum —
    // order-free, map-side-combinable HashAggregate (r12's ordered
    // collect_list fold shipped every instance through the shuffle and
    // carried the dsir libm hazard).
    val mPath = Dedup.sharedIndexPath(
      s, dir, "documents.parquet", "bigramlm") { p =>
      val bi = bigramInstances(s, dir)
      val uni = unigramCounts(s, dir)
      val big = bi.groupBy("t1", "t2").agg(count(lit(1)).as("cb"))
      val v = uni.count() // vocabulary size — one small scalar action
      PortableMath.lnColumn(
          big.join(uni, "t1").withColumn("vsz", lit(v)),
          "CAST(cb + 1 AS DOUBLE) / CAST(cu + vsz AS DOUBLE)", "lnp")
        .select(col("t1"), col("t2"),
          expr(PortableMath.microUnitsSql("lnp")).as("wq"))
        .write.mode("overwrite").parquet(p)
    }
    // no broadcast hint: the model is observed-bigram-sized (NOT the
    // ≤256-row dsir case) — at test scale AQE broadcasts it on its own,
    // at 100 TB it stays a shuffle join with AQE skew-splitting on the
    // Zipf head (the pinned plan regime)
    bigramInstances(s, dir)
      .join(s.read.parquet(mPath), Seq("t1", "t2"))
      .groupBy("doc_id")
      .agg(sum(col("wq")).as("sum_wq"), count(lit(1)).as("n_bigrams"))
      .select(col("doc_id"),
        Buckets.round6(expr(
          "CAST(sum_wq AS DOUBLE) / 1e6 / CAST(n_bigrams AS DOUBLE)"))
          .as("lm_score"),
        col("n_bigrams"))
      .orderBy("doc_id")
  }

  val textLmScoreSql: String =
    s"""WITH $bigramSqlCtes,
       |big AS (SELECT t1, t2, count(*) AS cb FROM bi GROUP BY 1, 2),
       |vsz0 AS (SELECT count(*) AS vsz FROM uni),
       |bm AS (SELECT t1, t2, cb, cu, vsz
       |       FROM big JOIN uni USING (t1) CROSS JOIN vsz0),
       |${PortableMath.lnCtesSql("bm", Seq("t1", "t2"),
           "CAST(cb + 1 AS DOUBLE) / CAST(cu + vsz AS DOUBLE)", "lnp", "lm")},
       |model AS (SELECT t1, t2,
       |  ${PortableMath.microUnitsSql("lnp")} AS wq FROM lmln)
       |SELECT doc_id,
       |       ${Buckets.round6Sql(
                 "CAST(sum(wq) AS DOUBLE) / 1e6 / CAST(count(*) AS DOUBLE)")}
       |         AS lm_score,
       |       count(*) AS n_bigrams
       |FROM bi JOIN model USING (t1, t2)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------- X31 cross-doc boilerplate

  /** Doc-frequency threshold above which a shingle counts as boilerplate
    * (it appears in ≥ this many distinct documents).
    */
  val BoilerplateDf = 3

  /** `text_boilerplate`: per-document fraction of distinct 3-gram
    * shingles that are CROSS-document boilerplate — shingles occurring
    * in ≥ [[BoilerplateDf]] distinct docs. The web-curation signal
    * behind navigation/footer stripping (RefinedWeb/C4-style): a doc
    * made of corpus-common spans is template, not content. Distinct
    * from X15's `text_repetition`, which scores WITHIN-doc repetition;
    * X14's decontamination flags overlap with a benchmark, not with the
    * corpus itself.
    *
    * Reads the amortized shared shingle index ([[Dedup.shingleSetShared]]
    * — one build per corpus, every consumer scans it); doc frequency is
    * one partial-aggregated shuffle keyed by shingle; the join back is
    * shingle-keyed. At 100 TB the ≥df shingle set (boilerplate is by
    * construction a tiny head of the distribution) drops out of the
    * aggregate broadcast-sized, so the join back can run as a map-side
    * semi-probe; this relational equi-join form is the same plan with
    * AQE free to pick the broadcast side.
    */
  def textBoilerplate(s: SparkSession, dir: String): DataFrame = {
    val u = Dedup.shingleSetShared(s, dir)
    // u is distinct per (doc_id, g): count(*) IS the doc frequency
    val dfq = u.groupBy("g").agg(count(lit(1)).as("df"))
    u.join(dfq, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("df") >= BoilerplateDf, 1)).as("n_common"))
      .select(col("doc_id"), col("n_shingles"), col("n_common"),
        Buckets.round6(col("n_common").cast("double") / col("n_shingles"))
          .as("boilerplate_frac"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------- X34 doc chunking

  /** Chunk geometry: 32-token windows every 24 tokens (8-token overlap)
    * — the overlapping-window shape retrieval-corpus prep uses so no
    * boundary sentence is lost to a hard cut.
    */
  val ChunkTokens = 32
  val ChunkStride = 24

  /** `doc_chunk`: split every document into overlapping token windows —
    * the retrieval/embedding-corpus preparation step (each chunk is what
    * gets embedded and indexed; the hash is its stable chunk key).
    * Chunk k covers tokens `[k·stride+1, k·stride+size]`, clamped at the
    * document end; every token is in ≥1 chunk.
    *
    * Pure map-side fan-out: `sequence`/`slice`/`concat_ws` are
    * codegen'd collection expressions evaluated in the scan's own stage
    * — no shuffle except the presentation sort, and output volume is
    * input·(1 + overlap/stride), bounded per task.
    */
  def docChunk(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), expr(toksExpr).as("t"))
      .select(col("doc_id"),
        explode(expr(s"sequence(0, (size(t) - 1) div $ChunkStride)")).as("k"),
        col("t"))
      .select(col("doc_id"), col("k").as("chunk_id"),
        expr(s"slice(t, k * $ChunkStride + 1, $ChunkTokens)").as("c"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("c")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("c"))).as("chunk_hash"))
      .orderBy("doc_id", "chunk_id")

  val docChunkSql: String =
    s"""WITH d AS (SELECT doc_id, $toksSql AS t FROM documents),
       |k AS (
       |  SELECT doc_id, t,
       |         unnest(generate_series(0, (len(t) - 1) // $ChunkStride))
       |           AS chunk_id
       |  FROM d),
       |c AS (
       |  SELECT doc_id, chunk_id,
       |         list_slice(t, chunk_id * $ChunkStride + 1,
       |                    chunk_id * $ChunkStride + $ChunkTokens) AS c
       |  FROM k)
       |SELECT doc_id, chunk_id, len(c) AS n_tokens,
       |       md5(array_to_string(c, ' ')) AS chunk_hash
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  val textBoilerplateSql: String =
    s"""WITH ${Dedup.shingleUSql},
       |dfq AS (SELECT g, count(*) AS df FROM shingle_u GROUP BY 1)
       |SELECT u.doc_id, count(*) AS n_shingles,
       |       count(CASE WHEN dfq.df >= ${BoilerplateDf} THEN 1 END) AS n_common,
       |       ${Buckets.round6Sql(
                 s"CAST(count(CASE WHEN dfq.df >= $BoilerplateDf THEN 1 END)" +
                 " AS DOUBLE) / count(*)")} AS boilerplate_frac
       |FROM shingle_u u JOIN dfq USING (g)
       |GROUP BY u.doc_id ORDER BY u.doc_id""".stripMargin

  // ------------------------------------------------- X44 PMI collocations

  /** PMI mining parameters: minimum bigram support (PMI of rare pairs
    * is noise — the standard Church & Hanks guard) and the report size.
    */
  val PmiMinCount = 5
  val PmiTopK = 50

  /** `token_pmi`: pointwise mutual information over adjacent token
    * pairs — `PMI(a,b) = ln(c_ab · N / (c_a · c_b))`, the collocation
    * / multi-word-expression signal (Church & Hanks 1990) behind
    * phrase vocabularies and tokenizer merge tables. Top
    * [[PmiTopK]] pairs with support ≥ [[PmiMinCount]], ranked by PMI.
    *
    * Scale shape: bigram instances from the same zero-shuffle staggered
    * slice zip as [[textLmScore]]; unigram and bigram counts are
    * partial-aggregated token-keyed shuffles; the two count joins are
    * token-keyed (Zipf-head skew → AQE skew-join, same note as
    * lm_score); the grand-total N is a 1-row broadcast. The final
    * ranking is `orderBy.limit` — `TakeOrderedAndProject`, per-partition
    * top-k with no global sort. PMI is computed from exact integer
    * counts with the identical expression text in both engines, so
    * ranking on the raw double cannot diverge.
    */
  def tokenPmi(s: SparkSession, dir: String): DataFrame = {
    val bi = bigramInstances(s, dir)
    val uni = unigramCounts(s, dir)
    val big = bi.groupBy("t1", "t2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= PmiMinCount)
    val tot = bi.agg(count(lit(1)).as("n_bigrams"))
    big
      .join(uni.select(col("t1"), col("cu").as("c1")), "t1")
      .join(uni.select(col("t1").as("t2"), col("cu").as("c2")), "t2")
      .crossJoin(broadcast(tot))
      // CAST AS DOUBLE explicitly: a bare `1.0` literal is DOUBLE in
      // Spark but DECIMAL in DuckDB, and decimal division would not
      // reproduce IEEE results bit-for-bit
      .withColumn("pmi_", expr(
        "ln(CAST(c12 AS DOUBLE) * n_bigrams / (CAST(c1 AS DOUBLE) * c2))"))
      .orderBy(col("pmi_").desc, col("t1"), col("t2"))
      .limit(PmiTopK)
      .select(col("t1"), col("t2"), col("c12"),
        Buckets.round6(col("pmi_")).as("pmi"))
  }

  val tokenPmiSql: String =
    s"""WITH $bigramSqlCtes,
       |big AS (
       |  SELECT t1, t2, count(*) AS c12 FROM bi GROUP BY 1, 2
       |  HAVING count(*) >= $PmiMinCount),
       |tot AS (SELECT count(*) AS n_bigrams FROM bi),
       |scored AS (
       |  SELECT b.t1, b.t2, b.c12,
       |         ln(CAST(b.c12 AS DOUBLE) * n_bigrams /
       |            (CAST(u1.cu AS DOUBLE) * u2.cu)) AS pmi_
       |  FROM big b
       |  JOIN uni u1 ON u1.t1 = b.t1
       |  JOIN uni u2 ON u2.t1 = b.t2
       |  CROSS JOIN tot)
       |SELECT t1, t2, c12, ${Buckets.round6Sql("pmi_")} AS pmi
       |FROM scored
       |ORDER BY pmi_ DESC, t1, t2
       |LIMIT $PmiTopK""".stripMargin

  // ------------------------------------------------- X42 token entropy

  /** `text_entropy`: per-document Shannon entropy of the token
    * distribution plus the type-token ratio — the distribution-shape
    * quality signals (low entropy = repetitive/degenerate text, low TTR
    * = template): `H = ln(n) − Σ c·ln(c) / n` over the per-doc token
    * counts. Complements [[textQuality]]'s surface ratios and
    * `text_repetition`'s max-token share with the full-distribution
    * statistic Gopher-style filters gate on.
    *
    * Scale shape (r13): one explode → (doc, token) count aggregate
    * (map-side combined, doc_id-keyed) → per-doc reduce. The `Σ c·ln(c)`
    * term is an EXACT BIGINT sum of `c·wq` where `wq` is the portable-ln
    * of the count quantized to integer micro-units — order-free at any
    * layout, no libm, map-side-combinable (the r12 sorted collect_list
    * fold shipped every (term, count) pair through the shuffle).
    */
  def textEntropy(s: SparkSession, dir: String): DataFrame = {
    val cnt = docs(s, dir)
      .select(col("doc_id"), explode(expr(toksExpr)).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
    // PORTABLE-ln per (doc, term) row, quantized to micro-units, so
    // Σ c·ln(c) folds as an EXACT BIGINT sum — order-free HashAggregate
    // with map-side partials, where r12's collect_list fold shipped
    // every (term, count) pair through the shuffle AND leaned on libm
    // (the dsir cross-engine ulp class, r13-closed). The ladder runs
    // INLINE in cnt's own stage: a distinct-count lookup table would be
    // tinier per evaluation but costs a SECOND corpus explode (measured
    // — no exchange reuse reaches the lookup subtree) plus a join
    // barrier; branchy-but-linear codegen on one pass wins at any scale.
    val perDoc = PortableMath.lnColumn(cnt, "CAST(c AS DOUBLE)", "lnc")
      .withColumn("wq", expr(PortableMath.microUnitsSql("lnc")))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("c") * col("wq")).as("sum_cwq"))
    // ln(n_tokens) through the same portable chain — one ladder per doc
    PortableMath.lnColumn(perDoc, "CAST(n_tokens AS DOUBLE)", "lnn")
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        Buckets.round6(expr(
          "lnn - CAST(sum_cwq AS DOUBLE) / 1e6 / CAST(n_tokens AS DOUBLE)"))
          .as("entropy"),
        Buckets.round6(col("n_types").cast("double") / col("n_tokens")).as("ttr"))
      .orderBy("doc_id")
  }

  val textEntropySql: String =
    s"""WITH cnt AS (
       |  SELECT doc_id, t, count(*) AS c
       |  FROM (SELECT doc_id, unnest($toksSql) AS t FROM documents)
       |  GROUP BY 1, 2),
       |${PortableMath.lnCtesSql("cnt", Seq("doc_id", "c"),
           "CAST(c AS DOUBLE)", "lnc", "ec")},
       |wqr AS (SELECT doc_id, c,
       |        ${PortableMath.microUnitsSql("lnc")} AS wq FROM ecln),
       |agg AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
       |         count(*) AS n_types,
       |         CAST(sum(c * wq) AS BIGINT) AS sum_cwq
       |  FROM wqr GROUP BY 1),
       |${PortableMath.lnCtesSql("agg",
           Seq("doc_id", "n_tokens", "n_types", "sum_cwq"),
           "CAST(n_tokens AS DOUBLE)", "lnn", "en")}
       |SELECT doc_id, n_tokens, n_types,
       |       ${Buckets.round6Sql(
                 "lnn - CAST(sum_cwq AS DOUBLE) / 1e6 / CAST(n_tokens AS DOUBLE)")
               } AS entropy,
       |       ${Buckets.round6Sql("CAST(n_types AS DOUBLE) / n_tokens")} AS ttr
       |FROM enln ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------- X38 BM25 retrieval

  /** Okapi BM25 parameters — the textbook operating point (Robertson &
    * Zaragoza 2009, "The Probabilistic Relevance Framework"): k1 tunes
    * term-frequency saturation, b tunes document-length normalization.
    * Spelled as literal strings so the identical decimal text parses to
    * the identical double in both engines.
    */
  val Bm25K1 = "1.2"
  val Bm25B = "0.75"
  val Bm25TopK = 10

  /** The fixed query workload: (query_id, terms). Terms come from the
    * corpus vocabulary so every query has a non-trivial result.
    */
  val Bm25Queries: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("join", "filter"),
    1 -> Seq("window", "agg"),
    2 -> Seq("stream", "batch", "vector"))

  /** The BM25 term-score formula, shared VERBATIM between `expr(...)`
    * and the DuckDB oracle (the [[Tokens]] pattern). Identical text is
    * NOT enough on its own: a bare `0.5` literal parses as DECIMAL in
    * both engines and each then applies its own decimal-division rules
    * (Spark divides natively at decimal scale, DuckDB promotes to
    * DOUBLE), so every fractional constant is explicitly CAST AS
    * DOUBLE — after that, both engines run the same IEEE arithmetic
    * tree. Expects columns `tf` (term frequency, bigint), `df`
    * (document frequency, bigint), `dl` (document length, bigint),
    * `n_docs` (corpus size) and `avgdl` (double) in scope. The idf is
    * the +1-smoothed Lucene form (never negative for df > n/2).
    */
  private val bm25TermScore: String = {
    val half = "CAST(0.5 AS DOUBLE)"
    val k1 = s"CAST($Bm25K1 AS DOUBLE)"
    val b = s"CAST($Bm25B AS DOUBLE)"
    s"ln(1 + (n_docs - df + $half) / (df + $half)) * " +
      s"(tf * ($k1 + 1)) / " +
      s"(tf + $k1 * (1 - $b + $b * (dl / avgdl)))"
  }

  /** `bm25_search`: ranked full-text retrieval — top-[[Bm25TopK]]
    * documents per query under Okapi BM25 over the whitespace token
    * index. This is the retrieval half of a RAG / data-curation loop
    * (the lexical complement to the embedding ANN keys): score every
    * document containing ≥1 query term, rank, cut at k.
    *
    * Scale shape — the index/serving split every retrieval engine uses
    * (this repo's ANN-codebook / DSIR-weight pattern,
    * [[Dedup.sharedIndexPath]]): the FULL-vocabulary postings list
    * (`doc, dl, term, tf`), the df table and the 1-row corpus stats are
    * built ONCE per corpus epoch and persisted; a query reads the index
    * with its term list as an `In` predicate that reaches the parquet
    * scan as a PUSHED filter (row-group pruning on the term column — at
    * 100 TB the scan touches only the query terms' postings blocks, the
    * build's one corpus explode amortizes across every query, and
    * nothing re-aggregates at query time; pinned no-Generate +
    * pushed-In in PlanSpec). The per-(query, doc) score sum folds in
    * sorted term order (the powSeries order pin) so FP association can
    * never flip a rank, and top-k is a window over only the docs that
    * matched ≥1 term — a frame bounded by the query terms' postings,
    * not the corpus. df over term-restricted postings equals full-vocab
    * df for those terms, so the self-contained oracle computes
    * identical numbers.
    */
  def bm25Search(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = Dedup.sharedIndexPath(s, dir, "documents.parquet", "bm25") { p =>
      val d = docs(s, dir)
        .select(col("doc_id"), expr(toksExpr).as("toks"))
        .withColumn("dl", size(col("toks")).cast("long"))
      // postings distinct per (doc, t): count(*) over it IS the df
      d.select(col("doc_id"), col("dl"), explode(col("toks")).as("t"))
        .groupBy("doc_id", "dl", "t").agg(count(lit(1)).as("tf"))
        .write.mode("overwrite").parquet(s"$p/postings")
      s.read.parquet(s"$p/postings")
        .groupBy("t").agg(count(lit(1)).as("df"))
        .write.mode("overwrite").parquet(s"$p/df")
      d.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
        .write.mode("overwrite").parquet(s"$p/stats")
    }
    val allTerms = Bm25Queries.flatMap(_._2).distinct
    val postings = s.read.parquet(s"$root/postings")
      .filter(col("t").isin(allTerms: _*))
    val dfq = s.read.parquet(s"$root/df")
      .filter(col("t").isin(allTerms: _*))
    val stats = s.read.parquet(s"$root/stats")
    val q = Bm25Queries
      .flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "t")
    val scored = postings
      .join(broadcast(q), "t")
      .join(broadcast(dfq), "t")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", expr("CAST(sum_dl AS DOUBLE) / n_docs"))
      .withColumn("ts_", expr(bm25TermScore))
    val perDoc = scored.groupBy("query_id", "doc_id")
      .agg(
        expr("aggregate(transform(array_sort(collect_list(struct(t, ts_))), " +
          "x -> x.ts_), 0D, (a, v) -> a + v)").as("score"),
        count(lit(1)).as("n_terms"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"))
    perDoc.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= Bm25TopK)
      .select(col("query_id"), col("doc_id"),
        Buckets.round6(col("score")).as("score"), col("n_terms"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  val bm25SearchSql: String = {
    val values = Bm25Queries
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }
      .mkString(", ")
    val termList = Bm25Queries.flatMap(_._2).distinct
      .map(t => s"'$t'").mkString(", ")
    s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |dd AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM d),
       |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dd),
       |p AS (
       |  SELECT doc_id, dl, t, count(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(toks) AS t FROM dd)
       |  WHERE t IN ($termList)
       |  GROUP BY 1, 2, 3),
       |dfq AS (SELECT t, count(*) AS df FROM p GROUP BY 1),
       |q(query_id, t) AS (VALUES $values),
       |scored AS (
       |  SELECT q.query_id, p.doc_id, p.t,
       |         $bm25TermScore AS ts_
       |  FROM p JOIN q USING (t) JOIN dfq USING (t)
       |       CROSS JOIN (SELECT n_docs, CAST(sum_dl AS DOUBLE) / n_docs
       |                     AS avgdl FROM stats) s),
       |perdoc AS (
       |  SELECT query_id, doc_id,
       |         list_reduce(list(ts_ ORDER BY t), (a, b) -> a + b) AS score,
       |         count(*) AS n_terms
       |  FROM scored GROUP BY 1, 2),
       |ranked AS (
       |  SELECT query_id, doc_id, score, n_terms,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY score DESC, doc_id) AS rnk
       |  FROM perdoc)
       |SELECT query_id, doc_id, ${Buckets.round6Sql("score")} AS score, n_terms, rnk
       |FROM ranked WHERE rnk <= $Bm25TopK ORDER BY query_id, rnk""".stripMargin
  }

  // ------------------------------------------------- X50 blocklist filter

  /** Blocklist terms for [[textBlocklist]]. Drawn from the corpus
    * vocabulary so the gate actually fires on the synthetic fixture; a
    * production deployment swaps in a real wordlist (C4 used the public
    * "List of Dirty, Naughty, Obscene..." list) without touching the
    * plan shape.
    */
  val BlockTokens: Seq[String] = Seq("slow", "big", "merge")

  /** `t = 'slow' OR …` over [[BlockTokens]] — valid in both Spark SQL
    * and DuckDB (the [[Tokens.stopPred]] pattern: ONE predicate builder
    * shared by the gate, the report and both oracles, so a list tweak
    * cannot desynchronize them).
    */
  def blockPred(t: String): String =
    BlockTokens.map(w => s"$t = '$w'").mkString(" OR ")

  /** `text_blocklist`: C4-style blocklist document gate (Raffel et al.,
    * arXiv:1910.10683 §2.2 — docs containing any listed word are
    * dropped). Emits per document the total blocked-token hits, how many
    * DISTINCT blocklist entries appear, and the resulting keep flag —
    * the audit columns a curation run logs before discarding.
    *
    * Distinct from [[PipelineOps.textPiiScrub]] (regex REDACTION inside
    * kept text) — this is the whole-document drop rule.
    *
    * At 100 TB: the blocklist is a literal in the plan (a real list
    * broadcasts); per-doc work is one codegen'd `filter` over the token
    * array — a pure map-side pass, zero shuffle, nothing but the
    * presentation sort (pinned in PlanSpec).
    */
  def textBlocklist(s: SparkSession, dir: String): DataFrame = {
    val hitPred = blockPred("t")
    val lits = BlockTokens.map(w => s"'$w'").mkString(", ")
    docs(s, dir).withColumn("toks", expr(toksExpr))
      .select(col("doc_id"),
        expr(s"size(filter(toks, t -> $hitPred))").as("n_hits"),
        expr(s"size(filter(array($lits), b -> array_contains(toks, b)))")
          .as("n_hit_types"))
      .withColumn("kept", when(col("n_hits") === 0, 1).otherwise(0))
      .orderBy("doc_id")
  }

  val textBlocklistSql: String = {
    val hitPred = blockPred("t")
    val lits = BlockTokens.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id,
       |       len(list_filter($toksSql, t -> $hitPred)) AS n_hits,
       |       len(list_filter([$lits],
       |                       b -> list_contains($toksSql, b))) AS n_hit_types,
       |       CASE WHEN len(list_filter($toksSql, t -> $hitPred)) = 0
       |            THEN 1 ELSE 0 END AS kept
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------- X48 BPE merge-table train

  /** Unrolled BPE iterations for [[tokenBpeMerges]] — enough to exercise
    * merge application (iteration 2 can pick a pair containing a merged
    * symbol), small enough for an exact CTE-unrolled oracle (the Lloyd
    * pattern).
    */
  val BpeIters = 3

  /** Pairs reported per iteration (rank 1 is the merge applied). */
  val BpeTopN = 10

  /** `token_bpe_merges`: the first [[BpeIters]] iterations of BPE
    * vocabulary training (Sennrich et al., arXiv:1508.07909) — per
    * iteration the corpus-weighted count of every adjacent symbol pair,
    * the top pair becomes a merged symbol applied to every word, and the
    * next iteration counts pairs over the updated symbol sequences.
    * Emits each iteration's top-[[BpeTopN]] pairs with counts — the
    * merge-table prefix a tokenizer build would persist.
    *
    * Sennrich's own scale trick IS the plan: BPE never iterates over the
    * corpus, only over the distinct-WORD table with frequencies. The one
    * corpus pass builds `(word, freq)` (map-side-combined aggregate,
    * materialized once via eager localCheckpoint — the Lloyd-loop
    * pattern, so the final plan re-reads a tiny vocab RDD, never the
    * documents parquet: pinned in PlanSpec); each iteration is then a
    * pair explode + aggregate over ~|vocab| rows with the 1-row top pair
    * broadcast back for the merge rewrite. At 100 TB the vocab table is
    * MBs — iterations cost seconds regardless of corpus size.
    *
    * Merge application is string algebra on a DOUBLE-space-delimited
    * symbol sequence with single-space ends (`' a  b  c '`): the pair
    * pattern `' a  b '` consumes ONE space from each flanking separator
    * and the replacement `' ab '` restores them, so adjacent DISJOINT
    * occurrences keep a full match each (`a b a b` → `ab ab`) while
    * OVERLAPPING ones merge leftmost-first (`l l l` → `ll l`) — exactly
    * BPE's greedy rule, with `replace`'s leftmost-non-overlapping
    * contract identical in both engines. (A single-space encoding fails
    * the first case: the shared delimiter is consumed by the left match
    * and `a b a b` mis-merges to `ab a b` — caught in review, pinned by
    * the constructed-corpus spec.) Symbols never contain spaces, so a
    * pattern can never match across a symbol boundary.
    *
    * Degenerate-corpus edge (unreachable on the fixture contract, where
    * every doc has ≥ 10 multi-char tokens): if some iteration finds NO
    * pairs at all, its 1-row top frame is empty and the cross join
    * empties the vocab — later iterations then report zero rows rather
    * than inventing merges. The oracle's `FROM w_t, t_p` cross join has
    * the identical semantics, so the two engines cannot diverge here.
    */
  def tokenBpeMerges(s: SparkSession, dir: String): DataFrame =
    tokenBpeMergesFrom(docs(s, dir))

  /** The shared BPE chain: one vocab pass, then [[BpeIters]] rounds of
    * (pair counts → top-10 report → apply top merge). Returns each
    * round's report AND the final merged vocab — [[tokenBpeMergesFrom]]
    * consumes the reports, [[tokenBpeApplyFrom]] the encoded vocab.
    */
  private def bpeChain(d: DataFrame,
      needFinalVocab: Boolean): (Seq[DataFrame], DataFrame) = {
    // one corpus pass: distinct words with frequencies, then the initial
    // symbol sequence ' c1  c2  ...  cn ' (double-space separators,
    // single-space ends — see the merge-algebra scaladoc above).
    // Construction-cost trim (r18; r17 verdict #3), measured against
    // the r17 form (0.91 s construct + 0.18 s execute): the LAST
    // iteration's merge rewrite + checkpoint are skipped when the
    // caller never reads the final vocab ([[needFinalVocab]] = false
    // for the merges key: its last report reads the second-to-last
    // vocab) — one fewer driver-blocking job per construction. Two
    // rejected variants, for the record: a fully-lazy chain (all jobs
    // pushed into the final action) read 0.36 construct + 0.76 execute
    // — worse in total, the broadcast-merge chain serializes
    // stage-by-stage either way; and a lazily-persisted initial vocab
    // leaks the corpus-scan lineage into the final plan, breaking the
    // pinned "iterations never re-read the corpus" contract that the
    // eager checkpoint's lineage truncation guarantees.
    var words = d
      .select(explode(expr(toksExpr)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .withColumn("seq", expr(
        "concat(' ', array_join(transform(sequence(1, length(w)), " +
          "i -> substring(w, i, 1)), '  '), ' ')"))
      .localCheckpoint(true)
    def pairCounts(wt: DataFrame): DataFrame =
      wt.withColumn("syms", split(trim(col("seq")), "  "))
        .filter(size(col("syms")) >= 2)
        .select(col("f"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1)))"))
          .as("pair"))
        .groupBy("pair").agg(sum(col("f")).as("cnt"))
    val tops = (1 to BpeIters).map { it =>
      val pairs = pairCounts(words)
      val top10 = pairs.orderBy(col("cnt").desc, col("pair")).limit(BpeTopN)
        .select(lit(it).as("it"), col("pair"),
          expr("replace(pair, ' ', '')").as("merged"), col("cnt"))
      // apply merge #1 in-plan: the winning pair rides a broadcast
      // 1-row join, never a driver collect. Pattern ' A  B ' eats one
      // space of each flanking separator; replacement ' AB ' restores
      // them (disjoint adjacent occurrences each keep a full match).
      // The last rewrite exists only for the final-vocab consumer.
      if (it < BpeIters || needFinalVocab) {
        val top1 = pairs.orderBy(col("cnt").desc, col("pair")).limit(1)
          .select(col("pair").as("mp"))
        words = words.crossJoin(broadcast(top1))
          .withColumn("seq", expr(
            "replace(seq, concat(' ', replace(mp, ' ', '  '), ' '), " +
              "concat(' ', replace(mp, ' ', ''), ' '))"))
          .drop("mp")
          .localCheckpoint(true)
      }
      top10
    }
    (tops, words)
  }

  /** [[tokenBpeMerges]] over an explicit `documents(text)` frame — split
    * out so the merge algebra is testable on constructed corpora (the
    * back-to-back-pair case the fixture happens not to contain).
    */
  private[ops] def tokenBpeMergesFrom(d: DataFrame): DataFrame =
    bpeChain(d, needFinalVocab = false)._1.reduce(_.union(_))
      .orderBy(col("it"), col("cnt").desc, col("pair"))

  /** `token_bpe_apply`: ENCODE the corpus with the learned merge table —
    * the other half of the tokenizer story ([[tokenBpeMerges]] trains;
    * this applies all [[BpeIters]] merges and reports what a tokenizer
    * eval reports: corpus word/char/token volume and chars-per-token,
    * the compression a merge table buys (1.0 = characters; higher =
    * fewer, longer tokens). Same vocab-table scale shape as training —
    * encoding touches only the distinct-word table, weighted by
    * frequency, never the corpus.
    */
  def tokenBpeApply(s: SparkSession, dir: String): DataFrame =
    tokenBpeApplyFrom(docs(s, dir))

  private[ops] def tokenBpeApplyFrom(d: DataFrame): DataFrame =
    bpeChain(d, needFinalVocab = true)._2
      .withColumn("n_syms", size(split(trim(col("seq")), "  ")))
      .agg(sum(col("f")).as("n_words"),
        sum(col("f") * length(col("w"))).cast("long").as("n_chars"),
        sum(col("f") * col("n_syms")).cast("long").as("n_tokens"))
      .select(col("n_words"), col("n_chars"), col("n_tokens"),
        Buckets.round6(col("n_chars").cast("double") / col("n_tokens"))
          .as("chars_per_token"))

  /** Oracle: the Lloyd-unroll pattern (see `Similarity.kmeansTrainedCtes`)
    * as an exact CTE chain — `w0, p1, t1, w1, p2, …` — with the identical
    * seq/pair/replace algebra (DuckDB's 1-based list indexing matches
    * `element_at`; `range(1, n)` is Spark's `sequence(1, n-1)`).
    */
  /** The CTE unroll shared by both BPE oracles: `wf, w0, p1, t1, w1, …,
    * w_BpeIters` — the merges oracle reads the `p_it` reports, the apply
    * oracle the final `w_BpeIters` (an unreferenced CTE costs nothing in
    * DuckDB).
    */
  private lazy val bpeCtesSql: String = {
    def pairsCte(name: String, wt: String): String =
      s"""$name AS (
         |  SELECT pair, CAST(sum(f) AS BIGINT) AS cnt FROM (
         |    SELECT f, unnest(list_transform(range(1, len(syms)),
         |                     i -> syms[i] || ' ' || syms[i + 1])) AS pair
         |    FROM (SELECT f, string_split(trim(seq), '  ') AS syms FROM $wt)
         |    WHERE len(syms) >= 2)
         |  GROUP BY 1)""".stripMargin
    def mergeCte(wNew: String, wOld: String, p: String): String =
      s"""t$p AS (SELECT pair FROM $p ORDER BY cnt DESC, pair LIMIT 1),
         |$wNew AS (
         |  SELECT w, f, replace(seq, ' ' || replace(t$p.pair, ' ', '  ') || ' ',
         |                       ' ' || replace(t$p.pair, ' ', '') || ' ') AS seq
         |  FROM $wOld, t$p)""".stripMargin
    val iters = (1 to BpeIters).map { it =>
      pairsCte(s"p$it", s"w${it - 1}") + ",\n" +
        mergeCte(s"w$it", s"w${it - 1}", s"p$it")
    }.mkString(",\n")
    s"""wf AS (
       |  SELECT w, count(*) AS f FROM (
       |    SELECT unnest($toksSql) AS w FROM documents)
       |  WHERE length(w) > 0 GROUP BY 1),
       |w0 AS (
       |  SELECT w, f,
       |         ' ' || array_to_string(list_transform(range(1, length(w) + 1),
       |                                i -> substr(w, i, 1)), '  ') || ' ' AS seq
       |  FROM wf),
       |$iters""".stripMargin
  }

  val tokenBpeMergesSql: String = {
    val branches = (1 to BpeIters).map { it =>
      s"""SELECT * FROM (
         |  SELECT $it AS it, pair, replace(pair, ' ', '') AS merged, cnt
         |  FROM p$it ORDER BY cnt DESC, pair LIMIT $BpeTopN)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $bpeCtesSql
       |$branches
       |ORDER BY it, cnt DESC, pair""".stripMargin
  }

  val tokenBpeApplySql: String =
    s"""WITH $bpeCtesSql
       |SELECT CAST(sum(f) AS BIGINT) AS n_words,
       |       CAST(sum(f * length(w)) AS BIGINT) AS n_chars,
       |       CAST(sum(f * len(string_split(trim(seq), '  '))) AS BIGINT)
       |         AS n_tokens,
       |       ${Buckets.round6Sql(
                 "CAST(sum(f * length(w)) AS DOUBLE) / " +
                 "sum(f * len(string_split(trim(seq), '  ')))")}
       |         AS chars_per_token
       |FROM w$BpeIters""".stripMargin
}
