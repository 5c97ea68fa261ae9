package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant tests for the LLM-pipeline extension operators, run against
  * the sf0.001 testdata (50 documents / 50 embeddings — fast).
  */
class ExtOpsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("knn_classify_ann: same contract as the brute key, index candidates") {
    val bf = Similarity.knnClassify(spark, dir).collect()
    val ann = Similarity.knnClassifyAnn(spark, dir).collect()
    // identical schema and query set: the vote stage is the SAME code
    // (knnVote); only the candidate generator differs
    assert(Similarity.knnClassify(spark, dir).columns.toSeq ==
      Similarity.knnClassifyAnn(spark, dir).columns.toSeq)
    assert(bf.map(_.getLong(0)).toSeq == ann.map(_.getLong(0)).toSeq)
    // votes bounded by k on both paths
    assert(ann.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= Similarity.KnnK))
    // the true labels (input passthrough) agree row for row
    assert(bf.map(r => (r.getLong(0), r.get(1))).toSeq ==
      ann.map(r => (r.getLong(0), r.get(1))).toSeq)
  }

  test("dedup_substring_capped: cap only ever removes Zipf-head evidence") {
    val full = Dedup.dedupSubstring(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val capped = Dedup.dedupSubstringCapped(spark, dir).collect()
    assert(capped.nonEmpty)
    capped.foreach { r =>
      val (ns, nd) = full(r.getLong(0))
      // capped counts are a subset of the uncapped ones
      assert(r.getLong(1) <= ns && r.getLong(2) <= nd)
      // the cap removes the SAME instances from both counters: what
      // leaves n_spans is by definition a >cap duplicated span
      assert(ns - r.getLong(1) == nd - r.getLong(2))
    }
  }

  test("dedup_exact partitions the corpus: group sizes sum to doc count") {
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    val groups = Dedup.dedupExact(spark, dir)
    assert(groups.agg(sum("n")).collect().head.getLong(0) == total)
    assert(groups.filter(col("n") < 1).count() == 0)
  }

  test("dedup_minhash candidates are a subset of exact ngram-jaccard pairs") {
    val exact = Dedup.dedupNgramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.dedupMinhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact)) // LSH never invents pairs (post-verification)
    // planted near-dups have jaccard >= 0.9 → b=8,r=2 recall ≈ 1
    assert(lsh == exact)
  }

  test("dedup_simhash fingerprints are deterministic 64-bit") {
    val a = Dedup.dedupSimhash(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.nonEmpty)
    // 64-bit fingerprints actually use the upper bits (some doc's bit 63
    // is set ⇒ negative two's-complement value) — the 16-bit era is over
    assert(a.exists(_._2 < 0) || a.exists(_._2 >= 65536L))
    val b = Dedup.dedupSimhash(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
  }

  test("dedup_simhash_pairs banding is COMPLETE for the Hamming radius") {
    // pigeonhole: distance <= 3 over 4 bands forces agreement on >= 1
    // full band, so the banded candidates must reproduce the brute-force
    // pair set exactly — not approximately
    val fps = Dedup.dedupSimhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- fps; (ib, hb) <- fps if ia < ib
      h = java.lang.Long.bitCount(ha ^ hb) if h <= Dedup.SimhashHammingMax
    } yield (ia, ib, h)).toSet
    val banded = Dedup.dedupSimhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute)
  }

  test("text_lm_score: negative log-probs, one bigram per adjacent pair") {
    val rows = TextAnalysis.textLmScore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(rows.length == 500)
    // ln of a probability strictly below 1 (V > any count) is negative
    assert(rows.forall(_._2 < 0))
    // every doc has >= 10 tokens in the fixture -> >= 9 bigram instances
    assert(rows.forall(_._3 >= 9))
    val again = TextAnalysis.textLmScore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(rows.sameElements(again)) // deterministic incl. the rounding
  }

  test("similarity_topk: exactly k neighbors per query, scores non-increasing") {
    val rows = Similarity.similarityTopk(spark, dir).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == Similarity.NumQueries)
    for ((_, rs) <- byQuery) {
      assert(rs.length == Similarity.TopK)
      val scores = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(rs.forall(r => r.getLong(1) != r.getLong(0))) // never self
    }
  }

  test("similarity_topk_agg (typed Aggregator) matches the window top-k exactly") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows(Similarity.similarityTopkAgg(spark, dir)) ==
      rows(Similarity.similarityTopk(spark, dir)))
  }

  test("similarity_ann_ivf scores are a subset of the brute-force candidates' scores") {
    // ANN contract: at most TopK hits per query (a probed cluster set can
    // hold fewer candidates than k — that IS approximate search), every
    // hit scored identically to the exact path, never the query itself
    val exact = Similarity.similarityTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ann = Similarity.similarityAnnIvf(spark, dir).collect()
    assert(ann.nonEmpty && ann.length <= Similarity.NumQueries * Similarity.TopK)
    val perQuery = ann.groupBy(_.getLong(0))
    assert(perQuery.values.forall(_.length <= Similarity.TopK))
    for (r <- ann) {
      assert(r.getLong(1) != r.getLong(0))
      val k = (r.getLong(0), r.getLong(1))
      exact.get(k).foreach(s => assert(math.abs(s - r.getDouble(2)) < 1e-9))
    }
  }

  test("similarity_ann_kmeans trains centroids and keeps the ANN contract") {
    // training must actually move the codebook: the serving assignment
    // may not be identical to the untrained md5-sample partition
    val exact = Similarity.similarityTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ann = Similarity.similarityAnnKmeans(spark, dir).collect()
    assert(ann.nonEmpty && ann.length <= Similarity.NumQueries * Similarity.TopK)
    val perQuery = ann.groupBy(_.getLong(0))
    assert(perQuery.values.forall(_.length <= Similarity.TopK))
    for (r <- ann) {
      assert(r.getLong(1) != r.getLong(0))
      val k = (r.getLong(0), r.getLong(1))
      exact.get(k).foreach(s => assert(math.abs(s - r.getDouble(2)) < 1e-9))
    }
    // determinism: two runs produce identical rows (the k-means loop has
    // no RNG — seeds, assignments and means are all hash/order-pinned)
    val again = Similarity.similarityAnnKmeans(spark, dir).collect()
    assert(ann.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("multimodal_extract stub features derive from payload bytes") {
    val feats = Multimodal.multimodalExtract(spark, dir)
    val check = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        length(col("text")).cast("long").as("exp_len"),
        substring(md5(col("text")), 1, 8).as("exp_sig"))
    val joined = feats.join(check, "doc_id")
    assert(joined.filter(col("byte_len") =!= col("exp_len")).count() == 0)
    assert(joined.filter(col("sig8") =!= col("exp_sig")).count() == 0)
    assert(joined.filter(col("width") >= 640 || col("height") >= 480).count() == 0)
  }

  test("text_langid predictions are in the label set and deterministic") {
    val langs = Set("de", "en", "es", "fr", "zh")
    val rows = TextAnalysis.textLangid(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => langs.contains(r.getString(2))))
  }

  test("text_quality features are in valid ranges") {
    val rows = TextAnalysis.textQuality(spark, dir).collect()
    for (r <- rows) {
      assert(r.getInt(1) > 0)
      val ttr = r.getDouble(2); assert(ttr > 0 && ttr <= 1)
      val sr = r.getDouble(3); assert(sr >= 0 && sr <= 1)
      assert(r.getDouble(4) > 0)
    }
  }

  test("shared tmp roots: a superseded freshness key prunes the old root") {
    val name = s"t${System.nanoTime}"
    val dataDir = java.nio.file.Files.createTempDirectory("idx_data")
    val input = dataDir.resolve("documents.parquet")
    java.nio.file.Files.writeString(input, "v1")
    val p1 = Dedup.sharedIndexPath(spark, dataDir.toString, "documents.parquet",
      name)(p => { new java.io.File(p).mkdirs(); () })
    assert(new java.io.File(p1).isDirectory)
    // regenerate the driving input (length moves → new freshness digest)
    java.nio.file.Files.writeString(input, "v2-longer")
    val p2 = Dedup.sharedIndexPath(spark, dataDir.toString, "documents.parquet",
      name)(p => { new java.io.File(p).mkdirs(); () })
    assert(p1 != p2)
    // exactly ONE root remains for this index name: the fresh key's
    val left = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith(s"graft_${name}_")).map(_.getPath)
    assert(left.toSeq == Seq(p2))
  }

  test("shared tmp roots: two LIVE datasets under one index name coexist") {
    val name = s"t${System.nanoTime}"
    def mk(): String = {
      val d = java.nio.file.Files.createTempDirectory("idx_data")
      java.nio.file.Files.writeString(d.resolve("documents.parquet"), d.toString)
      Dedup.sharedIndexPath(spark, d.toString, "documents.parquet",
        name)(p => { new java.io.File(p).mkdirs(); () })
    }
    val (p1, p2) = (mk(), mk())
    assert(p1 != p2)
    // a second dataset's root must NOT prune the first's — only a
    // regenerated input under the SAME identity half is superseded
    assert(new java.io.File(p1).isDirectory && new java.io.File(p2).isDirectory)
  }

  test("embed_quantize: zero vector reconstructs as zeros, unit vector exactly") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("quant_data").toString
    Seq(
      (0L, Array.fill(4)(0.0f), 0),
      // one hot ±127-representable: quantization is EXACT → mse 0, cos 1
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.5f, -1.0f, 0.25f, 0.125f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val r = Similarity.embedQuantize(spark, d).collect()
      .map(x => x.getLong(0) -> x).toMap
    // all-zero vector: scale 0, guarded division → zero reconstruction,
    // cos undefined (0/0 → NULL in both engines)
    assert(r(0L).getDouble(1) == 0.0 && r(0L).getDouble(2) == 0.0)
    assert(r(0L).isNullAt(4) || r(0L).getDouble(4).isNaN)
    // exact case: scale 1/127, every v_i/scale an integer → zero error
    assert(r(1L).getDouble(2) == 0.0 && r(1L).getDouble(3) == 0.0)
    assert(r(1L).getDouble(4) == 1.0)
    // general case: bounded error (|err| <= scale/2), near-1 cosine
    assert(r(2L).getDouble(3) <= (1.0 / 127) / 2 + 1e-9)
    assert(r(2L).getDouble(4) > 0.999)
  }

  test("decontaminate_frac: planted duplicate yields frac 1, short doc NULLs") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("frac_data").toString
    val benchText = "alpha beta gamma delta epsilon"
    Seq(
      // benchmark side (doc_id < BenchmarkDocs)
      (0L, benchText, "en", "web", benchText.length.toLong),
      (1L, "ab", "en", "web", 2L), // < 3 tokens → no shingles → NULLs
      // corpus side: an exact copy of bench 0, and an unrelated doc
      (100L, benchText, "en", "web", benchText.length.toLong),
      (101L, "zeta eta theta iota kappa", "en", "web", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val r = Curation.decontaminateFrac(spark, d).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getLong(2) == 100L, "worst contaminator should be the copy")
    assert(r(0L).getDouble(4) == 1.0, "full-copy coverage fraction must be 1")
    assert(r(1L).isNullAt(1) && r(1L).isNullAt(2) && r(1L).isNullAt(4))
  }

  test("shared tmp roots: dead-owner siblings are pruned on creation") {
    val name = s"t${System.nanoTime}"
    // a pid that is provably not alive on this host
    val deadPid = Iterator.iterate(999999L)(_ - 1)
      .find(p => !ProcessHandle.of(p).isPresent).get
    val key = "0" * 32
    val orphan = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_${name}_${key}_p$deadPid")
    assert(orphan.mkdirs())
    val dataDir = java.nio.file.Files.createTempDirectory("idx_data")
    java.nio.file.Files.writeString(dataDir.resolve("documents.parquet"), "v1")
    Dedup.sharedIndexPath(spark, dataDir.toString, "documents.parquet",
      name)(p => { new java.io.File(p).mkdirs(); () })
    assert(!orphan.exists(), "dead-pid orphan root should have been pruned")
  }

  test("dedup_incremental: bloom+confirm path is exactly the anti-join") {
    import spark.implicits._
    val d = spark.read.parquet(s"$dir/documents.parquet")
    // the plain anti-join the bloom split must reproduce EXACTLY
    // (false positives filtered by the confirm join; negatives bypass)
    val ref = d.filter(col("doc_id") % 3 =!= 0).select(col("text"))
    val batch = d.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"))
      .unionByName(d.filter(col("doc_id") % 15 === 1)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text")))
    val expected = batch.join(ref, Seq("text"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    val got = Dedup.dedupIncremental(spark, dir).select("doc_id")
      .as[Long].collect().toSet
    assert(got == expected)
    // every re-crawled duplicate (+10M ids, text already in the
    // reference by construction) must have been dropped
    assert(!got.exists(_ >= 10000000L))
    assert(got.nonEmpty)
  }

  test("BloomMightContain: no false negatives, bounded false positives") {
    import spark.implicits._
    val items = (0L until 500L).map(_ * 7919L)
    val src = items.toDF("h")
    val bf = src.stat.bloomFilter("h", 1000L, 0.03)
    val probe = graft.functions.BloomMightContain.probe(col("h"), bf)
    // members: a bloom filter NEVER rejects an inserted item
    assert(src.filter(probe).count() == items.size)
    // non-members: fp rate should be near the configured 3%
    val miss = (1L to 2000L).map(_ * 7919L + 3L).toDF("h")
    val fp = miss.filter(probe).count()
    assert(fp < 200, s"false-positive count $fp far above the 3% design point")
  }

  test("text_boilerplate matches a collect-side recomputation") {
    val got = TextAnalysis.textBoilerplate(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // brute-force recompute from the raw corpus on the driver
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase(java.util.Locale.ROOT).split(" ").toSeq)
    val shingles = texts.map { case (id, t) =>
      id -> t.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }.toMap
    val df = shingles.values.flatten.groupBy(identity).map { case (g, o) => g -> o.size }
    for ((id, ss) <- shingles) {
      val common = ss.count(g => df(g) >= TextAnalysis.BoilerplateDf)
      val (n, c, f) = got(id)
      assert(n == ss.size && c == common, s"doc $id")
      assert(math.abs(f - common.toDouble / ss.size) < 1e-6, s"doc $id frac")
    }
  }

  test("doc_chunk covers every token and matches a driver recompute") {
    val got = TextAnalysis.docChunk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt) ->
        ((r.getLong(2).toInt, r.getString(3)))).toMap
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase(java.util.Locale.ROOT).split(" ").toSeq)
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    var total = 0
    for ((id, t) <- texts) {
      val kMax = (t.size - 1) / TextAnalysis.ChunkStride
      for (k <- 0 to kMax) {
        val c = t.slice(k * TextAnalysis.ChunkStride,
          k * TextAnalysis.ChunkStride + TextAnalysis.ChunkTokens)
        val (n, h) = got((id, k))
        assert(n == c.size, s"doc $id chunk $k size")
        assert(h == hex(java.security.MessageDigest.getInstance("MD5")
          .digest(c.mkString(" ").getBytes("UTF-8"))), s"doc $id chunk $k")
        total += 1
      }
      // coverage: the last chunk reaches the final token
      assert(kMax * TextAnalysis.ChunkStride + TextAnalysis.ChunkTokens
        >= t.size || kMax * TextAnalysis.ChunkStride < t.size)
    }
    assert(got.size == total, "engine emitted chunks the recompute did not")
  }

  test("dsir_weight: target-source documents score above the rest") {
    val w = Curation.dsirWeight(spark, dir)
      .join(spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source")), "doc_id")
    val isT = col("source").isin(Curation.DsirTargetSources: _*)
    val Array(tgt, rest) = w.agg(
      avg(when(isT, col("dsir_weight"))),
      avg(when(!isT, col("dsir_weight")))).collect().head
      .toSeq.map(_.asInstanceOf[Double]).toArray
    // the whole point of the importance weight: documents drawn from the
    // target distribution must rank above the rest on average
    assert(tgt > rest, s"target mean $tgt not above non-target mean $rest")
    // and the weight is a proper log-ratio mean: finite everywhere
    assert(w.filter(col("dsir_weight").isNull || isnan(col("dsir_weight")))
      .count() == 0)
  }

  test("dsir_serve_parts is pure BIGINT and derives dsir_weight exactly") {
    val parts = Curation.dsirServeParts(spark, dir)
    // the r14 triangulation contract: zero doubles on the output edge
    assert(parts.schema.fields.map(f => f.name -> f.dataType.typeName)
      .toSeq == Seq("doc_id" -> "long", "n_tokens" -> "long",
        "sum_wqn" -> "long"))
    // the emitted weight is EXACTLY floor(S/n + 1/2)/1e6 of the parts —
    // recomputed here in BigInt so the test itself has no float hazard
    val w = Curation.dsirWeight(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    parts.collect().foreach { r =>
      val (id, n, sw) = (r.getLong(0), BigInt(r.getLong(1)),
        BigInt(r.getLong(2)))
      val micro = (2 * sw + n).mod(2 * n) match {
        case pm => (2 * sw + n - pm) / (2 * n)
      }
      assert(w(id) == micro.toDouble / 1e6, s"doc $id")
    }
  }

  test("dsir_select keeps exactly K docs, biased toward target sources") {
    // sf0.01 (500 docs), not the suite's sf0.001: K = 100 must be a
    // strict subset for the selection to exercise anything
    val selDir = "/root/testdata/sf0.01"
    val sel = Curation.dsirSelect(spark, selDir)
    val rows = sel.collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    assert(rows.map(_.getInt(2)).sum == Curation.DsirSelectK)
    // Gumbel-top-k with importance weights must OVERSAMPLE the target
    // distribution relative to its corpus share — the whole point of
    // the resample (kept target fraction > corpus target fraction)
    val src = spark.read.parquet(s"$selDir/documents.parquet")
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val isT = (id: Long) => Curation.DsirTargetSources.contains(src(id))
    val keptT = rows.filter(_.getInt(2) == 1).count(r => isT(r.getLong(0)))
    val corpusT = src.keys.count(isT)
    assert(keptT.toDouble / Curation.DsirSelectK >
      corpusT.toDouble / src.size,
      s"kept target share $keptT/${Curation.DsirSelectK} not above " +
        s"corpus share $corpusT/${src.size}")
    // the ranking key is exact integer micro-units: no NaN/null anywhere
    assert(rows.forall(!_.isNullAt(1)))
    // the threshold-broadcast scalable form is row-identical (they
    // share one oracle, so this parity is load-bearing)
    val scal = Curation.dsirSelectScalable(spark, selDir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ==
      scal.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq)
    // TakeOrderedAndProject (per-partition top-k + k-row merge), never
    // a global sort, feeds the scalable form's threshold
    val plan = Curation.dsirSelectScalable(spark, selDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "threshold path must plan TakeOrderedAndProject")
    // (no ≤K-corpus arm: every testdata SF carries ≥500 docs; a corpus
    // at or under K keeps everything because the boundary row is then
    // the global worst and every row passes the at-or-better rule —
    // the same predicate the 500-doc parity above exercises)
  }

  test("dedup_semantic equals a brute-force within-cluster recompute") {
    val out = Similarity.dedupSemantic(spark, dir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    }.toMap
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(out.size == emb.size, "one verdict row per vector")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i)
        na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // the engine's own cluster map is the ground truth for membership
    // (the codebook math is oracle-checked separately); re-derive the
    // dup rule from raw vectors: v is dup iff SOME earlier same-cluster
    // u has cosine >= tau, and dup_of is the argmax-cosine such u
    val byCluster = out.toSeq.groupBy(_._2._1)
    for ((_, members) <- byCluster) {
      val ids = members.map(_._1).sorted
      for (v <- ids) {
        val cands = ids.filter(_ < v)
          .map(u => (u, cos(emb(u), emb(v))))
          .filter(_._2 >= Similarity.SemDedupTau - 1e-9)
        val (_, isDup, dupOf) = out(v)
        assert((isDup == 1) == cands.nonEmpty, s"vec $v dup flag")
        if (cands.nonEmpty) {
          val want = cands.maxBy { case (u, c) => (c, -u) }._1
          assert(dupOf.contains(want), s"vec $v dup_of")
        } else assert(dupOf.isEmpty, s"vec $v spurious dup_of")
      }
    }
  }

  test("dedup_substring matches a sliding-window driver recompute") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase(java.util.Locale.ROOT).split(" ", -1).toSeq)
      .toMap
    val spans = docs.toSeq.flatMap { case (id, t) =>
      t.sliding(Dedup.SubstringW).filter(_.size == Dedup.SubstringW)
        .map(w => (id, w.mkString(" "))).toSeq
    }
    // suffix-array rule: >= 2 occurrences anywhere, within-doc included
    val occFreq = spans.groupBy(_._2).view.mapValues(_.size).toMap
    val want = spans.groupBy(_._1).map { case (id, ss) =>
      val nDup = ss.count(s => occFreq(s._2) >= 2)
      id -> ((ss.size.toLong, nDup.toLong))
    }
    val got = Dedup.dedupSubstring(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4)))).toMap
    assert(got.size == docs.size)
    for ((id, (nSpans, nDup)) <- want) {
      val (gS, gD, frac, flag) = got(id)
      assert(gS == nSpans && gD == nDup, s"doc $id span counts")
      assert(math.abs(frac - nDup.toDouble / nSpans) < 1e-6, s"doc $id frac")
      assert((flag == 1) == (frac >= Dedup.SubstringDupFrac), s"doc $id flag")
    }
  }

  test("mix_temperature fills each source budget by a hash-prefix rule") {
    val rows = PipelineOps.mixTemperature(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getInt(3), r.getLong(4), r.getInt(5)))
    // recompute the sqrt-temperature budgets with the same sorted fold —
    // the engine's emitted target AND its kept flags must both match, so
    // dropping the sqrt (or breaking the fold order) fails here
    val bySrc = rows.groupBy(_._2)
    val srcTokens = bySrc.view.mapValues(_.map(_._3).sum).toMap
    val denom = srcTokens.toSeq.sortBy(_._1).map(x => math.sqrt(x._2.toDouble))
      .foldLeft(0.0)(_ + _)
    val grand = srcTokens.values.sum
    for ((src, rs) <- bySrc) {
      val target = math.round(
        PipelineOps.MixBudgetFrac * grand * math.sqrt(srcTokens(src).toDouble) / denom)
      assert(rs.forall(_._5 == target), s"$src emitted target != recompute")
      val byRank = rs.sortBy(_._4)
      // kept docs form a rank prefix, and the prefix is exactly the one
      // whose before-cumulative token count is still under the target
      var cum = 0L
      for ((_, _, n, _, _, kept) <- byRank) {
        assert((kept == 1) == (cum < target), s"$src kept rule at cum=$cum")
        cum += n
      }
      val kept = byRank.filter(_._6 == 1)
      val keptToks = kept.map(_._3).sum
      // budget met whenever the source can cover it (down-sampling only:
      // an exhausted source keeps everything and under-fills)
      if (target > 0)
        assert(keptToks >= math.min(target, srcTokens(src)), s"$src unfilled")
      // and never overshoots by more than the crossing doc
      if (kept.nonEmpty)
        assert(keptToks - kept.map(_._3).max < math.max(target, 1),
          s"$src overshoot: kept=$keptToks target=$target")
    }
  }

  test("fetch_asof carries the latest point at-or-before each grid mark") {
    val pts = Buckets.pointsInRange(spark, dir, Buckets.FromS, Buckets.UntilS)
      .filter(col("value").isNotNull) // the operator's null-point drop
      .groupBy("metric", "ts_s").agg(max("value").as("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val out = Fetch.fetchAsof(spark, dir).collect()
    assert(out.nonEmpty)
    val byMetric = pts.groupBy(_._1)
    for (r <- out) {
      val (m, g) = (r.getString(0), r.getLong(1))
      val eligible = byMetric(m).filter(_._2 <= g)
      if (eligible.isEmpty) {
        assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4),
          s"$m@$g carries a value with no preceding point")
      } else {
        val lastTs = eligible.map(_._2).max
        // tie-reduce already applied in pts: one value per (metric, ts)
        val want = eligible.filter(_._2 == lastTs).head._3
        assert(r.getLong(3) == lastTs, s"$m@$g asof_ts")
        assert(math.abs(r.getDouble(2) - want) < 1e-6, s"$m@$g value")
        assert(r.getLong(4) == g - lastTs, s"$m@$g staleness")
      }
    }
    // full grid: every metric present in the window has all 24 marks
    val marks = (Buckets.UntilS - Buckets.FromS) / Fetch.AsofStepS
    for ((m, rs) <- out.groupBy(_.getString(0)))
      assert(rs.length == marks, s"$m grid incomplete: ${rs.length}")
  }

  test("fetch_asof_scalable is row-identical to the single-window form") {
    // the two-pass block-stitched carry must reproduce the global carry
    // byte-for-byte — the same pin sessionize_scalable carries
    val direct = Fetch.fetchAsof(spark, dir).collect().map(_.toString)
    val scalable = Fetch.fetchAsofScalable(spark, dir).collect().map(_.toString)
    assert(direct.nonEmpty && direct.toSeq == scalable.toSeq)
  }

  test("source_overlap reports the full pair lattice with true jaccards") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split(' ').toSeq,
        r.getString(3)))
    // driver recompute of per-source distinct shingle sets
    val bySource = docs.groupBy(_._3).view.mapValues(_.flatMap {
      case (_, toks, _) => toks.sliding(3).filter(_.size == 3).map(_.mkString(" "))
    }.toSet).toMap
    val out = Curation.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val k = bySource.size
    assert(out.length == k * (k - 1) / 2, "pair lattice incomplete")
    for ((a, b, na, nb, shared, j) <- out) {
      assert(a < b, s"pair ($a,$b) not ordered")
      assert(na == bySource(a).size && nb == bySource(b).size,
        s"($a,$b) set sizes")
      val wantShared = bySource(a).intersect(bySource(b)).size
      assert(shared == wantShared, s"($a,$b) shared $shared != $wantShared")
      val wantJ = wantShared.toDouble / (na + nb - wantShared)
      assert(math.abs(j - wantJ) < 1e-6 && j >= 0 && j <= 1, s"($a,$b) jaccard")
    }
  }

  test("text_entropy matches a driver recompute and its bounds") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(' ').toSeq)
      .toMap
    val out = TextAnalysis.textEntropy(spark, dir).collect()
    assert(out.length == docs.size)
    for (r <- out) {
      val (id, n, types) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (h, ttr) = (r.getDouble(3), r.getDouble(4))
      val toks = docs(id)
      val counts = toks.groupBy(identity).view.mapValues(_.size).toMap
      assert(n == toks.length && types == counts.size, s"doc $id counts")
      val want = math.log(n.toDouble) -
        counts.toSeq.sortBy(_._1).map { case (_, c) =>
          c.toDouble * math.log(c.toDouble) }.sum / n
      assert(math.abs(h - want) < 1e-5, s"doc $id entropy $h != $want")
      // 0 <= H <= ln(n_types); TTR consistent
      assert(h >= -1e-6 && h <= math.log(types.toDouble) + 1e-6,
        s"doc $id entropy out of bounds")
      assert(math.abs(ttr - types.toDouble / n) < 2e-6, s"doc $id ttr")
    }
  }

  test("fetch_downsample keeps per-bucket max-area points and endpoints") {
    // driver recompute of the LTOB rule over the same per-minute agg
    val agg = Buckets.pointsInRange(spark, dir, Buckets.FromS, Buckets.UntilS)
      .filter(col("metric") === "view")
      .groupBy(Buckets.alignTs(col("ts_s"), 60).as("ts_s"))
      .agg(round(avg(col("value")), 6).as("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val out = Fetch.fetchDownsample(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val (minTs, maxTs) = (agg.head._1, agg.last._1)
    def area(i: Int): Double = {
      val (xp, yp) = agg(i - 1); val (x, y) = agg(i); val (xn, yn) = agg(i + 1)
      math.abs((xp - xn) * (y - yp) - (xp - x).toDouble * (yn - yp)) / 2
    }
    val byBucket = agg.zipWithIndex
      .groupBy { case ((ts, _), _) => (ts - Buckets.FromS) / Fetch.LtobBucketS }
    assert(out.length == byBucket.size) // exactly one survivor per occupied bucket
    for ((b, ts, v) <- out) {
      val members = byBucket(b)
      val want =
        members.find { case ((t, _), _) => t == minTs || t == maxTs } match {
          case Some(((t, _), _)) => t
          case None =>
            members.maxBy { case ((t, _), i) => (area(i), -t) }._1._1
        }
      assert(ts == want, s"bucket $b picked $ts, recompute wants $want")
      assert(math.abs(v - agg.find(_._1 == ts).get._2) < 1e-9, s"bucket $b value")
    }
  }

  test("token_pmi matches a driver recompute of the Church-Hanks score") {
    val toks = spark.read.parquet(s"$dir/documents.parquet").collect()
      .map(_.getString(1).toLowerCase.split(' ').toSeq)
    val bi = toks.flatMap(t => t.zip(t.drop(1)))
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val big = bi.groupBy(identity).view.mapValues(_.size).toMap
    val n = bi.length.toDouble
    val out = TextAnalysis.tokenPmi(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty && out.length <= TextAnalysis.PmiTopK)
    var prev = Double.MaxValue
    for ((t1, t2, c12, pmi) <- out) {
      assert(c12 == big((t1, t2)) && c12 >= TextAnalysis.PmiMinCount,
        s"($t1,$t2) support")
      val want = math.log(c12 * n / (uni(t1).toDouble * uni(t2)))
      assert(math.abs(pmi - want) < 1e-5, s"($t1,$t2) pmi $pmi != $want")
      assert(pmi <= prev + 1e-6, s"($t1,$t2) not sorted by pmi")
      prev = pmi
    }
    // the report is the TRUE top-k: no excluded pair scores above the tail
    val cutoff = out.last._4
    val excluded = big.collect {
      case ((t1, t2), c) if c >= TextAnalysis.PmiMinCount &&
          !out.exists(o => o._1 == t1 && o._2 == t2) =>
        math.log(c * n / (uni(t1).toDouble * uni(t2)))
    }
    assert(excluded.forall(_ <= cutoff + 1e-6), "a higher-PMI pair was dropped")
  }

  test("bm25_search returns only docs containing a query term, ranked") {
    val rows = TextAnalysis.bm25Search(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getInt(4)))
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$dir/documents.parquet").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(' ').toSet)
      .toMap
    val terms = TextAnalysis.Bm25Queries.toMap
    for ((qid, did, score, nTerms, _) <- rows) {
      val hit = terms(qid).count(docs(did).contains)
      assert(hit >= 1, s"q$qid doc $did has no query term")
      assert(nTerms == hit, s"q$qid doc $did n_terms $nTerms != $hit")
      assert(score > 0, s"q$qid doc $did non-positive score")
    }
    // ranks are contiguous from 1 and scores are non-increasing in rank
    for ((qid, rs) <- rows.groupBy(_._1)) {
      val byRank = rs.sortBy(_._5)
      assert(byRank.map(_._5).toSeq == (1 to byRank.length),
        s"q$qid ranks not contiguous")
      assert(byRank.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3; case _ => true
      }, s"q$qid scores increase with rank")
    }
  }

  test("embed_project preserves norms in the JL sense") {
    val rows = Similarity.embedProject(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.length == n) // one audit row per vector, zero vectors included
    // per-vector distortion stays inside loose JL bounds for 64→16 dims,
    // and the corpus mean concentrates near 1 (the unbiasedness of the
    // 1/sqrt(outDim) scaling — the property the audit exists to check)
    for ((id, no, np, d) <- rows) {
      assert(no > 0, s"vec $id zero norm in testdata?")
      assert(math.abs(d - np / no) < 2e-6, s"vec $id distortion != ratio")
      assert(d > 0.2 && d < 2.5, s"vec $id distortion $d outside JL bounds")
    }
    val mean = rows.map(_._4).sum / rows.length
    assert(mean > 0.85 && mean < 1.15, s"mean distortion $mean far from 1")
  }

  test("knn_classify votes are consistent with the brute top-k neighbors") {
    val out = Similarity.knnClassify(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getInt(4)))
    assert(out.length == math.min(Similarity.KnnQueries,
      spark.read.parquet(s"$dir/embeddings.parquet").count()).toInt)
    val labels = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    for ((vid, lab, pred, votes, correct) <- out) {
      assert(lab == labels(vid), s"vec $vid true label mismatch")
      assert(votes >= 1 && votes <= Similarity.KnnK, s"vec $vid vote count")
      assert((correct == 1) == (pred == lab), s"vec $vid correct flag")
    }
  }

  test("mine_negatives emits true hard negatives with consistent margins") {
    val labels = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val rows = Similarity.mineNegatives(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getInt(6)))
    assert(rows.nonEmpty)
    for ((qid, posId, ps, negId, ns, margin, _) <- rows) {
      assert(labels(posId) == labels(qid), s"q$qid positive label differs")
      assert(labels(negId) != labels(qid), s"q$qid negative shares label")
      assert(posId != qid && negId != qid, s"q$qid mined itself")
      // margin is the pos/neg score gap (both sides round to 6 at the
      // edge, so allow one ulp of the rounded grid)
      assert(math.abs(margin - (ps - ns)) < 2e-6, s"q$qid margin")
    }
    // negatives are the TOP different-label scores: rank 1 has the
    // smallest margin within each query
    for ((qid, rs) <- rows.groupBy(_._1)) {
      val byRank = rs.sortBy(_._7)
      assert(byRank.sliding(2).forall {
        case Array(a, b) => a._6 <= b._6 + 2e-6; case _ => true
      }, s"q$qid margins shrink with rank")
    }
  }

  test("token_bpe_merges matches a full driver recompute of the BPE loop") {
    // the sequential reference implementation: greedy leftmost
    // non-overlapping merge application, exactly Sennrich's rule — the
    // engine's delimited-replace algebra must reproduce it verbatim
    var words: Map[Vector[String], Long] = spark.read
      .parquet(s"$dir/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ", -1)) // -1: engine split keeps trailing empties
      .filter(_.nonEmpty)
      .groupBy(identity)
      .map { case (w, a) => (w.map(_.toString).toVector, a.length.toLong) }
    val exp = scala.collection.mutable.Buffer[(Int, String, String, Long)]()
    for (it <- 1 to TextAnalysis.BpeIters) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        pc.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + f))
      val ranked = pc.toSeq.sortBy { case ((a, b), c) => (-c, s"$a $b") }
      for (((a, b), c) <- ranked.take(TextAnalysis.BpeTopN))
        exp += ((it, s"$a $b", s"$a$b", c))
      if (it < TextAnalysis.BpeIters) {
        val (ta, tb) = ranked.head._1
        words = words.map { case (syms, f) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == ta && syms(i + 1) == tb) {
              out += (ta + tb); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), f)
        }
      }
    }
    val got = TextAnalysis.tokenBpeMerges(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == exp.toSeq)
    // 3 iterations actually ran, and iteration 2+ merges can only build
    // on symbols that exist (merged names are concatenations)
    assert(got.map(_._1).distinct.sorted.toSeq == (1 to TextAnalysis.BpeIters))
  }

  test("token_bpe_merges merges back-to-back pair occurrences (greedy rule)") {
    import spark.implicits._
    // the word "ababab" has the winning pair (a,b) three times as
    // DISJOINT adjacent occurrences — the case a single-space-delimited
    // replace algebra loses (it mis-merges to [ab, a, b, ab]); review
    // finding, fixed by the double-space encoding
    val rows = TextAnalysis.tokenBpeMergesFrom(Seq("ababab").toDF("text"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.filter(_._1 == 1).head == ((1, "a b", "ab", 3L)))
    assert(rows.filter(_._1 == 2).head == ((2, "ab ab", "abab", 2L)))
    assert(rows.filter(_._1 == 3).head == ((3, "abab ab", "ababab", 1L)))
  }

  test("token_bpe_apply matches a driver recompute of the encode") {
    var words: Map[Vector[String], Long] = spark.read
      .parquet(s"$dir/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ", -1))
      .filter(_.nonEmpty)
      .groupBy(identity)
      .map { case (w, a) => (w.map(_.toString).toVector, a.length.toLong) }
    for (_ <- 1 to TextAnalysis.BpeIters) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        pc.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + f))
      val (ta, tb) = pc.toSeq
        .sortBy { case ((a, b), c) => (-c, s"$a $b") }.head._1
      words = words.map { case (syms, f) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == ta && syms(i + 1) == tb) {
            out += (ta + tb); i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.result(), f)
      }
    }
    val nWords = words.values.sum
    val nChars = words.map { case (s, f) => f * s.map(_.length).sum }.sum
    val nToks = words.map { case (s, f) => f * s.length }.sum
    val row = TextAnalysis.tokenBpeApply(spark, dir).collect().head
    assert(row.getLong(0) == nWords)
    assert(row.getLong(1) == nChars)
    assert(row.getLong(2) == nToks)
    assert(math.abs(row.getDouble(3) - nChars.toDouble / nToks) < 1e-6)
    // merges actually compressed something
    assert(nToks < nChars)
  }

  test("text_blocklist matches a driver recompute of the C4 gate") {
    val block = TextAnalysis.BlockTokens.toSet
    val exp = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).toLowerCase.split(" ", -1).toSeq
        val hits = toks.count(block)
        (r.getLong(0), hits, block.count(toks.contains),
          if (hits == 0) 1 else 0)
      }.sortBy(_._1)
    val got = TextAnalysis.textBlocklist(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq == exp.toSeq)
    // the synthetic fixture exercises both branches of the gate
    assert(exp.exists(_._4 == 1) && exp.exists(_._4 == 0))
  }

  test("rank_fusion: RRF arithmetic and the dual-list dominance property") {
    val rows = Similarity.rankFusion(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        r.getDouble(4), r.getInt(5)))
    assert(rows.nonEmpty)
    // rrf recomputes from the contributing ranks
    def term(r: Option[Int]) = r.fold(0.0)(k => 1.0 / (Similarity.RrfK + k))
    assert(rows.forall { case (_, _, l, e, rrf, _) =>
      math.abs(rrf - BigDecimal(term(l) + term(e))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9 })
    // every row came from at least one list
    assert(rows.forall { case (_, _, l, e, _, _) => l.isDefined || e.isDefined })
    // a doc in BOTH lists always outranks any single-list doc:
    // worst dual rrf = 1/(k+10)+1/(k+5) > best single rrf = 1/(k+1)
    for ((_, qrows) <- rows.groupBy(_._1)) {
      val dualWorst = qrows.filter(r => r._3.isDefined && r._4.isDefined)
        .map(_._6).maxOption
      val singleBest = qrows.filter(r => r._3.isEmpty || r._4.isEmpty)
        .map(_._6).minOption
      for (d <- dualWorst; s <- singleBest) assert(d < s)
    }
    // fused rank is dense and starts at 1 per query
    for ((_, qrows) <- rows.groupBy(_._1))
      assert(qrows.map(_._6).sorted.toSeq == (1 to qrows.length))
  }

  test("corpus_report matches a driver recompute of the per-source summary") {
    val block = TextAnalysis.BlockTokens.toSet
    val exp = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "text", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (src, ds) =>
        val toks = ds.map(_._2.toLowerCase.split(" ", -1).toSeq)
        (src, ds.length.toLong, toks.map(_.length.toLong).sum,
          BigDecimal(ds.map(_._3).sum.toDouble / ds.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          toks.count(_.exists(block)).toLong,
          (ds.length - ds.map(_._2).distinct.length).toLong)
      }
    val got = Curation.corpusReport(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == exp)
  }

  test("minhash_audit: band membership floors n_match, verified pairs covered") {
    val rows = Dedup.minhashAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // an LSH candidate shares >= 1 full band = BandRows components
    // (band keys are md5 of the concatenated mins — collision-free)
    assert(rows.forall(_._3 >= Dedup.BandRows))
    assert(rows.forall(r => r._3 <= 16))
    // est/err recompute from n_match and true_jaccard
    for ((_, _, m, est, tru, err) <- rows) {
      assert(math.abs(est - m / 16.0) < 1e-9)
      assert(math.abs(err - BigDecimal(est - tru)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    // every verified dedup pair (true jaccard >= 0.5) appears in the audit
    val audited = rows.map(r => (r._1, r._2)).toSet
    val verified = Dedup.dedupMinhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.subsetOf(audited))
  }

  test("sketch_hll matches a driver recompute of the full HLL") {
    // sequential reference: same md5-prefix value, same 8/24-bit split,
    // same comparison-ladder rank, same correction rule
    val gs = Dedup.shingleSetShared(spark, dir).select("g").collect()
      .map(_.getString(0))
    val regs = scala.collection.mutable.Map[Long, Int]()
    for (g <- gs) {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      val v = java.lang.Long.parseLong(h, 16)
      val bucket = v >> 24
      val w = v & 0xFFFFFF
      val bits = (0 until 24).count(k => w >= (1L << k))
      val rho = 25 - bits
      regs.updateWith(bucket)(o => Some(math.max(o.getOrElse(0), rho)))
    }
    val m = Dedup.HllBuckets
    val alpha = 0.7213 / (1 + 1.079 / m)
    val psum = regs.values.map(r => math.pow(2.0, -r)).sum
    val raw = alpha * m * m / (psum + (m - regs.size))
    val v0 = m - regs.size
    val expEst =
      if (raw <= 2.5 * m && v0 > 0) m * math.log(m.toDouble / v0) else raw
    val row = Dedup.sketchHll(spark, dir).collect().head
    assert(row.getLong(0) == gs.distinct.length.toLong)
    assert(math.abs(row.getDouble(1) - expEst) < 1e-4)
    // the estimate lands inside a generous 4-sigma HLL envelope
    // (sigma = 1.04/sqrt(m) ~ 6.5% for m = 256)
    assert(math.abs(row.getDouble(2)) < 4 * 1.04 / math.sqrt(m.toDouble))
  }

  test("sketch_cms: one-sided guarantee and a driver recompute of counters") {
    // sequential reference: same md5-nibble column hash, same counters
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" ", -1)).filter(_.nonEmpty)
    // row r's hash = byte pair 2r..2r+1 of ONE md5(token)
    def colFor(r: Int, t: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Integer.parseInt(h.substring(2 * r, 2 * r + 2), 16)
    }
    val counters = scala.collection.mutable.Map[(Int, Int), Long]()
    for (t <- toks; r <- 0 until Dedup.CmsDepth)
      counters.updateWith((r, colFor(r, t)))(c => Some(c.getOrElse(0L) + 1))
    val exact = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = Dedup.sketchCms(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == Dedup.CmsTopK)
    for ((t, nExact, nEst, over) <- rows) {
      assert(nExact == exact(t))
      val expEst = (0 until Dedup.CmsDepth)
        .map(r => counters((r, colFor(r, t)))).min
      assert(nEst == expEst)
      // CMS never underestimates
      assert(over >= 0 && nEst == nExact + over)
    }
    // the report is the true top-k by exact count (ties by token)
    val expTop = exact.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(Dedup.CmsTopK).map(_._1)
    assert(rows.map(_._1).toSeq == expTop)
  }

  test("sketch_quantile: histogram estimate within bin width of a driver recompute") {
    val lens = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect()
      .map(_.getString(0).toLowerCase.split(" ", -1).length.toLong)
      .sorted
    val rows = TextAnalysis.sketchQuantile(spark, dir).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(0.5, 0.9, 0.99))
    for ((p, nDocs, est, exact, relErr) <- rows) {
      assert(nDocs == lens.length.toLong)
      // the true rank-statistic value this p targets
      val rank = math.ceil(p * lens.length).toLong.toInt
      val atRank = lens(rank - 1)
      // bounded relative error: the bin containing the rank value is at
      // most 1/SubBins of its magnitude wide (exact below 2*SubBins)
      val width = if (atRank < 2 * TextAnalysis.QuantileSubBins) 1.0
        else atRank.toDouble / TextAnalysis.QuantileSubBins + 1
      assert(math.abs(est - atRank) <= width,
        s"p=$p est=$est rank-value=$atRank width=$width")
      // rel_err recomputes from the emitted columns
      assert(math.abs(relErr - BigDecimal((est - exact) / exact)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("quantile bin formula: containing, monotone, bounded width over a wide domain") {
    // relational property sweep — every n in [1, 200000) must land in a
    // bin that CONTAINS it, bins must be monotone in n (contiguity
    // follows with containment), and bin width obeys the 1/SubBins
    // relative bound (exact below 2*SubBins)
    val base = spark.range(1, 200000).toDF("n")
    val binned = TextAnalysis.quantileBinExprs("div").foldLeft(base) {
      case (df, (name, e)) => df.withColumn(name, expr(e))
    }
    val sb = TextAnalysis.QuantileSubBins
    val violations = binned.filter(
      !(col("n") >= col("blo") && col("n") < col("bhi")) ||
        (col("bhi") - col("blo")) >
          greatest(lit(1L), expr(s"n div $sb") + 1))
    assert(violations.count() == 0)
    val disorder = binned
      .withColumn("next_bin", lead("bin", 1).over(
        org.apache.spark.sql.expressions.Window.orderBy("n")))
      .filter(col("next_bin") < col("bin"))
    assert(disorder.count() == 0)
  }

  test("hll rho/bucket stay in range and cover all registers over a wide domain") {
    val g = spark.range(0, 100000).selectExpr("CAST(id AS STRING) AS g")
    val rho = Dedup.hllRho(g)
    // rho in [1, windowBits+1], bucket an 8-bit register index
    assert(rho.filter(col("bucket") < 0 || col("bucket") > 255 ||
      col("rho") < 1 || col("rho") > 25).count() == 0)
    // every register is reachable (hash-uniformity smoke over 100k keys)
    assert(rho.select("bucket").distinct().count() == 256)
  }

  test("curate_funnel aggregates curate's own manifest; stages monotone") {
    val rows = Curation.curate(spark, dir).collect()
      .map(r => (r.getLong(1), r.getInt(3), r.getInt(4), r.getInt(6)))
    val f = Curation.curateFunnel(spark, dir).collect().head
    assert(f.getLong(0) == rows.length.toLong)
    assert(f.getLong(1) == rows.count(_._2 == 1).toLong)
    assert(f.getLong(2) == rows.count(r => r._2 == 1 && r._3 == 1).toLong)
    assert(f.getLong(3) == rows.count(_._4 == 1).toLong)
    assert(f.getLong(4) == rows.map(_._1).sum)
    assert(f.getLong(5) == rows.filter(_._4 == 1).map(_._1).sum)
    // a funnel only narrows
    assert(f.getLong(0) >= f.getLong(1) && f.getLong(1) >= f.getLong(2) &&
      f.getLong(2) >= f.getLong(3))
  }

  test("data_validate counts each violation class on a dirty corpus") {
    import spark.implicits._
    val dirty = Seq[(Option[Long], Option[String], Option[String],
        Option[String], Option[Long])](
      (Some(1L), Some("good text"), Some("en"), Some("src0"), Some(9L)),
      (Some(1L), Some("dup id"), Some("en"), Some("src0"), Some(6L)),
      (None, Some("no id"), Some("en"), Some("src0"), Some(5L)),
      (Some(2L), Some(""), Some("en"), Some("src0"), Some(0L)),
      (Some(3L), Some("wrong meta"), Some("en"), Some("src0"), Some(99L)),
      (Some(4L), Some("bad lang"), Some("xx"), Some("src0"), Some(8L)),
      (Some(5L), Some("no source"), Some("en"), Some(""), Some(9L)),
      // the three-valued-logic traps: NULLs must count as violations
      (Some(6L), Some("nul lang"), None, Some("src0"), Some(8L)),
      (Some(7L), Some("nul chars"), Some("en"), Some("src0"), None)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Curation.dataValidateFrom(dirty).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    val exp = Map(
      "corpus_non_empty" -> ((9L, 0L, 1)),
      "doc_id_not_null" -> ((9L, 1L, 0)),
      "doc_id_unique" -> ((9L, 1L, 0)),
      "text_not_empty" -> ((9L, 1L, 0)),
      "n_chars_consistent" -> ((9L, 2L, 0)),
      "lang_in_domain" -> ((9L, 2L, 0)),
      "source_not_empty" -> ((9L, 1L, 0)))
    assert(got == exp)
    // an EMPTY corpus gets a definite verdict: non-emptiness fails,
    // the value checks pass vacuously with zero (not NULL) violations
    val empty = Curation.dataValidateFrom(
      Seq.empty[(Option[Long], Option[String], Option[String],
          Option[String], Option[Long])]
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getInt(3)))).toMap
    assert(empty("corpus_non_empty") == ((1L, 0)))
    assert((empty - "corpus_non_empty").values.forall(_ == ((0L, 1))))
    // and the real fixture is clean: every constraint passes
    val clean = Curation.dataValidate(spark, dir).collect()
    assert(clean.length == 7 && clean.forall(_.getInt(3) == 1))
  }

  test("split_balance cells partition the corpus and agree with split_assign") {
    val cells = Curation.splitBalance(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3),
        r.getDouble(4))))
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(cells.map(_._2._1).sum == total)
    // cell counts recompute from the split_assign key joined to lang
    val assign = Curation.splitAssign(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    val langs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val exp = langs.groupBy { case (id, lang) => (assign(id), lang) }
      .view.mapValues(_.length.toLong).toMap
    assert(cells.map { case (k, v) => k -> v._1 }.toMap == exp)
    // fractions sum to ~1 within each split
    for ((split, rows) <- cells.groupBy(_._1._1))
      assert(math.abs(rows.map(_._2._3).sum - 1.0) < 1e-3, split)
  }

  test("minhash_band_sweep: monotone curve, production arm on it") {
    val rows = Dedup.minhashBandSweep(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.map(x => (x._1, x._2)).toSeq ==
      Seq((8L, 2L), (4L, 4L), (2L, 8L), (1L, 16L)))
    // cross-engine pin: values computed independently by DuckDB running
    // minhashBandSweepSql on the same corpus
    assert(rows.toSeq == Seq(
      (8L, 2L, 38L, 28L, 1.0), (4L, 4L, 28L, 28L, 1.0),
      (2L, 8L, 26L, 26L, 0.928571), (1L, 16L, 19L, 19L, 0.678571)))
    // the theory the curve must reproduce: candidate prob 1−(1−j^r)^b
    // is monotone decreasing in r at fixed j — so BOTH cost (candidate
    // count) and recall fall (weakly) as rows-per-band grow
    assert(rows.map(_._3).sliding(2).forall(p => p(0) >= p(1)),
      "candidate cost must fall as bands tighten")
    assert(rows.map(_._5).sliding(2).forall(p => p(0) >= p(1)),
      "recall must fall as bands tighten")
    // hits can never exceed candidates or the truth size
    assert(rows.forall(x => x._4 <= x._3))
    // the r=2 arm IS the production lshCandidates banding, so its hit
    // count (candidates ∩ truth) must equal dedup_minhash's verified
    // pair count exactly — the committed operating point sits ON the
    // measured curve by construction, and this pins it
    val prodPairs = Dedup.dedupMinhash(spark, dir).count()
    assert(rows.head._4 == prodPairs,
      "production banding no longer sits on the measured curve")
  }

  test("dedup_threshold_sweep agrees with dedup_semantic at its own tau") {
    val sweep = Similarity.dedupThresholdSweep(spark, dir).collect()
      .map(r => (r.getDouble(0), r.getLong(2)))
    // the sweep at tau = SemDedupTau IS the dedup key's prune count —
    // same pair scan, same unrounded comparison
    val atTau = sweep.toMap.apply(Similarity.SemDedupTau)
    val semDups = Similarity.dedupSemantic(spark, dir).collect()
      .count(_.getInt(2) == 1).toLong
    assert(atTau == semDups)
    // pruning can only shrink as the threshold rises
    val byTau = sweep.sortBy(_._1).map(_._2)
    assert(byTau.sliding(2).forall {
      case Array(a, b) => b <= a; case _ => true
    })
  }

  test("embed_isotropy: the sum-vector identity equals brute-force pairwise mean") {
    val vs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val us = vs.map { v =>
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    var tot = 0.0; var cnt = 0L
    for (i <- us.indices; j <- i + 1 until us.length) {
      tot += us(i).lazyZip(us(j)).map(_ * _).sum; cnt += 1
    }
    val row = Similarity.embedIsotropy(spark, dir).collect().head
    assert(row.getLong(0) == us.length.toLong)
    // symmetric, so the unordered-pair mean IS the i≠j mean the identity
    // computes — the closed form must agree with the quadratic scan
    assert(math.abs(row.getDouble(3) - tot / cnt) < 1e-6)
    val meanNorm = vs.map(v => math.sqrt(v.map(x => x * x).sum)).sum / vs.length
    assert(math.abs(row.getDouble(1) - meanNorm) < 1e-6)
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0 + 1e-9)
  }

  test("dedup_containment: values match a driver shingle recompute") {
    val rows = Dedup.dedupContainment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // the asymmetry the key exists for: containment strictly dominates
    // jaccard on every reported pair (x/min >= x/union, equal only for
    // identical sets), and the fixture's near-dups are proper
    // contained-in-longer cases (jaccard < 1 while containment = 1)
    assert(rows.forall { case (_, _, c, j) => c >= Dedup.ContainTau - 1e-9 &&
      j <= c + 1e-9 })
    assert(rows.exists { case (_, _, c, j) => j < c })
    // exact recompute of both ratios from the shingle sets of the
    // reported docs (pair-bounded collect)
    val ids = rows.flatMap(r => Seq(r._1, r._2)).toSet
    val sets = Dedup.shingleSetShared(spark, dir)
      .filter(col("doc_id").isin(ids.toSeq: _*)).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    rows.foreach { case (a, b, c, j) =>
      val x = (sets(a) intersect sets(b)).size.toDouble
      assert(c == r6(x / math.min(sets(a).size, sets(b).size)))
      assert(j == r6(x / (sets(a).size + sets(b).size - x)))
    }
  }

  test("cluster_stats: sizes partition the corpus, cosine bounds hold") {
    val rows = Similarity.clusterStats(spark, dir).collect()
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-3)
    // per cluster: worst member <= mean <= 1 (cosine to own centroid)
    assert(rows.forall(r => r.getDouble(4) <= r.getDouble(3) + 1e-9 &&
      r.getDouble(3) <= 1.0 + 1e-9))
    // the trained partition actually spreads the corpus
    assert(rows.length > 1)
  }
}
