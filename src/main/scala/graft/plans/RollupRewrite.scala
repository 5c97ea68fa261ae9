package graft.plans

import graft.model.AggregationMethod
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Registry of materialized rollup levels, consulted by [[RollupRewrite]].
  * [[graft.ops.Materialize.createRollupTables]] registers each level it
  * writes, with a pointer to the level it was derived from — the rewrite
  * is only valid along that derivation edge (avg-of-avg is not avg, so a
  * 1h level derived from 5m may only replace re-aggregations OF the 5m
  * level, never of the 1m level).
  */
object RollupCatalog {

  /** One materialized level. `base` names the chain it belongs to (one
    * chain per materialization root — levels of different chains never
    * serve each other); `parentSpp` is the level it was derived from;
    * `xff` the gate it was derived with.
    */
  final case class LevelInfo(
      spp: Int, parentSpp: Int, path: String, base: String,
      method: AggregationMethod, xff: Double)

  private val levels =
    new scala.collection.concurrent.TrieMap[(String, Int), LevelInfo]

  def register(info: LevelInfo): Unit = {
    levels.put((info.base, info.spp), info); ()
  }
  def clear(): Unit = levels.clear()
  def isEmpty: Boolean = levels.isEmpty

  def lookup(base: String, spp: Long): Option[LevelInfo] =
    if (spp.isValidInt) levels.get((base, spp.toInt)) else None

  /** The level whose storage location equals `root`: URI paths must
    * match AND schemes AND authorities must agree when both sides carry
    * one — a remote filesystem mirroring the local tmp layout
    * (scheme), or a different bucket/namenode with the same layout
    * (authority: `s3://bucketA/x` vs `s3://bucketB/x`), must never be
    * served the local materialized table.
    */
  def levelAtPath(root: org.apache.hadoop.fs.Path): Option[LevelInfo] =
    levels.values.find { i =>
      val reg = new org.apache.hadoop.fs.Path(i.path).toUri
      val got = root.toUri
      def agree(a: String, b: String) = a == null || b == null || a == b
      reg.getPath == got.getPath &&
        agree(reg.getScheme, got.getScheme) &&
        agree(reg.getAuthority, got.getAuthority)
    }

  /** Whether `target` can legally serve a `target.method`-aggregation of
    * level `finer` at `target.spp` resolution.
    *
    * Any xFilesFactor gate above 0 disqualifies a level outright — even
    * on its direct derivation edge: a gated level DROPPED buckets whose
    * fill ratio fell below the gate, so it answers a user's plain
    * (ungated) re-aggregation with fewer rows. Both registered cascades
    * use xff 0.0, but `materializeLevels` is public API parametrized by
    * xff, so the guard must hold structurally.
    *
    * With the chain ungated, direct edges are exact (the target IS that
    * aggregation of its parent). Across a SKIPPED level the rewrite is
    * only valid for decomposable methods — max-of-max / min-of-min /
    * sum-of-sum / last-of-last over exactly-nested windows equal the flat
    * aggregate. Average never composes (avg-of-avg ≠ avg), so it stays
    * direct-edge-only.
    */
  def servableFrom(finer: LevelInfo, target: LevelInfo): Boolean = {
    if (target.base != finer.base || target.method != finer.method) false
    else if (target.xff != 0.0) false
    else if (target.parentSpp == finer.spp) true
    else {
      // AbsMax/AbsMin compose exactly under whisper's earliest-first
      // tiebreak: the flat winner p* is also its own window's winner (an
      // equal-magnitude point earlier in that window would contradict p*
      // being the global earliest), and every earlier window's winner has
      // strictly smaller magnitude — so max-by-(abs, earliest) over
      // per-window winners equals the flat result. AvgZero does not
      // compose (divides by the window size twice), like Average.
      val decomposable = target.method match {
        case AggregationMethod.Max | AggregationMethod.Min |
             AggregationMethod.Sum | AggregationMethod.Last |
             AggregationMethod.AbsMax | AggregationMethod.AbsMin => true
        case _ => false
      }
      decomposable && target.parentSpp > finer.spp &&
        lookup(target.base, target.parentSpp)
          .exists(p => servableFrom(finer, p))
    }
  }
}

/** Materialized-rollup rewrite — the OLAP "aggregate navigator" pattern
  * (materialized-view rewrite) as a Catalyst optimizer rule:
  *
  * {{{ Aggregate [metric, floor(bucket_ts/S)*S] [avg(value)]
  *       over scan(points_Ps)                       // P = finer level
  *   ==> scan(points_Ss)                            // iff S derived from P }}}
  *
  * The substitution is EXACT for Sum/Max/Min/Last/Abs* and for the
  * engine's pinned mean shape (round6(fixedSum/count) — fixedMeanPair):
  * level S was materialized by
  * [[graft.ops.Materialize.materializeLevels]] as precisely this
  * aggregation of level P (xff = 0, same method). A BARE `avg(value)`
  * with no rounding wrapper is also rewritten, and there the served
  * value is the level's GRID-QUANTIZED mean (stored values round to 6
  * decimals at emission — the engine's canonical average semantics at
  * every output edge), which can differ from the full-mantissa double
  * mean by ≤5e-7: callers needing unquantized means must not register
  * the catalog for those tables. Serving the scan of the coarser table
  * skips both the (spp-ratio×) larger scan and the whole shuffle — at 100 TB this is the
  * difference between reading the 1h archive (~0.03% of raw) and
  * re-shuffling the 5m archive. For DECOMPOSABLE methods (max, min, and
  * sum under xff = 0) the rewrite also fires across skipped levels —
  * max-of-max over exactly-nested windows is the flat max — while
  * Average stays direct-edge-only (avg-of-avg ≠ avg); see
  * [[RollupCatalog.servableFrom]].
  *
  * Deployment: injected via [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions`) or per-session through
  * `spark.experimental.extraOptimizations`. Matching is conservative: the
  * rule fires only on the canonical align shape
  * `cast(floor(bucket_ts / S) * S as long)` (what [[graft.ops.Buckets.alignTs]]
  * emits) over a direct scan (optionally a column-pruning Project and/or
  * Filters on the metric column — the common "one metric, coarse
  * resolution" fetch; metric selection commutes with the aggregation and
  * is preserved above the substituted scan) of a registered level,
  * grouped by columns named `metric`/`bucket_ts` and aggregating `value`
  * with the level's own method — anything else is left untouched.
  */
object RollupRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (RollupCatalog.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  /** Resolved relation for a level path, cached per (session, path).
    *
    * The substituted scan used to be built with `session.read.parquet`
    * INSIDE the rule — a full file listing + schema inference of the
    * level directory on EVERY optimizer pass over a matching plan (and
    * `df.count()` plans again), which the r12 driver measured as a
    * consistent ~0.3 s/query regression on `rollup_serve_1h`. Level
    * directories are write-once per materialization root (roots are
    * content-addressed by input digest), so the resolved
    * `LogicalRelation` — whose `HadoopFsRelation` owns the expensive
    * `InMemoryFileIndex` — is safely reusable; the one same-JVM rewrite
    * case ([[graft.ops.Materialize.materializeLevels]] overwriting a
    * path it wrote before) invalidates explicitly at write time.
    *
    * Each USE goes through `newInstance()` for fresh output ExprIds: a
    * single query may rewrite several aggregates onto the same level
    * (e.g. a union of re-aggregations), and duplicate attribute ids in
    * one tree corrupt resolution after analysis has already run.
    */
  // per-session outer map with EXPLICIT application-end eviction
  // (graft.ops.SessionCache): the cached LogicalRelation strongly
  // references its session through HadoopFsRelation, so a bare weak-key
  // map could never collect a stopped session (r13 ADVICE)
  private val scanCache = new graft.ops.SessionCache[LogicalRelation]

  private def cachedRelation(
      session: SparkSession, path: String): LogicalRelation =
    scanCache.forSession(session).getOrElseUpdate(path,
      session.read.parquet(path).queryExecution.analyzed.collectFirst {
        case l: LogicalRelation => l
      }.getOrElse(sys.error(s"level read did not analyze to a relation: $path")))

  /** Drop cached relations for a level path whose files just changed —
    * called by the materializer after (re)writing a level directory.
    */
  def invalidateScan(path: String): Unit = scanCache.invalidate(path)

  // ---- matching helpers -------------------------------------------------

  /** Strip (possibly nested) casts — analysis inserts implicit casts
    * around the integer align arithmetic.
    */
  private def strip(e: Expression): Expression = e match {
    case c: Cast => strip(c.child)
    case _ => e
  }

  private def literalLong(e: Expression): Option[Long] = strip(e) match {
    case Literal(v: Int, _) => Some(v.toLong)
    case Literal(v: Long, _) => Some(v)
    case Literal(v: Short, _) => Some(v.toLong)
    case Literal(v: Double, _) if v.isWhole => Some(v.toLong)
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => Some(v.toLong)
    case _ => None
  }

  /** Match `floor(attr / s) * s` (mod casts) → (attr, s). */
  private def extractAlign(e: Expression): Option[(Attribute, Long)] =
    strip(e) match {
      case m: Multiply =>
        (strip(m.left), literalLong(m.right)) match {
          case (f: Floor, Some(s2)) => strip(f.child) match {
            case d: Divide =>
              (strip(d.left), literalLong(d.right)) match {
                case (a: Attribute, Some(s1)) if s1 == s2 => Some((a, s1))
                case _ => None
              }
            case _ => None
          }
          case _ => None
        }
      case _ => None
    }

  /** Descend through Projects and Filters to the base relation,
    * accumulating the alias bindings so expressions above can be inlined
    * back to relation attributes — the optimizer's
    * PullOutGroupingExpressions moves the align arithmetic into a child
    * Project (`_groupingexpression#N`), so the Aggregate's own groupings
    * are bare attributes. Filter conditions are collected (inlined to
    * relation attributes); [[tryRewrite]] only accepts ones that commute
    * with the aggregation.
    */
  private def dealias(p: LogicalPlan)
      : Option[(LogicalRelation, Map[ExprId, Expression], Seq[Expression])] =
    p match {
      case l: LogicalRelation => Some((l, Map.empty, Nil))
      case proj: Project =>
        dealias(proj.child).map { case (rel, inner, fs) =>
          val binds = proj.projectList.map {
            case a @ Alias(c, _) => a.exprId -> substitute(c, inner)
            case a: Attribute => a.exprId -> substitute(a, inner)
          }.toMap
          (rel, binds, fs)
        }
      case f: Filter =>
        dealias(f.child).map { case (rel, inner, fs) =>
          (rel, inner, fs :+ substitute(f.condition, inner))
        }
      case _ => None
    }

  private def substitute(e: Expression, binds: Map[ExprId, Expression]): Expression =
    if (binds.isEmpty) e
    else e.transformUp {
      case a: Attribute if binds.contains(a.exprId) => binds(a.exprId)
    }

  private def levelOf(rel: LogicalRelation): Option[RollupCatalog.LevelInfo] =
    rel.relation match {
      case h: HadoopFsRelation =>
        h.location.rootPaths.toSeq match {
          case Seq(root) => RollupCatalog.levelAtPath(root)
          case _ => None
        }
      case _ => None
    }

  /** Match `round(value · 1e6)` — the scaled-integer leaf of
    * [[graft.ops.Rollup]]'s exact fixed-point sums (`fixedSum`).
    */
  private def fixedScaledLeaf(e: Expression): Boolean = strip(e) match {
    case r: Round =>
      literalLong(r.scale).contains(0L) && (strip(r.child) match {
        case m: Multiply =>
          attrNamed(m.left, "value") &&
            literalLong(m.right).contains(1000000L)
        case _ => false
      })
    case _ => false
  }

  /** Match the pinned fixed-point mean's aggregate PAIR —
    * `sum(cast(round(value·1e6) as decimal))` and `count(value)` — the
    * shape [[graft.ops.Rollup.mean6]] emits. Serving it from the stored
    * level is exact BY CONSTRUCTION: the level's value IS
    * round6(fixedSum/count) of its parent, and the surviving round6
    * wrapper is idempotent over it.
    */
  private def fixedMeanPair(aggs: Seq[AggregateExpression]): Boolean =
    aggs match {
      case Seq(s, c) =>
        (s.aggregateFunction, c.aggregateFunction) match {
          case (sf: Sum, cf: Count) =>
            fixedScaledLeaf(sf.child) &&
              (cf.children.map(strip) match {
                case Seq(a) => attrNamed(a, "value")
                case _ => false
              })
          case _ => false
        }
      case _ => false
    }

  private def methodMatches(fn: AggregateFunction, m: AggregationMethod): Boolean =
    (fn, m) match {
      case (a: Average, AggregationMethod.Average) => attrNamed(a.child, "value")
      case (s: Sum, AggregationMethod.Sum) => attrNamed(s.child, "value")
      case (x: Max, AggregationMethod.Max) => attrNamed(x.child, "value")
      case (n: Min, AggregationMethod.Min) => attrNamed(n.child, "value")
      // Last = max_by(value, bucket_ts): the value at the max timestamp —
      // composes over nested windows exactly like max
      case (mb: MaxBy, AggregationMethod.Last) =>
        attrNamed(mb.valueExpr, "value") && attrNamed(mb.orderingExpr, "bucket_ts")
      // AbsMax/AbsMin = max_by/min_by over the canonical magnitude struct
      // emitted by Rollup.aggColumn — (abs(value), ∓bucket_ts, ∓value)
      case (mb: MaxBy, AggregationMethod.AbsMax) =>
        attrNamed(mb.valueExpr, "value") &&
          magnitudeStruct(mb.orderingExpr, negated = true)
      case (mb: MinBy, AggregationMethod.AbsMin) =>
        attrNamed(mb.valueExpr, "value") &&
          magnitudeStruct(mb.orderingExpr, negated = false)
      case _ => false
    }

  /** Match `struct(abs(value), -bucket_ts, -value)` (negated, AbsMax) or
    * `struct(abs(value), bucket_ts, value)` (AbsMin), mod casts.
    */
  private def magnitudeStruct(e: Expression, negated: Boolean): Boolean =
    strip(e) match {
      case s: CreateNamedStruct => s.valExprs.map(strip) match {
        case Seq(a: Abs, ts, v) if attrNamed(a.child, "value") =>
          (ts, v) match {
            case (UnaryMinus(tsc, _), UnaryMinus(vc, _)) if negated =>
              attrNamed(tsc, "bucket_ts") && attrNamed(vc, "value")
            case (tsc, vc) if !negated =>
              attrNamed(tsc, "bucket_ts") && attrNamed(vc, "value")
            case _ => false
          }
        case _ => false
      }
      case _ => false
    }

  private def attrNamed(e: Expression, name: String): Boolean =
    strip(e) match {
      case a: Attribute => a.name == name
      case _ => false
    }

  // ---- the rewrite ------------------------------------------------------

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    for {
      (rel, binds, filters) <- dealias(agg.child)
      finer <- levelOf(rel)
      // a filter below the Aggregate must commute with it to survive the
      // substitution: selecting on the group-preserved dimension column
      // (metric) filters whole groups, so applying it above the coarser
      // scan is exact. Anything touching value (pre-aggregation row
      // selection) or bucket_ts (partial coarse windows) disqualifies.
      if filters.forall(f =>
        f.deterministic && f.references.forall(_.name == "metric"))
      // groupings (inlined to relation attrs): exactly
      // {metric attr, align(bucket_ts, S)} in either order
      (metricAttr, alignedSpp) <- agg.groupingExpressions
        .map(substitute(_, binds)) match {
        case Seq(g1, g2) =>
          Seq((g1, g2), (g2, g1)).collectFirst(Function.unlift {
            case (m, b) =>
              (strip(m), extractAlign(b)) match {
                case (ma: Attribute, Some((ba, s)))
                    if ma.name == "metric" && ba.name == "bucket_ts" =>
                  Some((ma, s))
                case _ => None
              }
          })
        case _ => None
      }
      coarser <- RollupCatalog.lookup(finer.base, alignedSpp)
      if RollupCatalog.servableFrom(finer, coarser)
      // result exprs: the two groupings plus AT MOST one matching
      // aggregate — zero is the column-pruned shape `df.count()` leaves
      // behind (grouping keys only), which the coarser level also
      // serves exactly: an xff = 0 level emits one row per parent
      // window with ≥1 point, so its key set IS the distinct coarse
      // key set of the finer level
      (mapped, sawAgg) <- mapResults(agg.aggregateExpressions, binds,
        metricAttr, alignedSpp, coarser)
    } yield {
      // resolve the substituted scan under the SESSION THAT OWNS the
      // matched relation, never the thread-local active one — in a
      // multi-session JVM the singleton rule can run while another
      // session (with different conf/catalog) is active
      val session = rel.relation match {
        case h: HadoopFsRelation => h.sparkSession
        case _ => SparkSession.active
      }
      val level = cachedRelation(session, coarser.path).newInstance()
      val byName = level.output.map(a => a.name -> a).toMap
      val (sMetric, sBucket, sValue) =
        (byName("metric"), byName("bucket_ts"), byName("value"))
      val scan: LogicalPlan = Project(Seq(sMetric, sBucket, sValue), level)
      // re-anchor collected metric filters onto the substituted scan's
      // metric attribute and keep them above it (they still prune —
      // Catalyst pushes them into the coarser parquet scan). Rebind ONLY
      // the metric attribute: the guard above restricts references to
      // 'metric' today, but if that guard is ever relaxed (e.g. aligned
      // bucket_ts ranges) an unexpected reference must fail loudly as an
      // unbound attribute at physical planning/execution (this rule runs
      // post-analysis), not silently rebind to the wrong column
      val filtered = filters
        .map(_.transformUp { case a: Attribute if a.name == "metric" => sMetric })
        .reduceOption(And)
        .map(Filter(_, scan)).getOrElse(scan)
      val projected = mapped.map {
        case (orig, MetricCol) => Alias(sMetric, orig.name)(exprId = orig.exprId)
        case (orig, BucketCol) => Alias(sBucket, orig.name)(exprId = orig.exprId)
        case (orig, ValueCol(inlined, pinnedMean)) =>
          // keep any scalar wrapper (e.g. round6 after CollapseProject),
          // rebuilding from the INLINED form the shape checks validated
          // (the raw alias child may reference the discarded child
          // Project). The pinned mean substitutes its whole quotient —
          // Divide(fixedSum, count) — so the surviving round6 wrapper
          // applies to the stored value (idempotent over it); the single
          // aggregate case substitutes the aggregate call itself.
          val rebuilt =
            if (pinnedMean) inlined.transform {
              case d: Divide if d.right.collectFirst {
                    case ae: AggregateExpression
                        if ae.aggregateFunction.isInstanceOf[Count] => ae
                  }.isDefined &&
                  d.left.collectFirst {
                    case ae: AggregateExpression
                        if ae.aggregateFunction.isInstanceOf[Sum] => ae
                  }.isDefined =>
                sValue
            }
            else inlined.transform { case _: AggregateExpression => sValue }
          Alias(rebuilt, orig.name)(exprId = orig.exprId)
      }
      // both shapes substitute to a pure Project — no re-group: a
      // level's (metric, bucket_ts) rows are key-UNIQUE by construction
      // (each written from a groupBy on exactly those keys by
      // [[graft.ops.Materialize.materializeLevels]], the only writer of
      // catalog-registered paths), so the original Aggregate's distinct
      // key set IS the level's row set and a re-group would re-shuffle
      // the whole level for nothing
      Project(projected, filtered)
    }
  }

  private sealed trait RollupCol
  private case object MetricCol extends RollupCol
  private case object BucketCol extends RollupCol

  /** A value-result expression: `inlined` is the bind-substituted form
    * the shape checks validated (rebuilding from the RAW alias child
    * would resurrect references to the discarded child Project), and
    * `pinnedMean` marks [[graft.ops.Rollup.mean6]]'s aggregate pair,
    * whose whole quotient — not a single aggregate call — substitutes
    * to the stored column.
    */
  private final case class ValueCol(
    inlined: Expression, pinnedMean: Boolean) extends RollupCol

  /** Pair each Aggregate result expression with the rollup column that
    * replaces it, or None if any result is outside the rewritable shape.
    * The second element reports whether a value aggregate was present —
    * false is the column-pruned (`count()`) grouping-keys-only shape.
    */
  private def mapResults(
      results: Seq[NamedExpression],
      binds: Map[ExprId, Expression],
      metricAttr: Attribute,
      alignedSpp: Long,
      info: RollupCatalog.LevelInfo)
      : Option[(Seq[(NamedExpression, RollupCol)], Boolean)] = {
    var sawAgg = false
    val mapped: Seq[Option[(NamedExpression, RollupCol)]] = results.map { ne =>
      val inlined = ne match {
        case a: Attribute => substitute(a, binds)
        case Alias(c, _) => substitute(c, binds)
        case other => other
      }
      if (strip(inlined).semanticEquals(metricAttr)) Some((ne, MetricCol))
      else if (extractAlign(inlined).exists(_._2 == alignedSpp))
        Some((ne, BucketCol))
      else {
        // an aggregate result, possibly under scalar wrappers merged in
        // by CollapseProject (e.g. round(avg(value), 6)): exactly one
        // plain aggregate call of the level's own method, and the wrapper
        // must reference nothing besides that aggregate
        val aggs = inlined.collect { case ae: AggregateExpression => ae }
        val wrapperRefs = inlined
          .transform { case _: AggregateExpression => Literal(0.0) }
          .references
        val plain = aggs.forall(ae => !ae.isDistinct && ae.filter.isEmpty)
        aggs match {
          case Seq(ae)
              if plain && methodMatches(ae.aggregateFunction, info.method) &&
                wrapperRefs.isEmpty && !sawAgg =>
            sawAgg = true
            Some((ne, ValueCol(inlined, pinnedMean = false)))
          // the engine's own pinned mean (round6(fixedSum/count)) — two
          // aggregate calls forming one exact quotient
          case pair
              if plain && info.method == AggregationMethod.Average &&
                fixedMeanPair(pair) && wrapperRefs.isEmpty && !sawAgg =>
            sawAgg = true
            Some((ne, ValueCol(inlined, pinnedMean = true)))
          case _ => None
        }
      }
    }
    if (mapped.forall(_.isDefined)) Some((mapped.flatten, sawAgg))
    else None
  }
}
