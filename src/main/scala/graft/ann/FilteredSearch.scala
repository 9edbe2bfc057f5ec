package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Selectivity dispatch for constrained (metadata-filtered) ANN search.
  *
  * Probe-then-filter (an `allowed` allow-list between candidate
  * retrieval and scoring) is the right shape when the filter keeps most
  * of the corpus: the index prunes as usual and the filter only trims
  * candidates. It is the WRONG shape when the filter is highly
  * selective or correlated with query geometry — measured at 1M
  * (SCALE.md §filtered ANN): a label filter correlated with the query
  * clusters collapsed LSH probe-then-filter recall to 0.513, because
  * the probed buckets hold mostly disallowed rows and the few allowed
  * ones live in buckets the probes never visit. In exactly that regime
  * the exact scan over the allowed subset is both correct (recall 1.0
  * by construction) and cheap (the subset IS small — that is what
  * selective means), so the dispatch below picks it.
  *
  * The cutoff trades the exact scan's O(|allowed| × queries) distance
  * work against the probe path's recall risk. At the default 5% an
  * exact pass over the allowed rows costs at most ~5% of the
  * brute-force corpus scan — comparable to one more probe per tree —
  * while every measured recall failure (SCALE.md) sat far below it.
  * The rule is a pure function of two counts so callers (and specs)
  * can reason about which path binds without running either.
  */
object FilteredSearch {

  /** Allowed/corpus fraction at or below which the exact scan over the
    * allowed subset is preferred to probe-then-filter. */
  val DefaultMaxExactFraction = 0.05

  /** The reserved label under which the bucket indexes' `scopedTo`
    * views ([[graft.ann.lsh.LshIndex.scopedTo]] /
    * [[graft.ann.ivf.IvfIndex.scopedTo]]) key an arbitrary allow-list
    * as a TRANSIENT single-label partition of the same fitted
    * structure — the serve-time remediation (`searchAllScoped` /
    * `scopedFallback = true`) behind the starved/bimodal warnings for
    * predicates that are NOT a stored label column. A user label equal
    * to this string in a real labeled store is unaffected: the scoped
    * view is built per allow-list and never persisted. */
  val ScopedLabel = "_scoped"

  /** Ceiling for the DENSITY-triggered exact dispatch (graph family):
    * a density-starved filter above [[DefaultMaxExactFraction]] still
    * dispatches to the exact subset scan as long as the subset costs no
    * more than this fraction of a brute-force pass. 0.15 is read off
    * the 1M measurement (SCALE.md §filtered ANN, round 14): the exact
    * path costs ~1.1 ms/q per 1% of corpus, so a 10-15% subset scan ≈
    * the walk's own 14 ms/q — recall 1.0 at parity cost. Above it the
    * exact scan stops being free and the engine can only warn. */
  val DefaultMaxAutoExactFraction = 0.15

  /** True when a filtered search over `allowedCount` of `corpusCount`
    * rows should brute-force the allowed subset instead of probing the
    * index. Degenerate corpus counts (<= 0) also dispatch to the exact
    * scan — there is nothing to probe. */
  def useExactScan(allowedCount: Long, corpusCount: Long,
                   maxExactFraction: Double = DefaultMaxExactFraction): Boolean =
    corpusCount <= 0L || allowedCount.toDouble <= maxExactFraction * corpusCount

  /** How a constrained graph search is served. `name` is the stable
    * string specs and oracle rows pin (and DuckDB re-derives). */
  sealed abstract class Route(val name: String) {
    /** Whether this route serves by brute-forcing the allowed subset. */
    def exact: Boolean = this == ExactSelectivity || this == ExactDensity
  }
  /** Allowed fraction ≤ maxExactFraction: the subset is tiny, the exact
    * scan wins on both cost and recall (the round-11 measurement). */
  case object ExactSelectivity extends Route("exact_selectivity")
  /** The filter thins the walk's LOCAL neighborhoods below k (the
    * median query sees < k allowed rows among its beamWidth nearest
    * entry-hop candidates) and the subset is still cheap enough to
    * scan: the 1M-measured regime where the walk silently serves 0.22
    * recall at 10% selectivity and no walk parameter helps. */
  case object ExactDensity extends Route("exact_density")
  /** Local neighborhoods stay dense under the filter — the walk's
    * recall holds (the uncorrelated-predicate regime, measured 1.000
    * at 50% selectivity at 1M). */
  case object Walk extends Route("walk")
  /** Density-starved BUT the subset is too large for the auto exact
    * dispatch: the walk runs, a warning names the measured risk —
    * label-augmented construction or a raised cutoff is on the caller. */
  case object WalkStarved extends Route("walk_starved")

  /** The bucket-index (LSH/IVF) twin of [[Walk]]: the probed candidate
    * set keeps the MEDIAN query's allowed-candidate count at or above
    * k, so probe-then-filter serves full result sets — the
    * uncorrelated-predicate regime (measured 0.999 at 50% selectivity,
    * SCALE.md §filtered ANN). */
  case object Probe extends Route("probe")
  /** Density-starved bucket probe whose subset is too large for the
    * auto exact dispatch: probe-then-filter runs, a warning names the
    * measured risk and the in-family fixes — allow-scoped centroid
    * probing at serve time (`searchAllScoped`, or `scopedFallback =
    * true` to route here automatically — ANY predicate, no rebuild),
    * the label-partitioned store (`LshIndex.withLabels` /
    * `IvfIndex.withLabels` → `searchAllLabeled`, round 17) for stored
    * label-equality predicates, or a raised ceiling when the subset is
    * scannable. */
  case object ProbeStarved extends Route("probe_starved")

  /** Routes by name — the inverse specs/oracles use. */
  def routeOf(name: String): Route = name match {
    case "exact_selectivity" => ExactSelectivity
    case "exact_density"     => ExactDensity
    case "walk"              => Walk
    case "walk_starved"      => WalkStarved
    case "probe"             => Probe
    case "probe_starved"     => ProbeStarved
    case other => throw new IllegalArgumentException(s"unknown route $other")
  }

  /** The full decision a [[graft.ann.GraphSearch.beamFromFiltered]]
    * call made — counts, the density estimate (None when the
    * selectivity cutoff short-circuited or density dispatch was off),
    * and the route taken.
    *
    * `lowQuartileLocalAllowed` (same estimator, 25th percentile) is
    * the BIMODALITY signal the 1M-shape measurement forced: a filter
    * correlated with geometry at ~50% selectivity leaves the MEDIAN
    * query locally dense (route `probe`/`walk` — correctly, since the
    * subset is far too large for the exact dispatch) while the starved
    * HALF of the queries serve collapsed recall (measured 0.58 average
    * = ~1.0 dense half / ~0.16 starved half, SCALE.md §filtered ANN,
    * round 16). The median routes; the quartile warns — see
    * [[bimodalStarved]]. */
  final case class Decision(corpusCount: Long, allowedCount: Long,
                            medianLocalAllowed: Option[Double],
                            route: Route,
                            lowQuartileLocalAllowed: Option[Double] = None) {
    def selectivity: Double =
      if (corpusCount <= 0L) 0.0 else allowedCount.toDouble / corpusCount

    /** True when the route is a probe/walk serve (the median query is
      * locally dense) but the lower-quartile query cannot fill k
      * locally — the bimodal regime where a correlated even-split
      * filter serves collapsed recall to a large minority of queries
      * with nothing in the average to observe. The serve rule is
      * unchanged (no global route helps: the subset is too large to
      * scan and the dense half is served correctly); callers warn, and
      * the remediations are allow-scoped centroid probing at serve
      * time for the bucket families (`searchAllScoped` /
      * `scopedFallback = true` — any predicate, no rebuild) and
      * label-aware construction keyed on the filter column —
      * [[graft.ann.KnnGraph.labelAware]] for the graph family, the
      * label-partitioned stores (`withLabels` → `searchAllLabeled`,
      * round 17) for stored label-equality predicates. */
    def bimodalStarved(k: Int): Boolean =
      (route == Walk || route == Probe) &&
        lowQuartileLocalAllowed.exists(_ < k)
  }

  /** The density-aware routing rule — a pure function of the two
    * corpus counts and the local-density estimate, so callers, specs,
    * and the DuckDB oracle can all re-derive the decision without
    * running a search. `medianLocalAllowed` is the median over queries
    * of the allowed count among each query's beamWidth nearest
    * entry-neighborhood candidates ([[graft.ann.GraphSearch
    * .localAllowedCounts]]): when the MEDIAN query cannot even fill k
    * from its local region, the greedy walk cannot either — that is
    * the measured collapse (0.22 recall at 10% selectivity at 1M,
    * SCALE.md §filtered ANN), and mere selectivity does not see it. */
  def route(allowedCount: Long, corpusCount: Long,
            medianLocalAllowed: Double, k: Int,
            maxExactFraction: Double = DefaultMaxExactFraction,
            maxAutoExactFraction: Double = DefaultMaxAutoExactFraction)
      : Route =
    if (useExactScan(allowedCount, corpusCount, maxExactFraction))
      ExactSelectivity
    else if (medianLocalAllowed >= k) Walk
    else if (allowedCount.toDouble <= maxAutoExactFraction * corpusCount)
      ExactDensity
    else WalkStarved

  /** [[route]] for the BUCKET indexes (LSH forest / IVF cells) — the
    * identical rule over the identical cutoffs, with the density
    * observable instantiated for buckets: `medianLocalAllowed` is the
    * median over queries of the count of ALLOWED rows among the
    * query's beamWidth NEAREST own-leaf/own-cell candidates
    * ([[graft.ann.lsh.LshIndex.localAllowedCounts]] /
    * [[graft.ann.ivf.IvfIndex.localAllowedCounts]]) — the graph
    * estimator's exact shape. NEAREST is load-bearing: the measured
    * negative result (documented on the LSH estimator) is that
    * counting allowed rows among ALL probed candidates does not
    * discriminate — collapsed arms keep filling k with far allowed
    * rows, so starvation for a bucket index is a nearness property
    * and the estimator must rank. Delegates to [[route]] and renames
    * the probe-path outcomes, so the two rules can never drift. */
  def routeBucket(allowedCount: Long, corpusCount: Long,
                  medianLocalAllowed: Double, k: Int,
                  maxExactFraction: Double = DefaultMaxExactFraction,
                  maxAutoExactFraction: Double = DefaultMaxAutoExactFraction)
      : Route =
    route(allowedCount, corpusCount, medianLocalAllowed, k,
        maxExactFraction, maxAutoExactFraction) match {
      case Walk        => Probe
      case WalkStarved => ProbeStarved
      case r           => r
    }

  /** The full decision LADDER, shared by all three families (graph /
    * LSH / IVF — one implementation, so a cutoff fix cannot be applied
    * twice and forgotten once): selectivity short-circuit, the
    * dispatch-off probe/walk default, and the density branch — one
    * aggregate over the family's own `localAllowed` estimator frame
    * (`(query_id, local_allowed)` rows, by-name) computing the exact
    * interpolated median AND 25th percentile, then [[route]] /
    * [[routeBucket]] by `bucket`. An empty estimator frame reads
    * median 0 — maximally starved: the probe/walk would serve nothing
    * from an empty neighborhood while the exact routes still serve
    * real results (or a free empty frame for empty queries), so
    * routing on zero density is the safe AND useful degradation. */
  def decide(allowedCount: Long, corpusCount: Long, k: Int,
             maxExactFraction: Double, maxAutoExactFraction: Double,
             densityDispatch: Boolean, bucket: Boolean,
             localAllowed: => DataFrame): Decision =
    if (useExactScan(allowedCount, corpusCount, maxExactFraction))
      Decision(corpusCount, allowedCount, None, ExactSelectivity)
    else if (!densityDispatch)
      Decision(corpusCount, allowedCount, None,
        if (bucket) Probe else Walk)
    else {
      val row = localAllowed
        .agg(expr("percentile(local_allowed, 0.5)").as("med"),
          expr("percentile(local_allowed, 0.25)").as("q25"))
        .head()
      val med = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
      val q25 = if (row.isNullAt(1)) 0.0 else row.getDouble(1)
      Decision(corpusCount, allowedCount, Some(med),
        if (bucket)
          routeBucket(allowedCount, corpusCount, med, k,
            maxExactFraction, maxAutoExactFraction)
        else
          route(allowedCount, corpusCount, med, k,
            maxExactFraction, maxAutoExactFraction),
        Some(q25))
    }

  /** The 0-2 log-ready warning lines a serve path owes its caller for
    * `decision` — one implementation for the six call sites
    * (starved-large and bimodal × three families). `neighborhood`
    * names the family's local window ("nearest local candidates" /
    * "nearest own-leaf candidates" / "nearest own-cell candidates");
    * `remediation` the family's starved-large fix and
    * `bimodalRemediation` its bimodal fix — each an IN-FAMILY,
    * measured, packaged API (the round-16 verdict's rule: a warning
    * that names an ineffective or cross-family action is not a
    * remediation), defaulting to the graph family's
    * [[graft.ann.KnnGraph.labelAware]]. */
  def warnings(d: Decision, k: Int, beamWidth: Int, family: String,
               neighborhood: String, remediation: String,
               maxAutoExactFraction: Double = DefaultMaxAutoExactFraction,
               bimodalRemediation: String =
                 "Remediation is build-time: KnnGraph.labelAware keyed " +
                   "on the filter column.")
      : Seq[String] = {
    val starved =
      if (d.route != WalkStarved && d.route != ProbeStarved) None
      else Some(
        f"filtered $family search is density-starved: the median query " +
        f"sees ${d.medianLocalAllowed.getOrElse(Double.NaN)}%.1f allowed " +
        f"rows among its $beamWidth $neighborhood (< k=$k) but the " +
        f"allowed subset (${d.selectivity * 100}%.1f%% of " +
        f"${d.corpusCount}%,d rows) exceeds maxAutoExactFraction=" +
        f"$maxAutoExactFraction — the serve may under-deliver recall " +
        f"(SCALE.md §filtered ANN: the correlated-filter collapse). " +
        remediation)
    val bimodal =
      if (!d.bimodalStarved(k)) None
      else Some(
        f"filtered $family search is BIMODALLY starved: the median " +
        f"query is locally dense (${d.medianLocalAllowed.get}%.1f " +
        f"allowed among its $beamWidth $neighborhood) but the " +
        f"lower-quartile query sees " +
        f"${d.lowQuartileLocalAllowed.get}%.1f < k=$k — a filter " +
        "correlated with geometry at even-split selectivity serves " +
        "collapsed recall to the starved minority with nothing in the " +
        "average to observe (measured 0.58 avg = ~1.0/~0.16 halves at " +
        "1M shape, SCALE.md §filtered ANN). " + bimodalRemediation)
    (starved ++ bimodal).toSeq
  }
}
