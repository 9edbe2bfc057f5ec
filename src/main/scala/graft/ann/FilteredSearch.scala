package graft.ann

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

  /** True when a filtered search over `allowedCount` of `corpusCount`
    * rows should brute-force the allowed subset instead of probing the
    * index. Degenerate corpus counts (<= 0) also dispatch to the exact
    * scan — there is nothing to probe. */
  def useExactScan(allowedCount: Long, corpusCount: Long,
                   maxExactFraction: Double = DefaultMaxExactFraction): Boolean =
    corpusCount <= 0L || allowedCount.toDouble <= maxExactFraction * corpusCount
}
