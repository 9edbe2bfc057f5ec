package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.ExactNN
import graft.ann.ivf.{Ivf, IvfConfig}
import graft.ann.lsh.{Lsh, LshConfig, LshIndex}
import graft.eval.Eval
import graft.functions.exprs

/** Embedding-space near-duplicate detection + IVF similarity search over
  * `embeddings.parquet` — the vector half of the LLM-pipeline dedup
  * surface (the text half lives in [[TextQueries]]).
  *
  * `q_embedding_near_dup` is the exact quadratic baseline (oracle-checked
  * against DuckDB's list_cosine_similarity); `q_lsh_near_dup_pairs` is
  * the scale path — LSH-bucket candidate generation then exact cosine
  * verification. Its pairs are dumped to parquet and the DuckDB oracle
  * recomputes every pair's cosine from the embeddings table (subset-of-
  * exact-near-dup-set + distance check, cross-engine); the seeded
  * bucketing internals stay property-tested (LshIndexSpec).
  */
object SimilarityQueries extends QueryPack {

  /** Cosine near-dup threshold: planted near-dup pairs in the testdata
    * sit at dist ~0.49-0.55; the background distribution starts ~0.62. */
  val CosineDupThreshold = 0.55
  val K = VectorQueries.K

  /** One IVF config for every query here, so `q_ivf_cell_stats`'s
    * dump-and-check gates the same index the searches use. */
  val ivfConfig: IvfConfig = IvfConfig(nCells = 16, nProbe = 8, seed = 42L)

  /** `q_autotune_ivf_nprobe`'s sweep: ascending nProbe arms (each a
    * pure search-time re-tune, [[graft.ann.ivf.IvfIndex.withNProbe]])
    * and the recall target the chosen arm must meet. */
  val AutoTuneArms: Seq[Int] = Seq(1, 2, 4, 8, 16)
  val AutoTuneTarget = 0.95

  /** Angular twin: cells cluster the unit sphere, probes/assignment
    * normalize first (cosine ranking == L2 ranking on normalized
    * vectors — the reference's angular coupling, lsh/hasher.go:121-132). */
  val ivfAngularConfig: IvfConfig = ivfConfig.copy(angular = true)

  /** `q_ivf_search_l2_distfit`'s config: driverFitMaxSample = 1 forces
    * the distributed k-means|| coarse fit (Ivf.fitCentroidsDistributed
    * — the past-driver-bound scale path) at gate scale, so BOTH fit
    * paths sit under the driver's cross-engine correctness gate, not
    * only under DistributedFitSpec. The dispatch is deterministic
    * (total > driverFitMaxSample), pinned by DistributedFitSpec's
    * board-config test. */
  val ivfDistFitConfig: IvfConfig = ivfConfig.copy(driverFitMaxSample = 1)

  /** IVF-PQ: same coarse geometry as [[ivfConfig]], same code budget as
    * `q_pq_recall`'s PqConfig — so the two recall queries isolate exactly
    * the residual-encoding + cell-pruning delta. */
  val ivfPqConfig: graft.ann.ivfpq.IvfPqConfig = graft.ann.ivfpq.IvfPqConfig(
    nCells = 16, nProbe = 8, numSubvectors = 16, codesPerSubvector = 16,
    seed = 42L)

  /** `q_ivfpq_search_l2_distfit`'s config: a driverFitMaxSample below
    * the gate-scale corpus forces [[graft.ann.ivfpq.IvfPq]]'s
    * distributed-coarse path — k-means|| cells over the full sample
    * plus the driver-BOUNDED residual-codebook sub-sample — so the
    * flagship compressed family's 100 TB fit path sits under the
    * driver's cross-engine gate like IVF's (q_ivf_search_l2_distfit).
    * 200 rather than the IVF row's 1: codebooks are per-subvector
    * means that need a non-degenerate sample, while the IVF row has no
    * codebook to feed. The dispatch stays deterministic
    * (corpus > driverFitMaxSample at sf0.01's 500 rows). */
  val ivfPqDistFitConfig: graft.ann.ivfpq.IvfPqConfig =
    ivfPqConfig.copy(driverFitMaxSample = 200)

  /** Where `q_ivf_cell_stats` dumps the (vec_id, cell) assignment so its
    * DuckDB oracle can check the index BUILD cross-engine: Σ per-cell
    * counts must equal `count(*) FROM embeddings` (every vector assigned
    * exactly one cell) and the number of occupied cells must be ≤ nCells
    * — mirroring `q_lsh_bucket_stats` (LshQueries.BucketDumpRoot).
    * Root is `-Dgraft.dump.root`-configurable. */
  def CellDumpRoot: String = s"${QueryPack.dumpRoot}/graft_ivf_cell_dump"

  /** Where `q_ivfpq_code_stats` dumps the (vec_id, cell, codes) table so
    * its DuckDB oracle can check the IVF-PQ BUILD cross-engine (same
    * contract as [[CellDumpRoot]], plus a codes-length invariant). */
  def CodeDumpRoot: String = s"${QueryPack.dumpRoot}/graft_ivfpq_code_dump"

  /** `q_ivfsq_codes`' dump of the IVF-SQ (vec_id, cell, codes) table.
    * Unlike the IVF-PQ dump, the SQ codes themselves are deterministic
    * and sample-free, so the oracle re-ENCODES every vector from the raw
    * embeddings and checks a per-cell weighted code sum — a wrong code
    * anywhere in a cell breaks that cell's row. */
  def IvfSqCodeDumpRoot: String = s"${QueryPack.dumpRoot}/graft_ivfsq_code_dump"

  /** Plain-PQ / OPQ code budget shared by `q_pq_recall` and
    * `q_opq_recall` (matches [[ivfPqConfig]]'s subquantizers, so the
    * three recall rows isolate residual-encoding and rotation deltas
    * one axis at a time). */
  val pqConfig: graft.ann.pq.PqConfig = graft.ann.pq.PqConfig(
    numSubvectors = 16, codesPerSubvector = 16, seed = 42L)

  /** IVF-SQ: same coarse geometry as [[ivfConfig]], SQ8 codes. */
  val ivfSqConfig: graft.ann.ivfsq.IvfSqConfig =
    graft.ann.ivfsq.IvfSqConfig(nCells = 16, nProbe = 8, seed = 42L)

  /** `q_ivfsq_search_l2_distfit`'s config: driverFitMaxSample = 1
    * forces the k-means|| coarse fit (IvfSq.fit delegates to Ivf.fit's
    * dispatch; the SQ bounds fit is an exact distributed aggregation
    * either way, so unlike IVF-PQ there is no driver sub-sample to
    * keep healthy) — the third compressed family's scale fit path
    * under the driver gate. */
  val ivfSqDistFitConfig: graft.ann.ivfsq.IvfSqConfig =
    ivfSqConfig.copy(driverFitMaxSample = 1)

  /** `q_semdedup`'s own (vec_id, cell) dump — same assignment as
    * [[CellDumpRoot]] (same seeded config) but a separate path, because
    * Verify runs queries concurrently and two queries overwriting one
    * dump directory would race. */
  def SemDedupDumpRoot: String = s"${QueryPack.dumpRoot}/graft_semdedup_dump"

  /** `q_diverse_sample`'s dumps: the (vec_id, cell) assignment plus the
    * centroid table, so DuckDB can re-derive every selection distance
    * and replay the quota rule from raw embeddings. */
  def DiverseDumpRoot: String = s"${QueryPack.dumpRoot}/graft_diverse_dump"

  private def emb(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "embeddings")

  /** The SemDeDup within-cell prune (see `q_semdedup`): per cell,
    * n_vectors / n_dropped / drop_ratio under the deterministic min-id
    * keep rule, plus the assignment-completeness invariant. `cells` is
    * (vec_id, cell); `e` the embeddings table; `nVecs` its row count.
    * The only join fan-out is within-cell (cell-keyed self-join) — the
    * cluster-bounded quadratic that is the method's own scale story. */
  private[queries] def semdedupSummary(cells: DataFrame, e: DataFrame,
                                       nVecs: Long): DataFrame = {
    val withVec = cells.join(e.select(col("vec_id"), col("embedding")), "vec_id")
    val a = withVec.select(col("cell"), col("vec_id").as("vec_a"),
      col("embedding").as("ea"))
    val b = withVec.select(col("cell"), col("vec_id").as("vec_b"),
      col("embedding").as("eb"))
    val dropped = a.join(b, Seq("cell"))
      .where(col("vec_a") < col("vec_b"))
      .where(round(exprs.cosineDistNative(col("ea"), col("eb")), 6)
        <= CosineDupThreshold)
      .select(col("cell"), col("vec_b")).distinct()
    val byCell = cells.groupBy("cell").agg(count(lit(1)).as("n_vectors"))
    val drops = dropped.groupBy("cell").agg(count(lit(1)).as("n_dropped"))
    val inv = byCell.agg(sum("n_vectors").as("tot"))
    byCell.join(drops, Seq("cell"), "left")
      .na.fill(0L, Seq("n_dropped"))
      .crossJoin(inv)
      .select(col("cell"), col("n_vectors"), col("n_dropped"),
        round(col("n_dropped").cast("double") / col("n_vectors"), 6)
          .as("drop_ratio"),
        (col("tot") === nVecs).as("total_ok"))
  }

  private def queriesDf(e: DataFrame): DataFrame =
    e.orderBy("vec_id").limit(VectorQueries.NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  /** Shared exact ground truth over the standard query set — one
    * corpus scan per (session, sf, metric) instead of one per recall
    * query: seven L2 recall queries plus the autotune sweep each
    * re-derived the identical (query_id, vec_id, dist) frame per run
    * (~1 s × 8 of board time at sf0.1). The DuckDB oracles recompute
    * their OWN ground truth regardless, so sharing changes no output. */
  private def exactGtL2(s: SparkSession, dir: String): DataFrame =
    memoized(s, dir, "exact_gt_l2") {
      val e = emb(s, dir)
      ExactNN.topKAgg(queriesDf(e), e, K, ExactNN.L2).localCheckpoint()
    }

  /** Cosine twin of [[exactGtL2]] (the graph family's metric). */
  private def exactGtCos(s: SparkSession, dir: String): DataFrame =
    memoized(s, dir, "exact_gt_cos") {
      val e = emb(s, dir)
      ExactNN.topKAgg(queriesDf(e), e, K, ExactNN.Cosine).localCheckpoint()
    }

  // The graph family's deterministic shared builds go through
  // QueryPack.memoized: five queries (k-NN graph via LSH, NN-Descent,
  // beam search, seeded beam, online insert) plus the two exact-graph
  // consumers each rebuilt near-identical seed-fixed structures per
  // run — ~45 s of a 143 s board spent on redundant builds (round-9
  // plan audit). Each query still writes its own private dump path,
  // keeping the oracle-replay contract intact.

  /** Shared default-config index fits (the same sharing pattern as the
    * graph builds): each family's default index was trained identically
    * by 3-6 queries per run; the fits are deterministic (seeded k-means
    * / exact bounds) and dump-free, so sharing deletes the redundant
    * fit jobs — the k-means families pay `iters` driver-coordinated agg
    * jobs per fit — without changing any output. Angular variants are
    * memoized too (round 13): a single consumer per VERIFY run, but the
    * bench runs every query twice and was paying each angular fit on
    * both attempts — sharing makes the cosine rows report serve cost
    * like their L2 twins, output unchanged. */
  private def ivfIdx(s: SparkSession, dir: String): graft.ann.ivf.IvfIndex =
    memoized(s, dir, "ivf_idx") {
      Ivf.train(emb(s, dir), "vec_id", "embedding", ivfConfig)
    }
  private def ivfPqIdx(s: SparkSession,
                       dir: String): graft.ann.ivfpq.IvfPqIndex =
    memoized(s, dir, "ivfpq_idx") {
      graft.ann.ivfpq.IvfPq.train(emb(s, dir), "vec_id", "embedding",
        ivfPqConfig)
    }
  private def ivfSqIdx(s: SparkSession,
                       dir: String): graft.ann.ivfsq.IvfSqIndex =
    memoized(s, dir, "ivfsq_idx") {
      graft.ann.ivfsq.IvfSq.train(emb(s, dir), "vec_id", "embedding",
        ivfSqConfig)
    }
  /** Shared plain-PQ fit (16x16, the `q_pq_recall` budget) — consumed
    * by `q_pq_recall` and as `q_opq_recall`'s unrotated baseline. */
  private def pqIdx(s: SparkSession, dir: String): graft.ann.pq.PqIndex =
    memoized(s, dir, "pq_idx") {
      graft.ann.pq.Pq.train(emb(s, dir), "vec_id", "embedding", pqConfig)
    }

  /** OPQ twin at the same budget (deterministic multi-start fit — the
    * costliest driver-side fit on the board, ~4 s at sf0.1, so the
    * build shares like every other family; dumps stay query-private). */
  private def opqIdx(s: SparkSession, dir: String): graft.ann.pq.OpqIndex =
    memoized(s, dir, "opq_idx") {
      graft.ann.pq.Opq.train(emb(s, dir), "vec_id", "embedding", pqConfig)
    }

  private def sqIdx(s: SparkSession, dir: String): graft.ann.sq.SqIndex =
    memoized(s, dir, "sq_idx") {
      graft.ann.sq.Sq.train(emb(s, dir), "vec_id", "embedding")
    }

  /** IVF-OPQ at the shared budgets — the faiss "OPQ,IVF,PQ" deployment
    * shape (`q_ivfopq_recall` sits beside `q_ivfpq_recall`, isolating
    * exactly the rotation's candidate-generation delta). Reuses the
    * memoized OPQ rotation: [[graft.ann.pq.Opq.train]] and
    * [[graft.ann.ivfpq.IvfOpq.train]] fit the identical rotation (same
    * sample, same PqConfig, same iters/inits defaults), so the board
    * pays ONE multi-start OPQ fit — the costliest driver-side fit.
    * The dependency is resolved BEFORE the memo lambda (nested
    * computeIfAbsent on the shared memo map is unsupported). */
  private def ivfOpqIdx(s: SparkSession,
                        dir: String): graft.ann.ivfpq.IvfOpqIndex = {
    val rot = opqIdx(s, dir).model.rotation
    memoized(s, dir, "ivfopq_idx") {
      val e = emb(s, dir)
      val rotated = e.select(col("vec_id"),
        graft.ann.pq.Opq.rotateCol(rot, col("embedding")).as("embedding"))
      new graft.ann.ivfpq.IvfOpqIndex(rot,
        graft.ann.ivfpq.IvfPq.train(rotated, "vec_id", "embedding",
          ivfPqConfig))
    }
  }
  private def bqIdx(s: SparkSession, dir: String): graft.ann.bq.BqIndex =
    memoized(s, dir, "bq_idx") {
      graft.ann.bq.Bq.train(emb(s, dir), "vec_id", "embedding")
    }

  /** Shared seeded LSH index over the full embeddings table — the
    * common coarse structure under every graph-family query. */
  private def graphLshIndex(s: SparkSession, dir: String): LshIndex =
    memoized(s, dir, "graph_lsh") {
      Lsh.train(emb(s, dir), "vec_id", "embedding",
        LshConfig(nTrees = 10, kMinVecs = 80, angular = true, seed = 42L))
    }

  /** Shared LSH-bucketed initial k-NN graph (KnnGraph.fromLsh). */
  private def graphInit(s: SparkSession, dir: String): DataFrame = {
    val idx = graphLshIndex(s, dir)
    memoized(s, dir, "graph_init") {
      graft.ann.KnnGraph.fromLsh(idx, emb(s, dir), "vec_id", "embedding",
          KnnK, ExactNN.Cosine, maxBucketOccupancy = 200)
        .localCheckpoint()
    }
  }

  /** Shared 1-iteration NN-Descent refinement + small-world backbone —
    * the exact walk graph both beam queries certify. */
  private def graphRefinedBackbone(s: SparkSession, dir: String): DataFrame = {
    val g0 = graphInit(s, dir)
    memoized(s, dir, "graph_refined_bb") {
      val e = emb(s, dir)
      val g = graft.ann.NnDescent.refine(g0, e, "vec_id", "embedding",
        KnnK, ExactNN.Cosine, iterations = 1)
      g.select(col("src"), col("dst"))
        .unionByName(graft.ann.GraphSearch.randomBackbone(e, "vec_id"))
        .dropDuplicates("src", "dst")
        .localCheckpoint()
    }
  }

  /** `q_graph_scoped_recall`'s maintained store: exact kNN + backbone
    * over the base corpus (all but the tail-20 ids), then ONE
    * maintainer batch — the tail-20 arrivals plus the mod-50 deletes —
    * whose refineEvery=1 cadence runs the scheduled SCOPED refine
    * inside onBatch. Everything is rule-derived and deterministic, so
    * the DuckDB oracle can reconstruct the live corpus; the store
    * builds once per (session, sf). Catalog-table names are sf-scoped
    * (Verify runs both sfs' queries in one session). */
  private def scopedGraphStore(s: SparkSession,
                               dir: String): graft.ann.GraphMaintainer = {
    // resolved BEFORE the memo lambda (the mutualExactClusters rule:
    // nested computeIfAbsent on one map throws "Recursive update")
    val gx = graphExact(s, dir)
    memoized(s, dir, "scoped_graph_store") {
      val e = emb(s, dir)
      import s.implicits._
      val name = s"scoped_row_${LshQueries.sfName(dir).replace('.', '_')}"
      graft.ann.GraphSearch.dropManagedTables(s,
        s"${name}_edges", s"${name}_swap_edges")
      val n = e.count()
      val base = e.where(col("vec_id") < n - InsertTailCount)
      // base graph = the session's exact-GT graph (memoized once,
      // consumed by four other rows — this was a second quadratic kNN
      // pass over 96% of the same corpus) restricted to base×base
      // edges: a base node whose true top-k includes a tail arrival
      // starts with k-1 out-edges, which is fine for a STARTING graph —
      // the maintainer's scoped refine (NN-Descent over the touched
      // region) is what certifies serving, and recall is graded
      // against DuckDB's own exact GT either way.
      val g = gx
        .where(col("src") < n - InsertTailCount &&
          col("dst") < n - InsertTailCount)
        .select(col("src"), col("dst"))
        .unionByName(graft.ann.GraphSearch.randomBackbone(base, "vec_id"))
        .dropDuplicates("src", "dst")
      graft.ann.GraphSearch.saveBucketed(g, name)
      val m = new graft.ann.GraphMaintainer(s, name,
        java.nio.file.Files.createTempDirectory(s"${name}_lsm").toString,
        "vec_id", "embedding", k = KnnK, beamWidth = BeamWidth,
        hops = BeamHops, refineEvery = 1, maxReverseDegree = InsertRevCap,
        scopedRefine = true, scopeHops = 1)
      val arrivals = e.where(col("vec_id") >= n - InsertTailCount)
      val deletes = e.where(pmod(col("vec_id"), lit(TombstoneMod)) === 0 &&
        col("vec_id") < n - InsertTailCount).select("vec_id")
      val entries = arrivals.select(col("vec_id").as("query_id"))
        .crossJoin((0L until InsertEntries).toDF("node"))
      m.onBatch(e, arrivals, entries, Some(deletes))
      m
    }
  }

  /** Shared exact (quadratic) k-NN ground-truth graph — the oracle
    * baseline consumed by four queries. */
  private def graphExact(s: SparkSession, dir: String): DataFrame =
    memoized(s, dir, "graph_exact") {
      graft.ann.KnnGraph.exact(emb(s, dir), "vec_id", "embedding", KnnK,
          ExactNN.Cosine)
        .localCheckpoint()
    }

  /** Shared exact mutual-kNN clusters (mutual + ceiling + CC over the
    * exact graph) — consumed by `q_mutual_knn_clusters` (as the
    * answer) and `q_mutual_knn_clusters_lsh` (as the grading target);
    * the CC rounds are the expensive half of both. */
  private def mutualExactClusters(s: SparkSession, dir: String): DataFrame = {
    // resolved BEFORE the memo lambda — nested computeIfAbsent on one
    // map throws "Recursive update" (the QueryPack.memoized contract;
    // graphInit's pattern)
    val gx = graft.ann.KnnGraph.withMutual(graphExact(s, dir))
    memoized(s, dir, "mutual_exact_clusters") {
      graft.text.Dedup.connectedComponents(
          gx.where(col("mutual") && col("src") < col("dst")
              && col("dist") <= MutualDistMax)
            .select(col("src").as("doc_a"), col("dst").as("doc_b")))
        .localCheckpoint()
    }
  }

  /** Shared cross-set similarity-join pairs (even-id set indexed, odd-id
    * set probing) — consumed by `q_lsh_sim_join` (per-pair distance
    * gate) and `q_lsh_sim_join_recall` (completeness grade), each with
    * its own dump path. */
  private def simJoinPairs(s: SparkSession, dir: String): DataFrame =
    memoized(s, dir, "lsh_sim_join_pairs") {
      val e = emb(s, dir)
      val a = e.where(pmod(col("vec_id"), lit(2)) === 0)
      val b = e.where(pmod(col("vec_id"), lit(2)) === 1)
      val idx = Lsh.train(a, "vec_id", "embedding",
        LshConfig(nTrees = 10, kMinVecs = 50, angular = true, seed = 42L))
      idx.similarityJoin(b, "vec_id", "embedding", CosineDupThreshold,
          ExactNN.Cosine, maxBucketOccupancy = 200)
        .localCheckpoint()
    }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact embedding near-dup pairs (quadratic baseline, oracle-checked).
    "q_embedding_near_dup" -> ((s, dir) => {
      val e = emb(s, dir)
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
      a.join(b, col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          round(exprs.cosineDistNative(col("ea"), col("eb")), 6).as("cos_dist"))
        .where(col("cos_dist") <= CosineDupThreshold)
        .orderBy("vec_a", "vec_b")
    }),

    // Scale path: LSH-bucket candidates -> exact cosine verify. Bucket
    // join shuffles on (tree_id, hash), never all-pairs; the per-bucket
    // occupancy cap (LshIndex.cappedBuckets) bounds join fan-out even in
    // the corpus >> fit-sample regime, where kMinVecs alone does not
    // bound bucket size. The cap is far above any bucket at test scale,
    // so results here are identical to uncapped.
    "q_lsh_near_dup_pairs" -> ((s, dir) => {
      val e = emb(s, dir)
      val idx = Lsh.train(e, "vec_id", "embedding",
        LshConfig(nTrees = 10, kMinVecs = 50, angular = true, seed = 42L))
      val cands = idx.candidatePairs(maxBucketOccupancy = 200)
      val pairs = cands
        .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), "vec_a")
        .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("eb")), "vec_b")
        .select(col("vec_a"), col("vec_b"),
          round(exprs.cosineDistNative(col("ea"), col("eb")), 6).as("cos_dist"))
        .where(col("cos_dist") <= CosineDupThreshold)
        // `within` is trivially true here (the line above filtered on it)
        // — it exists so the DuckDB oracle, which RECOMPUTES each pair's
        // cosine from the embeddings table, re-derives the same boolean:
        // a wrong Spark-side distance or an over-threshold pair breaks
        // the cross-engine hash. pairs ⊆ exact-near-dup-set follows.
        .withColumn("within", col("cos_dist") <= CosineDupThreshold)
      LshQueries.dumpAndReload(s, pairs,
          s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/lsh_near_dup")
        .orderBy("vec_a", "vec_b")
    }),

    // Cross-set LSH similarity join (LshIndex.similarityJoin — SURVEY
    // §7.5's "LSH join of two embedding sets", the record-linkage /
    // cross-corpus shape): set B (odd vec_ids) probes the forest fitted
    // on set A (even vec_ids), same-bucket candidates exact-verified
    // under the near-dup threshold. Every returned pair carries the
    // exact cosine, so DuckDB recomputes each distance + the within
    // flag from the raw embeddings (pairs ⊆ the exact cross-set
    // near-dup set — the q_lsh_near_dup_pairs gate, cross-set form).
    "q_lsh_sim_join" -> ((s, dir) => {
      val pairs = simJoinPairs(s, dir)
      LshQueries.dumpAndReload(s,
          pairs.withColumn("within", col("dist") <= CosineDupThreshold),
          s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/lsh_sim_join")
        .orderBy("vec_a", "vec_b")
    }),

    // Completeness grade for the cross-set join: found ⊆ exact by
    // construction (the verified-threshold filter), so recall =
    // |found| / |exact cross-set pairs under the threshold|. DuckDB
    // re-derives BOTH sides — the exact set from the raw embeddings
    // (quadratic cross-parity join), the found count from this query's
    // own dump.
    "q_lsh_sim_join_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val found = LshQueries.dumpAndReload(s, simJoinPairs(s, dir),
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/lsh_sim_join_rec")
      val exact = e.where(pmod(col("vec_id"), lit(2)) === 0)
        .select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
        .join(e.where(pmod(col("vec_id"), lit(2)) === 1)
          .select(col("vec_id").as("vec_b"), col("embedding").as("eb")))
        .where(round(exprs.cosineDistNative(col("ea"), col("eb")), 6)
          <= CosineDupThreshold)
      found.agg(count(lit(1)).as("n_found"))
        .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
        .select(col("n_found"), col("n_exact"),
          round(col("n_found").cast("double") / col("n_exact"), 4)
            .as("sim_recall"))
    }),

    // IVF ANN search (L2) over the standard 100-query set. Self-graded:
    // each row's dist is recomputed exactly in the same job
    // (Eval.withValidity); rows are also dumped so the DuckDB oracle
    // re-derives `valid` cross-engine (LshQueries.SearchDumpRoot).
    "q_ivf_search_l2" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = ivfIdx(s, dir)
      val res = Eval.withValidity(idx.searchAll(q, K, ExactNN.L2), e, q, ExactNN.L2)
      LshQueries.dumpAndReload(s, res,
          s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/ivf_l2")
        .orderBy("query_id", "dist", "vec_id")
    }),

    // Distributed-fit twin of q_ivf_search_l2: driverFitMaxSample = 1
    // forces the MLlib k-means|| coarse fit (the fit path a 100 TB
    // corpus uses, where FitSample.collectVectors stops holding), then
    // serves the same 100-query L2 search under the same per-pair
    // distance oracle — cheap insurance that the distributed fit's
    // index SERVES correctly under the driver gate, not only in specs.
    // The cell geometry differs from the driver fit (seeded k-means||
    // init — DistributedFitSpec's recall-parity contract), so this row
    // re-verifies distances, not cell assignments.
    "q_ivf_search_l2_distfit" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = memoized(s, dir, "ivf_dist_idx") {
        Ivf.train(e, "vec_id", "embedding", ivfDistFitConfig)
      }
      val res = Eval.withValidity(idx.searchAll(q, K, ExactNN.L2), e, q,
        ExactNN.L2)
      LshQueries.dumpAndReload(s, res,
          s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/ivf_l2_distfit")
        .orderBy("query_id", "dist", "vec_id")
    }),

    // Angular IVF search: spherical cells + exact-cosine scoring — the
    // cosine half of q_ivf_search_l2, same dump-and-recheck oracle
    // (every returned pair's cosine recomputed by DuckDB). Completes
    // both-metric oracle coverage for the IVF family (LSH and IVF-PQ
    // already have cosine rows).
    "q_ivf_search_cosine" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = memoized(s, dir, "ivf_idx_ang") {
        Ivf.train(e, "vec_id", "embedding", ivfAngularConfig)
      }
      val res = Eval.withValidity(idx.searchAll(q, K, ExactNN.Cosine), e, q,
        ExactNN.Cosine)
      LshQueries.dumpAndReload(s, res,
          s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/ivf_cosine")
        .orderBy("query_id", "dist", "vec_id")
    }),

    // IVF recall vs exact ground truth at the same k. Predictions are
    // dumped so the DuckDB oracle recomputes the ground truth itself and
    // re-derives the recall aggregate cross-engine (LshQueries.recallOracle).
    "q_ivf_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = ivfIdx(s, dir)
      val pred = LshQueries.dumpAndReload(s, idx.searchAll(q, K, ExactNN.L2),
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/ivf_recall_l2")
      val gt = exactGtL2(s, dir)
      Eval.setPrecisionRecall(pred, gt)
        .agg(
          round(avg("precision"), 4).as("avg_precision"),
          round(avg("recall"), 4).as("avg_recall"),
          count(lit(1)).as("n_queries"))
    }),

    // IVF selectivity dispatch under the oracle — the IVF twin of
    // q_lsh_search_filtered_selective: a 2% allow-list binds
    // IvfIndex.searchAllFiltered's exact-scan path
    // (FilteredSearch.useExactScan), so recall vs DuckDB's own filtered
    // exact ground truth must be EXACTLY 1.0.
    "q_ivf_search_filtered_selective" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = ivfIdx(s, dir)
      val allowed = e.where(col("vec_id") % 50 === 0)
      val pred = LshQueries.dumpAndReload(s,
        idx.searchAllFiltered(q, allowed, K, ExactNN.L2),
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/ivf_filtered_selective")
      val gt = ExactNN.topK(q, allowed, K, ExactNN.L2)
      Eval.setPrecisionRecall(pred, gt)
        .agg(
          round(avg("precision"), 4).as("avg_precision"),
          round(avg("recall"), 4).as("avg_recall"),
          count(lit(1)).as("n_queries"))
    }),

    // Recall-targeted operating-point selection under the oracle
    // (graft.ann.AutoTune — the production form of the reference's
    // annbench sweep, annbench.go:165-187): four nProbe arms searched
    // on the validation query sample, each arm's raw predictions
    // dumped, per-arm recall graded vs exact GT, the cheapest arm
    // meeting the 0.95 target flagged. DuckDB recomputes the ground
    // truth, re-derives every arm's recall from the dumps, and replays
    // the min-arm-meeting-target rule — the WHOLE tuning decision is
    // cross-engine checked, not just the recall numbers.
    "q_autotune_ivf_nprobe" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = ivfIdx(s, dir)
      // shared-scan form: one scored candidate pass at the max arm,
      // smaller arms cut by probe rank — row-identical to the per-arm
      // sweep (AutoTuneSpec), |arms|x fewer corpus-candidate scans.
      // ALL arms' predictions land in ONE dump (one write+reload
      // round-trip instead of |arms|), and the exact GT is the memoized
      // shared scan the recall queries grade against — together the
      // round-11 board-cost trim (6.6 s -> target ≤4 s), decision
      // unchanged: DuckDB still re-derives every arm's recall from the
      // dump and replays the choice rule.
      val preds = graft.ann.AutoTune.ivfNProbeSharedPreds(idx, q, K,
        AutoTuneArms, ExactNN.L2)
      val reloaded = LshQueries.dumpAndReload(s, preds,
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/autotune_nprobe_arms")
      graft.ann.AutoTune.gradeArms(AutoTuneArms, reloaded,
          exactGtL2(s, dir), AutoTuneTarget)
        .orderBy("arm")
    }),

    // Graph-family tuning knob under the oracle — completes the tuning
    // matrix (LSH trees / IVF nProbe / PQ rerankDepth / graph beam):
    // three beamWidth arms walked over the shared refined+backboned
    // graph from the standard global entry set, every arm's raw
    // predictions dumped in one table, per-arm recall graded vs the
    // exact cosine ground truth FROM THE GT SIDE (a query an arm
    // returned nothing for scores 0, not skipped), cheapest arm meeting
    // the target flagged. DuckDB recomputes its own GT, re-derives each
    // arm's recall from the dump, and replays the choice rule — the
    // whole tuning decision cross-engine, like q_autotune_ivf_nprobe.
    "q_autotune_graph_beam" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val g = graphRefinedBackbone(s, dir)
      import s.implicits._
      val entries = q.select(col("query_id"))
        .crossJoin((0L until BeamEntries).toDF("node"))
      // the three arm walks are independent bounded-job chains whose
      // per-hop stages leave most cores idle — run them concurrently
      // (beamFrom materializes eagerly, so each Future IS the walk);
      // results are arm-independent, so scheduling cannot change a row
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      val armFrames = Await.result(
        Future.sequence(GraphBeamArms.map { b => Future {
          graft.ann.GraphSearch.beamFrom(g, e, "vec_id", "embedding", q,
              entries, K, b, BeamHops)
            .withColumn("arm", lit(b))
        }}),
        scala.concurrent.duration.Duration.Inf)
      val preds = armFrames.reduce(_ unionByName _)
      val reloaded = LshQueries.dumpAndReload(s,
        preds.select(col("arm"), col("query_id"), col("vec_id"), col("dist")),
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/autotune_beam_arms")
      graft.ann.AutoTune.gradeArms(GraphBeamArms, reloaded,
          exactGtCos(s, dir), GraphBeamTarget)
        .orderBy("arm")
    }),

    // Compressed-scan tuning knob under the oracle — the BQ Hamming
    // candidate depth, completing the tuning matrix's last edge (LSH
    // trees / IVF nProbe / PQ rerankDepth / graph beam / BQ depth):
    // four depth arms of the deployment-shape search (Hamming scan to
    // depth d, exact L2 rerank to top-k), every arm's predictions in
    // one dump, per-arm recall graded GT-side vs the shared exact
    // ground truth, cheapest arm meeting the target flagged. DuckDB
    // recomputes its own GT, re-derives each arm's recall from the
    // dump, and replays the choice rule — the decision that sets
    // [[BqRerankDepth]] (the previously hand-set constant) is itself
    // cross-engine checked.
    "q_autotune_bq_depth" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = bqIdx(s, dir)
      // shared-scan form (the sweepIvfNProbeShared pattern): the
      // Hamming ordering is deterministic by (hamming, vec_id), so arm
      // d's candidate set is exactly the first d of the max arm's
      // ranking — ONE packed-codes scan and ONE exact rescore of the
      // max arm's candidates serve every arm (each arm is then a
      // bounded rank-filter + TopK), row-identical to the per-arm
      // searchRerank the sweep method runs (AutoTune.sweepBqDepth).
      val maxArm = BqDepthArms.max
      val ranked = idx.searchHamming(q, maxArm)
        .groupBy("query_id")
        .agg(graft.ann.TopK.topK(maxArm)(col("vec_id"),
          col("hamming").cast("double")).as("nn"))
        .select(col("query_id"), posexplode(col("nn")))
        .select(col("query_id"), col("pos").as("hrank"),
          col("col.vec_id").as("vec_id"))
      val scored = ranked
        .join(e.select(col("vec_id"), col("embedding")), "vec_id")
        .join(broadcast(q), "query_id")
        .select(col("query_id"), col("vec_id"), col("hrank"),
          round(ExactNN.L2.dist(col("qv"), col("embedding")), 6).as("dist"))
        .localCheckpoint()
      val armFrames = BqDepthArms.map { d =>
        graft.ann.TopK.perQueryTopK(
            scored.where(col("hrank") < d)
              .select("query_id", "vec_id", "dist"),
            K, viaAggregator = true)
          .withColumn("arm", lit(d))
      }
      val reloaded = LshQueries.dumpAndReload(s,
        armFrames.reduce(_ unionByName _)
          .select(col("arm"), col("query_id"), col("vec_id"), col("dist")),
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/autotune_bq_arms")
      graft.ann.AutoTune.gradeArms(BqDepthArms, reloaded,
          exactGtL2(s, dir), AutoTuneTarget)
        .orderBy("arm")
    }),

    // SQ rerank-depth sweep — the BQ twin's 8-bit counterpart and the
    // tuning matrix's final row (AutoTune.sweepSqRerankDepth was
    // spec-gated only): the same shared-scan decision replay, over the
    // quantized-scan ordering instead of the Hamming one. The point the
    // sweep PROVES rather than assumes: at 255 levels the quantized
    // scan ranks nearly exactly, so the depth floors at k itself —
    // [[SqRerankDepth]] is the certified cheapest arm, and the
    // q_sq_search_l2 / q_sq_recall family serves with it.
    "q_autotune_sq_depth" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = sqIdx(s, dir)
      // shared-scan form: the quantized ordering is deterministic by
      // (dist, vec_id), so arm d's candidate set is exactly the first
      // d of the max arm's ranking — ONE decoded-codes scan and ONE
      // exact rescore serve every arm (row-identical to the per-arm
      // searchRerank AutoTune.sweepSqRerankDepth runs).
      val maxArm = SqDepthArms.max
      val ranked = idx.searchAll(q, maxArm)
        .groupBy("query_id")
        .agg(graft.ann.TopK.topK(maxArm)(col("vec_id"), col("dist")).as("nn"))
        .select(col("query_id"), posexplode(col("nn")))
        .select(col("query_id"), col("pos").as("qrank"),
          col("col.vec_id").as("vec_id"))
      val scored = ranked
        .join(e.select(col("vec_id"), col("embedding")), "vec_id")
        .join(broadcast(q), "query_id")
        .select(col("query_id"), col("vec_id"), col("qrank"),
          round(ExactNN.L2.dist(col("qv"), col("embedding")), 6).as("dist"))
        .localCheckpoint()
      val armFrames = SqDepthArms.map { d =>
        graft.ann.TopK.perQueryTopK(
            scored.where(col("qrank") < d)
              .select("query_id", "vec_id", "dist"),
            K, viaAggregator = true)
          .withColumn("arm", lit(d))
      }
      val reloaded = LshQueries.dumpAndReload(s,
        armFrames.reduce(_ unionByName _)
          .select(col("arm"), col("query_id"), col("vec_id"), col("dist")),
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/autotune_sq_arms")
      graft.ann.AutoTune.gradeArms(SqDepthArms, reloaded,
          exactGtL2(s, dir), AutoTuneTarget)
        .orderBy("arm")
    }),

    // IVF index lifecycle under the oracle — the IVF twin of
    // q_lsh_search_deleted (IvfIndex.withDeletes, tombstone serve-time
    // view; full view == exact semantics spec-gated in LifecycleSpec's
    // all-probe config). Every returned pair is distance-recomputed
    // from the raw embeddings AND re-checked against the tombstone
    // predicate cross-engine.
    "q_ivf_search_deleted" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = ivfIdx(s, dir)
      val dead = e.where(col("vec_id") % 7 === 0).select("vec_id")
      val res = Eval.withValidity(
          idx.withDeletes(dead).searchAll(q, K, ExactNN.L2), e, q, ExactNN.L2)
        .withColumn("valid", col("valid") && col("vec_id") % 7 =!= 0)
      LshQueries.dumpAndReload(s, res,
          s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/ivf_deleted")
        .orderBy("query_id", "dist", "vec_id")
    }),

    // IVF cell occupancy + build invariants, computed over the
    // parquet-dumped (vec_id, cell) table so DuckDB aggregates the SAME
    // assignment (see CellDumpRoot): `total_ok` is cross-engine (Spark
    // counts the dump, DuckDB counts embeddings — equal iff assignment
    // is complete and unique), `cell_count_ok` checks occupancy ≤ nCells.
    "q_ivf_cell_stats" -> ((s, dir) => {
      val e = emb(s, dir)
      val idx = ivfIdx(s, dir)
      val dump = s"$CellDumpRoot/${LshQueries.sfName(dir)}"
      idx.cells.write.mode("overwrite").parquet(dump)
      val nVecs = e.count()
      val byCell = s.read.parquet(dump)
        .groupBy("cell").agg(count(lit(1)).as("n_vectors"))
      val inv = byCell.agg(sum("n_vectors").as("tot"), count(lit(1)).as("nc"))
      byCell.crossJoin(inv)
        .select(col("cell"), col("n_vectors"),
          (col("tot") === nVecs).as("total_ok"),
          (col("nc") <= ivfConfig.nCells).as("cell_count_ok"))
        .orderBy("cell")
    }),

    // IVF-PQ (IVFADC) rerank search: cell-pruned ADC candidates + exact
    // re-rank — returned distances are exact, so the DuckDB oracle
    // recomputes every returned pair's distance from the embeddings
    // table and re-derives `valid` cross-engine (same gate as
    // q_ivf_search_l2; the seeded two-quantizer fit stays spec-gated in
    // IvfPqSpec).
    "q_ivfpq_search_l2" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = ivfPqIdx(s, dir)
      val res = Eval.withValidity(
        idx.searchRerank(q, e.select(col("vec_id"), col("embedding")), K, 100),
        e, q, ExactNN.L2)
      LshQueries.dumpAndReload(s, res,
          s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/ivfpq_l2")
        .orderBy("query_id", "dist", "vec_id")
    }),

    // Distributed-fit twin of q_ivfpq_search_l2 ([[ivfPqDistFitConfig]]
    // forces IvfPq.fitDistributedCoarse): same deployment-shape rerank
    // search, same per-pair distance recompute oracle — the compressed
    // family's past-driver-bound fit path under CORRECTNESS, not only
    // under DistributedFitSpec.
    "q_ivfpq_search_l2_distfit" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = memoized(s, dir, "ivfpq_dist_idx") {
        graft.ann.ivfpq.IvfPq.train(e, "vec_id", "embedding",
          ivfPqDistFitConfig)
      }
      val res = Eval.withValidity(
        idx.searchRerank(q, e.select(col("vec_id"), col("embedding")), K, 100),
        e, q, ExactNN.L2)
      LshQueries.dumpAndReload(s, res,
          s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/ivfpq_l2_distfit")
        .orderBy("query_id", "dist", "vec_id")
    }),

    // Constrained IVF-PQ rerank search via the scan-side codesFilter
    // (the filtered-DiskANN shape: the predicate runs on the codes
    // scan — zero joins, disallowed rows never scored and never
    // consuming rerank slots; the stored-metadata-column layout is
    // spec'd in IvfPqSpec). The predicate here references vec_id,
    // already a codes column, so the SHARED index serves directly —
    // no second instance, no duplicate corpus count. The oracle
    // recomputes every returned pair's exact distance AND re-checks
    // the predicate on the returned id — one disallowed row flips
    // `valid` cross-engine.
    "q_ivfpq_search_filtered" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = ivfPqIdx(s, dir)
      val res = Eval.withValidity(
        idx.searchRerank(q, e.select(col("vec_id"), col("embedding")),
          K, 100, codesFilter = Some(col("vec_id") % 2 === 0)),
        e, q, ExactNN.L2)
      LshQueries.dumpAndReload(s, res,
          s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/ivfpq_filtered")
        .orderBy("query_id", "dist", "vec_id")
    }),

    // Angular IVF-PQ rerank search: both quantizers fit the unit sphere
    // (cosine ranking == L2 ranking on normalized vectors — the same
    // metric coupling the reference ties to angular indexing,
    // lsh/hasher.go:121-132) and rerank is exact cosine. This puts the
    // angular compressed-index path — previously probe-measured and
    // spec-gated only — under the same cross-engine per-pair distance
    // oracle as q_ivfpq_search_l2 / q_lsh_search_cosine.
    "q_ivfpq_search_cosine" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = memoized(s, dir, "ivfpq_idx_ang") {
        graft.ann.ivfpq.IvfPq.train(e, "vec_id", "embedding",
          ivfPqConfig.copy(angular = true))
      }
      val res = Eval.withValidity(
        idx.searchRerank(q, e.select(col("vec_id"), col("embedding")), K, 100),
        e, q, ExactNN.Cosine)
      LshQueries.dumpAndReload(s, res,
          s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/ivfpq_cosine")
        .orderBy("query_id", "dist", "vec_id")
    }),

    // IVF-PQ recall: ADC-only vs ADC+exact-rerank against exact ground
    // truth, both prediction sets dumped so the DuckDB oracle recomputes
    // the ground truth and both recall aggregates cross-engine (mirrors
    // q_pq_recall — the delta between the two queries is the residual
    // encoding + cell pruning).
    "q_ivfpq_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = ivfPqIdx(s, dir)
      val gt = exactGtL2(s, dir)
      val dumpBase = s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}"
      val adcPred = LshQueries.dumpAndReload(s, idx.searchAll(q, K),
        s"$dumpBase/ivfpq_adc")
      val rerPred = LshQueries.dumpAndReload(s,
        idx.searchRerank(q, e.select(col("vec_id"), col("embedding")), K, 100),
        s"$dumpBase/ivfpq_rerank")
      val adc = Eval.setPrecisionRecall(adcPred, gt)
        .agg(round(avg("recall"), 4).as("adc_recall"))
      val rer = Eval.setPrecisionRecall(rerPred, gt)
        .agg(round(avg("recall"), 4).as("rerank_recall"))
      adc.crossJoin(rer)
    }),

    // IVF-OPQ recall — the faiss "OPQ,IVF,PQ" production shape under
    // the oracle, beside q_ivfpq_recall at the SAME coarse geometry and
    // code budget so the two rows isolate exactly the learned rotation:
    // rotated-space candidate generation (ADC over residual codes of
    // the rotated corpus), original-space exact L2 rerank (the rotation
    // is an isometry — IvfOpq scaladoc). Both prediction sets are
    // dumped and regraded against DuckDB's OWN exact ground truth, so
    // the IVF-OPQ-vs-IVF-PQ delta reads directly off the board: compare
    // adc_recall here to q_ivfpq_recall's (win on anisotropic data,
    // wash on near-isotropic — the SCALE.md measured story; extends the
    // reference's recall grading, annbench/annbench.go:165-187).
    "q_ivfopq_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = ivfOpqIdx(s, dir)
      val gt = exactGtL2(s, dir)
      val dumpBase = s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}"
      val adcPred = LshQueries.dumpAndReload(s, idx.searchAll(q, K),
        s"$dumpBase/ivfopq_adc")
      val rerPred = LshQueries.dumpAndReload(s,
        idx.searchRerank(q, e.select(col("vec_id"), col("embedding")), K, 100),
        s"$dumpBase/ivfopq_rerank")
      val adc = Eval.setPrecisionRecall(adcPred, gt)
        .agg(round(avg("recall"), 4).as("adc_recall"))
      val rer = Eval.setPrecisionRecall(rerPred, gt)
        .agg(round(avg("recall"), 4).as("rerank_recall"))
      adc.crossJoin(rer)
    }),

    // IVF-PQ build invariants over the parquet-dumped (vec_id, cell,
    // codes) table: DuckDB aggregates the SAME dump — `total_ok` is
    // cross-engine (Spark counts the dump, DuckDB counts embeddings),
    // `cell_count_ok` bounds occupancy, `codes_len_ok` checks every code
    // row has exactly numSubvectors entries.
    "q_ivfpq_code_stats" -> ((s, dir) => {
      val e = emb(s, dir)
      val idx = ivfPqIdx(s, dir)
      val dump = s"$CodeDumpRoot/${LshQueries.sfName(dir)}"
      idx.codes.write.mode("overwrite").parquet(dump)
      val nVecs = e.count()
      val byCell = s.read.parquet(dump)
        .groupBy("cell").agg(count(lit(1)).as("n_vectors"),
          sum(when(size(col("codes")) === ivfPqConfig.numSubvectors, 0L)
            .otherwise(1L)).as("bad_len"))
      val inv = byCell.agg(sum("n_vectors").as("tot"), count(lit(1)).as("nc"),
        sum("bad_len").as("badtot"))
      byCell.crossJoin(inv)
        .select(col("cell"), col("n_vectors"),
          (col("tot") === nVecs).as("total_ok"),
          (col("nc") <= ivfPqConfig.nCells).as("cell_count_ok"),
          (col("badtot") === 0L).as("codes_len_ok"))
        .orderBy("cell")
    }),

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    // deduplication = k-means cluster the embedding space, then drop
    // within-cluster near-duplicates by cosine. The clusters BOUND the
    // quadratic — pairs form only inside a cell (cell-keyed self-join,
    // never corpus all-pairs), which is the published method's own
    // 100 TB story: grow nCells with the corpus so cell occupancy stays
    // flat. Deterministic keep rule: a vector is dropped iff a
    // LOWER-vec_id vector in the same cell sits within
    // CosineDupThreshold (keep-the-min-id representative). The seeded
    // k-means fit is gated by the (vec_id, cell) dump: DuckDB re-derives
    // every within-cell pair's cosine, the drop set, and the per-cell
    // summary from the dump + raw embeddings (total_ok additionally
    // proves the assignment is complete, so no pair can hide).
    "q_semdedup" -> ((s, dir) => {
      val e = emb(s, dir)
      val idx = ivfIdx(s, dir)
      val dump = s"$SemDedupDumpRoot/${LshQueries.sfName(dir)}"
      idx.cells.write.mode("overwrite").parquet(dump)
      semdedupSummary(s.read.parquet(dump), e, e.count()).orderBy("cell")
    }),

    // Diversity-preserving coreset subsample — the curation step that
    // caps redundant regions while keeping coverage: per IVF cell keep
    // the ceil(sqrt(n_cell)) vectors CLOSEST to the centroid (quota
    // sublinear in cell mass downweights dense regions; closest-to-
    // centroid = the cell's most representative members; ties by
    // vec_id). Scale shape: distances are one broadcast-centroid
    // map-side pass; the per-cell cut is the bounded TopK aggregator
    // at the GLOBAL max quota (fixed by one driver-side agg), then the
    // per-cell quota filter — no corpus-wide or per-cell full sort.
    // Cells + centroids are dumped so DuckDB re-derives every
    // selection distance from raw embeddings and replays rank + quota.
    "q_diverse_sample" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
      val idx = ivfIdx(s, dir)
      val dump = s"$DiverseDumpRoot/${LshQueries.sfName(dir)}"
      idx.cells.write.mode("overwrite").parquet(s"$dump/cells")
      idx.model.centroids.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "centroid")
        .write.mode("overwrite").parquet(s"$dump/centroids")
      val cells = s.read.parquet(s"$dump/cells")
      val cents = s.read.parquet(s"$dump/centroids")
      // one distance pass: the TopK cut re-reads the checkpoint, and
      // the per-cell counts (<= nCells rows) collect once to both fix
      // the global cap and feed the quota join as a local relation
      val withDist = cells
        .join(e.select(col("vec_id"), col("embedding")), "vec_id")
        .join(broadcast(cents), "cell")
        .select(col("cell"), col("vec_id"),
          round(exprs.l2DistNative(col("embedding").cast("array<double>"),
            col("centroid")), 6).as("dist"))
        .localCheckpoint()
      val quotaRows = withDist.groupBy("cell")
        .agg(count(lit(1)).as("n_cell")).collect()
      val quotas = quotaRows.map(r => (r.getInt(0), r.getLong(1))).toSeq
        .toDF("cell", "n_cell")
      val maxQuota = math.ceil(math.sqrt(
        quotaRows.map(_.getLong(1)).max.toDouble)).toInt
      withDist
        .groupBy("cell")
        .agg(graft.ann.TopK.topK(maxQuota)(col("vec_id"), col("dist")).as("nn"))
        .select(col("cell"), posexplode(col("nn")))
        .select(col("cell"), (col("pos") + 1).cast("long").as("rank"),
          col("col.vec_id").as("vec_id"), col("col.dist").as("dist"))
        .join(broadcast(quotas), "cell")
        .where(col("rank") <= ceil(sqrt(col("n_cell"))))
        .select(col("cell"), col("rank"), col("vec_id"), col("dist"),
          col("n_cell"))
        .orderBy("cell", "rank")
    }),

    // PQ compressed-search recall: ADC-only vs ADC+exact-rerank against
    // exact ground truth. Both prediction sets are dumped so the DuckDB
    // oracle recomputes the ground truth and both recall aggregates
    // cross-engine (the seeded k-means internals stay gated by PqSpec).
    "q_pq_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = pqIdx(s, dir)
      val gt = exactGtL2(s, dir)
      val dumpBase = s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}"
      val adcPred = LshQueries.dumpAndReload(s, idx.searchAll(q, K),
        s"$dumpBase/pq_adc")
      val rerPred = LshQueries.dumpAndReload(s,
        idx.searchRerank(q, e.select(col("vec_id"), col("embedding")), K, 100),
        s"$dumpBase/pq_rerank")
      val adc = Eval.setPrecisionRecall(adcPred, gt)
        .agg(round(avg("recall"), 4).as("adc_recall"))
      val rer = Eval.setPrecisionRecall(rerPred, gt)
        .agg(round(avg("recall"), 4).as("rerank_recall"))
      adc.crossJoin(rer)
    }),

    // OPQ vs plain PQ at the SAME code budget: ADC recall of both
    // against exact ground truth (Ge et al. CVPR 2013 — a learned
    // orthogonal rotation before PQ; fit alternation + never-worse
    // contract spec-gated in OpqSpec). Both prediction dumps are
    // regraded by DuckDB's own GT, so the comparison itself is
    // cross-engine — the rotation's value shows up (or honestly
    // doesn't, on isotropic data) as the opq_recall − pq_recall gap.
    "q_opq_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val pq = pqIdx(s, dir)
      val opq = opqIdx(s, dir)
      val gt = exactGtL2(s, dir)
      val dumpBase = s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}"
      val pqPred = LshQueries.dumpAndReload(s, pq.searchAll(q, K),
        s"$dumpBase/opq_pq_adc")
      val opqPred = LshQueries.dumpAndReload(s, opq.searchAll(q, K),
        s"$dumpBase/opq_adc")
      val a = Eval.setPrecisionRecall(pqPred, gt)
        .agg(round(avg("recall"), 4).as("pq_recall"))
      val b = Eval.setPrecisionRecall(opqPred, gt)
        .agg(round(avg("recall"), 4).as("opq_recall"))
      a.crossJoin(b)
    }),

    // IVF-SQ build: the (vec_id, cell, codes) dump carries the usual
    // cell invariants (assignment completeness, cell count) PLUS a
    // per-cell weighted code sum that DuckDB recomputes from its OWN
    // re-encode of the raw embeddings (the SQ bounds are deterministic
    // and sample-free) — a single wrong code anywhere in a cell breaks
    // that cell's row cross-engine.
    "q_ivfsq_codes" -> ((s, dir) => {
      val e = emb(s, dir)
      val idx = ivfSqIdx(s, dir)
      val dump = s"$IvfSqCodeDumpRoot/${LshQueries.sfName(dir)}"
      idx.codes.write.mode("overwrite").parquet(dump)
      val nVecs = e.count()
      val byCell = s.read.parquet(dump)
        .select(col("cell"), posexplode(col("codes")))
        .groupBy("cell")
        .agg((count(lit(1)) / idx.sq.dims).cast("bigint").as("n_vectors"),
          sum(col("col").cast("bigint") * (col("pos") + 1)).as("code_wsum"))
      val inv = byCell.agg(sum("n_vectors").as("tot"), count(lit(1)).as("nc"))
      byCell.crossJoin(inv)
        .select(col("cell"), col("n_vectors"), col("code_wsum"),
          (col("tot") === nVecs).as("total_ok"),
          (col("nc") <= ivfSqConfig.nCells).as("cell_count_ok"))
        .orderBy("cell")
    }),

    // IVF-SQ rerank search: cell-pruned quantized candidates + exact
    // re-rank — returned distances are exact, per-pair oracle (same
    // gate as q_ivfpq_search_l2).
    "q_ivfsq_search_l2" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = ivfSqIdx(s, dir)
      val res = Eval.withValidity(
        idx.searchRerank(q, e.select(col("vec_id"), col("embedding")), K, 100),
        e, q, ExactNN.L2)
      LshQueries.dumpAndReload(s, res,
          s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/ivfsq_l2")
        .orderBy("query_id", "dist", "vec_id")
    }),

    // Distributed-fit twin of q_ivfsq_search_l2 ([[ivfSqDistFitConfig]]
    // forces Ivf.fitCentroidsDistributed under the IVF-SQ build): all
    // three compressed IVF families' 100 TB fit paths now sit under the
    // per-pair distance oracle (IVF, IVF-PQ, IVF-SQ; IVF-OPQ trains
    // through IvfPq on the rotated corpus, so the IVF-PQ row covers
    // its dispatch).
    "q_ivfsq_search_l2_distfit" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = memoized(s, dir, "ivfsq_dist_idx") {
        graft.ann.ivfsq.IvfSq.train(e, "vec_id", "embedding",
          ivfSqDistFitConfig)
      }
      val res = Eval.withValidity(
        idx.searchRerank(q, e.select(col("vec_id"), col("embedding")), K, 100),
        e, q, ExactNN.L2)
      LshQueries.dumpAndReload(s, res,
          s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/ivfsq_l2_distfit")
        .orderBy("query_id", "dist", "vec_id")
    }),

    // Angular IVF-SQ rerank search: spherical cells + SQ codes over the
    // normalized vectors, exact-cosine rerank — keeps the both-metric
    // oracle coverage complete for every cell/bucket-probing family
    // (LSH, IVF, IVF-PQ, IVF-SQ).
    "q_ivfsq_search_cosine" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = memoized(s, dir, "ivfsq_idx_ang") {
        graft.ann.ivfsq.IvfSq.train(e, "vec_id", "embedding",
          ivfSqConfig.copy(angular = true))
      }
      val res = Eval.withValidity(
        idx.searchRerank(q, e.select(col("vec_id"), col("embedding")), K, 100),
        e, q, ExactNN.Cosine)
      LshQueries.dumpAndReload(s, res,
          s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/ivfsq_cosine")
        .orderBy("query_id", "dist", "vec_id")
    }),

    // Constrained IVF-SQ rerank search via the scan-side codesFilter —
    // completing the filtered matrix across the code-table serving
    // indexes (IVF-PQ r10, IVF-SQ here; SQ/BQ hooks are spec-gated):
    // the predicate runs on the codes scan (filtered-DiskANN layout —
    // zero joins, disallowed rows never decoded, never scored, never
    // consuming rerank slots). The predicate references vec_id, already
    // a codes column, so the SHARED index serves directly. The oracle
    // recomputes every returned pair's exact distance AND re-checks the
    // predicate on the returned id — one disallowed row flips `valid`
    // cross-engine.
    "q_ivfsq_search_filtered" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = ivfSqIdx(s, dir)
      val res = Eval.withValidity(
        idx.searchRerank(q, e.select(col("vec_id"), col("embedding")),
          K, 100, codesFilter = Some(col("vec_id") % 2 === 0)),
        e, q, ExactNN.L2)
      LshQueries.dumpAndReload(s, res,
          s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/ivfsq_filtered")
        .orderBy("query_id", "dist", "vec_id")
    }),

    // IVF-SQ recall: quantized cell-pruned scan vs exact rerank, dual
    // prediction dumps regraded by DuckDB (same oracle as q_pq_recall /
    // q_sq_recall — the delta across the three is compression scheme ×
    // pruning).
    "q_ivfsq_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = ivfSqIdx(s, dir)
      val gt = exactGtL2(s, dir)
      val dumpBase = s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}"
      val scanPred = LshQueries.dumpAndReload(s, idx.searchAll(q, K),
        s"$dumpBase/ivfsq_scan")
      val rerPred = LshQueries.dumpAndReload(s,
        idx.searchRerank(q, e.select(col("vec_id"), col("embedding")), K, 100),
        s"$dumpBase/ivfsq_rerank")
      val scan = Eval.setPrecisionRecall(scanPred, gt)
        .agg(round(avg("recall"), 4).as("adc_recall"))
      val rer = Eval.setPrecisionRecall(rerPred, gt)
        .agg(round(avg("recall"), 4).as("rerank_recall"))
      scan.crossJoin(rer)
    }),

    // Scalar-quantization codes: unlike the seeded index fits, the SQ
    // fit (exact per-dim min/max, no sample, no seed) is fully
    // SQL-expressible, so the ENTIRE codes table hash-compares
    // cross-engine — DuckDB refits the bounds and re-encodes every
    // vector independently. The strongest build oracle in the index
    // family: a single wrong code anywhere mismatches. Emitted as
    // exploded scalar rows (vec_id, pos, code) — one row per code, full
    // coverage preserved — because the driver harness hashes scalar
    // columns (the q_jl_project convention for array-valued results).
    "q_sq_codes" -> ((s, dir) => {
      val idx = sqIdx(s, dir)
      idx.codes.select(col("vec_id"), posexplode(col("codes")))
        .select(col("vec_id"), col("pos"), col("col").as("code"))
        .orderBy("vec_id", "pos")
    }),

    // Code-table lifecycle certification (CompressedLifecycleSpec pins
    // the uniform 5-family contract; this row cross-engine-recomputes
    // the SQ pole end to end): a deterministic delete + upsert script
    // against FROZEN bounds — ids ≡ UpsertDeadRem (mod UpsertMod) are
    // tombstoned, ids ≡ UpsertUpdRem are upserted to the embedding of
    // (vec_id × UpsertSrcMul) mod n. DuckDB refits the bounds from the
    // ORIGINAL corpus (the append contract: arrivals never refit) and
    // re-derives the final codes table row for row.
    "q_sq_upsert_codes" -> ((s, dir) => {
      val e = emb(s, dir)
      val idx = sqIdx(s, dir)
      val n = e.count()
      val dead = e.where(pmod(col("vec_id"), lit(UpsertMod)) === UpsertDeadRem)
        .select("vec_id")
      val updates = e
        .where(pmod(col("vec_id"), lit(UpsertMod)) === UpsertUpdRem)
        .select(col("vec_id"),
          pmod(col("vec_id") * UpsertSrcMul, lit(n)).as("src_id"))
        .join(e.select(col("vec_id").as("src_id"), col("embedding")), "src_id")
        .select(col("vec_id"), col("embedding"))
      idx.withDeletes(dead).upsert(updates).codes
        .select(col("vec_id"), posexplode(col("codes")))
        .select(col("vec_id"), col("pos"), col("col").as("code"))
        .orderBy("vec_id", "pos")
    }),

    // The CLOSED DRIFT LOOP under the oracle (round 14's
    // refitDue/refitAndSwap maintainer API, q_sq_upsert_codes'
    // frozen-bounds complement): a store fit on the base corpus takes
    // one rule-derived DRIFTED batch — the tail ids arrive with every
    // component shifted +RefitShift (a real distribution move, ~10
    // fit-MADs) while ids ≡ 0 (mod RefitDeadMod) are deleted — which
    // must trip `refitDue` (refitAfterBreaches = 1; asserted, not
    // assumed), and `refitAndSwap` then re-fits the bounds on the LIVE
    // corpus and re-encodes it atomically. DuckDB re-derives the live
    // corpus from the same rules, re-fits min/max bounds itself, and
    // re-encodes every row — the whole refit output hash-compared code
    // by code (the q_sq_codes gate applied to the lifecycle's hardest
    // step: a refit that lands one wrong bound mismatches everywhere).
    "q_sq_refit_codes" -> ((s, dir) => {
      // the lifecycle build (store + drifted batch + refitDue +
      // refitAndSwap) is memoized per (session, sf) like the other
      // stored-lifecycle rows (scoped_graph_store, postings_refit) —
      // its cost is a memo_builds line item; the row times serving
      val m = memoized(s, dir, "sq_refit_store") {
        val e = emb(s, dir)
        val cut = e.agg(max("vec_id")).head().getLong(0) + 1 -
          InsertTailCount
        val base = e.where(col("vec_id") < cut)
          .select(col("vec_id"), col("embedding").cast("array<double>")
            .as("embedding"))
        val arrivals = e.where(col("vec_id") >= cut)
          .select(col("vec_id"),
            transform(col("embedding").cast("array<double>"),
              x => x + RefitShift).as("embedding"))
        val dead = base.where(pmod(col("vec_id"), lit(RefitDeadMod)) === 0)
          .select("vec_id")
        val tmp = java.nio.file.Files
          .createTempDirectory("sq_refit_row").toString
        val idx = graft.ann.sq.Sq.train(base, "vec_id", "embedding")
        idx.save(s, s"$tmp/idx")
        graft.ann.DriftCheck.writeFitStats(base, s"$tmp/fit_stats")
        val maint = new graft.ann.CodesMaintainer(s, s"$tmp/idx",
          encode = a => idx.model.transformDf(a, "vec_id", "embedding"),
          compactEvery = 100,
          driftCheck = Some(new graft.ann.DriftCheck(s, s"$tmp/fit_stats")),
          refitAfterBreaches = 1)
        maint.onBatch(Some(arrivals), Some(dead))
        require(maint.refitDue,
          "q_sq_refit_codes: the rule-derived drift must trip refitDue")
        val live = base.join(broadcast(dead), Seq("vec_id"), "left_anti")
          .unionByName(arrivals)
        val model2 = graft.ann.sq.Sq.fit(live, "embedding")
        maint.refitAndSwap(live,
          newEncode = df => model2.transformDf(df, "vec_id", "embedding"),
          writeModel = out => model2.save(s, out),
          modelSubs = Seq("bounds", "meta"))
        maint
      }
      m.liveCodes.select(col("vec_id"), posexplode(col("codes")))
        .select(col("vec_id"), col("pos"), col("col").as("code"))
        .orderBy("vec_id", "pos")
    }),

    // SQ rerank search: quantized-scan candidates + exact re-rank, so
    // returned distances are exact and every returned pair re-verifies
    // from the raw embeddings cross-engine (same gate as
    // q_ivfpq_search_l2).
    "q_sq_search_l2" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = sqIdx(s, dir)
      val res = Eval.withValidity(
        idx.searchRerank(q, e.select(col("vec_id"), col("embedding")), K,
          SqRerankDepth),
        e, q, ExactNN.L2)
      LshQueries.dumpAndReload(s, res,
          s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/sq_l2")
        .orderBy("query_id", "dist", "vec_id")
    }),

    // SQ recall: quantized-scan-only vs rerank against exact ground
    // truth, both prediction sets dumped and regraded by DuckDB (same
    // dual oracle as q_pq_recall). At 255 levels the quantized scan is
    // near-lossless on 64-d data — the point of SQ is a 4-8x footprint
    // cut at ~unit recall, sitting between the exact scan and PQ's
    // deeper compression. The rerank leg probes SqRecallProbeDepth
    // (NOT the swept serving depth, which equals k and would make the
    // comparison tautological — see the constant's scaladoc).
    "q_sq_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = sqIdx(s, dir)
      val gt = exactGtL2(s, dir)
      val dumpBase = s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}"
      val sqPred = LshQueries.dumpAndReload(s, idx.searchAll(q, K),
        s"$dumpBase/sq_adc")
      val rerPred = LshQueries.dumpAndReload(s,
        idx.searchRerank(q, e.select(col("vec_id"), col("embedding")), K,
          SqRecallProbeDepth),
        s"$dumpBase/sq_rerank")
      val adc = Eval.setPrecisionRecall(sqPred, gt)
        .agg(round(avg("recall"), 4).as("adc_recall"))
      val rer = Eval.setPrecisionRecall(rerPred, gt)
        .agg(round(avg("recall"), 4).as("rerank_recall"))
      adc.crossJoin(rer)
    }),

    // Binary quantization codes: the midrange fit ((min+max)/2 per dim —
    // exact and summation-order-independent) makes the packed sign-bit
    // table bit-identically recomputable cross-engine, like q_sq_codes.
    // Same exploded-scalar shape: (vec_id, pos, code) with one row per
    // packed 32-bit word, every bit of the index hash-compared.
    "q_bq_codes" -> ((s, dir) => {
      val idx = bqIdx(s, dir)
      idx.codes.select(col("vec_id"), posexplode(col("codes")))
        .select(col("vec_id"), col("pos"), col("col").as("code"))
        .orderBy("vec_id", "pos")
    }),

    // BQ Hamming search: the FIRST search on the board whose entire
    // result (not just per-row re-verification of a dump) is recomputed
    // by DuckDB — thresholds, sign bits, packed words, XOR+popcount
    // distances and the (hamming, vec_id) top-k tie-break are all
    // integer-or-reproducible, so there is no FP tolerance anywhere.
    "q_bq_search_hamming" -> ((s, dir) => {
      val e = emb(s, dir)
      val idx = bqIdx(s, dir)
      idx.searchHamming(queriesDf(e), K)
        .orderBy("query_id", "hamming", "vec_id")
    }),

    // BQ deployment shape: Hamming scan to depth 250 (the depth rule:
    // 1-bit/dim ranks coarsely, so depth scales with the corpus fraction
    // the scan must order — SCALE.md §ANN), exact L2 rerank to top-k.
    // Also fully SQL-recomputed: DuckDB re-derives the candidate set AND
    // the rerank.
    "q_bq_search_l2" -> ((s, dir) => {
      val e = emb(s, dir)
      val idx = bqIdx(s, dir)
      idx.searchRerank(queriesDf(e), e.select(col("vec_id"), col("embedding")),
          K, BqRerankDepth)
        .orderBy("query_id", "dist", "vec_id")
    }),

    // BQ recall: Hamming-scan-only vs depth-250 rerank against exact
    // ground truth — the whole grading recomputed inside DuckDB (both
    // prediction sets are deterministic, so no dump is needed).
    "q_bq_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = bqIdx(s, dir)
      val gt = exactGtL2(s, dir)
      val scanPred = idx.searchHamming(q, K)
        .select(col("query_id"), col("vec_id"))
      val rerPred = idx.searchRerank(q,
        e.select(col("vec_id"), col("embedding")), K, BqRerankDepth)
      val scan = Eval.setPrecisionRecall(scanPred, gt)
        .agg(round(avg("recall"), 4).as("scan_recall"))
      val rer = Eval.setPrecisionRecall(rerPred, gt)
        .agg(round(avg("recall"), 4).as("rerank_recall"))
      scan.crossJoin(rer)
    }),

    // BQ cosine rerank — completes the both-metric oracle coverage
    // the other index families have; fully SQL-recomputed like its L2
    // twin. (Metric note: the SimHash angle bound needs hyperplanes
    // through the origin; BQ's midrange thresholds are offset, so the
    // cosine pairing is empirical, not a theorem — Bq.searchRerank
    // scaladoc.)
    "q_bq_search_cosine" -> ((s, dir) => {
      val e = emb(s, dir)
      val idx = bqIdx(s, dir)
      idx.searchRerank(queriesDf(e), e.select(col("vec_id"), col("embedding")),
          K, BqRerankDepth, ExactNN.Cosine)
        .orderBy("query_id", "dist", "vec_id")
    }),

    // Exact k-NN graph (every node's KnnK nearest cosine neighbors +
    // the mutual-edge flag) — the quadratic baseline the LSH graph is
    // graded against, fully recomputed by DuckDB. The neighbor graph is
    // the input shape for graph dedup/clustering/diversity selection.
    "q_knn_graph" -> ((s, dir) =>
      graft.ann.KnnGraph.withMutual(graphExact(s, dir))
        .orderBy("src", "dist", "dst")),

    // Scale path: LSH same-bucket candidate edges → exact cosine on
    // candidates only → per-node bounded top-k. Edges are dumped; the
    // DuckDB oracle recomputes every edge's cosine (bad_dist_edges must
    // be 0) AND grades graph recall against its OWN exact graph — same
    // dump-and-recheck contract as q_lsh_recall.
    "q_knn_graph_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      val pred = graphInit(s, dir)
      val dumped = LshQueries.dumpAndReload(s, pred,
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/knn_graph")
      val gt = graphExact(s, dir)
      val recall = Eval.setPrecisionRecall(
          dumped.select(col("src").as("query_id"), col("dst").as("vec_id")),
          gt.select(col("src").as("query_id"), col("dst").as("vec_id")))
        .agg(round(avg("recall"), 4).as("graph_recall"),
          count(lit(1)).as("n_nodes"))
      val edgeStats = dumped
        .join(e.select(col("vec_id").as("src"), col("embedding").as("es")), "src")
        .join(e.select(col("vec_id").as("dst"), col("embedding").as("ed")), "dst")
        .select((round(exprs.cosineDistNative(col("es"), col("ed")), 6)
          =!= col("dist")).cast("long").as("bad"))
        .agg(count(lit(1)).as("n_edges"), sum("bad").as("bad_dist_edges"))
      recall.crossJoin(edgeStats)
    }),

    // NN-Descent refinement (Dong et al. WWW 2011) of the LSH k-NN
    // graph: neighbors-of-neighbors proposed as candidate edges, exact
    // distances on proposals only, per-node bounded top-k — never
    // all-pairs. Both the initial and the refined graph are dumped; the
    // DuckDB oracle grades BOTH against its own exact graph (the
    // recall lift is the cross-engine-verified claim) and recomputes
    // every refined edge's cosine (bad_dist_edges must be 0).
    "q_knn_graph_nnd" -> ((s, dir) => {
      val e = emb(s, dir)
      val init = graphInit(s, dir)
      val initDumped = LshQueries.dumpAndReload(s, init,
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/knn_graph_nnd_init")
      val refined = graft.ann.NnDescent.refine(initDumped, e, "vec_id",
        "embedding", KnnK, ExactNN.Cosine, iterations = 2)
      val dumped = LshQueries.dumpAndReload(s, refined,
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/knn_graph_nnd")
      val gt = graphExact(s, dir)
      def recallOf(g: DataFrame, as: String): DataFrame =
        Eval.setPrecisionRecall(
            g.select(col("src").as("query_id"), col("dst").as("vec_id")),
            gt.select(col("src").as("query_id"), col("dst").as("vec_id")))
          .agg(round(avg("recall"), 4).as(as))
      val edgeStats = dumped
        .join(e.select(col("vec_id").as("src"), col("embedding").as("es")), "src")
        .join(e.select(col("vec_id").as("dst"), col("embedding").as("ed")), "dst")
        .select((round(exprs.cosineDistNative(col("es"), col("ed")), 6)
          =!= col("dist")).cast("long").as("bad"))
        .agg(count(lit(1)).as("n_edges"), sum("bad").as("bad_dist_edges"))
      recallOf(initDumped, "recall_init")
        .crossJoin(recallOf(dumped, "recall_refined"))
        .crossJoin(edgeStats)
    }),

    // Mutual-kNN clustering: connected components over the edges BOTH
    // endpoints agree on, under a distance ceiling. Mutuality alone is
    // NOT enough on a near-iid corpus — measured: the unfiltered
    // mutual graph at k=5 percolates into ONE 493-node blob (mutual
    // k-NN percolation once k ~ ln n); the dist ceiling (below the
    // 0.62 background band) cuts it to the planted near-dup groups,
    // with mutuality the stricter both-endpoints-nominate rule vs the
    // plain pair threshold of q_near_dup_clusters. DuckDB re-derives
    // the graph, the mutual-and-close subset AND the transitive
    // closure (recursive CTE), so the whole chain is cross-engine.
    "q_mutual_knn_clusters" -> ((s, dir) => {
      mutualExactClusters(s, dir)
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_docs"),
          concat_ws(",",
            transform(array_sort(collect_list(col("doc_id"))),
              x => x.cast("string"))).as("doc_ids"))
        .orderBy("cluster_id")
    }),

    // The clustering consumer CERTIFIED on the scale graph: the same
    // mutual + distance-ceiling + connected-components chain as
    // q_mutual_knn_clusters, but consuming the LSH-accelerated k-NN
    // graph (KnnGraph.fromLsh — the 100 TB path) instead of the exact
    // all-pairs one, graded at the CLUSTER level against the exact
    // clusters via co-clustered-pair precision/recall (the
    // recall-of-the-approximation pattern lifted from edges to
    // clusters). The LSH graph's mutual-close pairs are dumped with
    // their distances; DuckDB recomputes every dumped pair's cosine
    // AND the ceiling check (bad_dist_pairs must hash as 0), re-derives
    // clusters from the dumped pairs via a recursive CTE, re-derives
    // the EXACT clusters from raw embeddings, and replays the
    // agreement aggregates — so a wrong pair distance, a wrong closure,
    // or a wrong agreement number all hash-mismatch.
    "q_mutual_knn_clusters_lsh" -> ((s, dir) => {
      val e = emb(s, dir)
      val g = graft.ann.KnnGraph.withMutual(graphInit(s, dir))
      val pairs = g.where(col("mutual") && col("src") < col("dst")
          && col("dist") <= MutualDistMax)
        .select(col("src").as("doc_a"), col("dst").as("doc_b"), col("dist"))
      val dumped = LshQueries.dumpAndReload(s, pairs,
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/mutual_lsh_pairs")
      // coalesce: an empty dump sums to NULL, the oracle's coalesce
      // yields 0 — the engines must agree on the no-pairs edge
      val bad = dumped
        .join(e.select(col("vec_id").as("doc_a"), col("embedding").as("ea")), "doc_a")
        .join(e.select(col("vec_id").as("doc_b"), col("embedding").as("eb")), "doc_b")
        .agg(coalesce(sum((round(exprs.cosineDistNative(col("ea"), col("eb")), 6)
          =!= col("dist") || col("dist") > MutualDistMax).cast("long")), lit(0L))
          .as("bad_dist_pairs"))
      val lshC = graft.text.Dedup.connectedComponents(
        dumped.select("doc_a", "doc_b"))
      val exC = mutualExactClusters(s, dir)
      // co-clustered pairs (the transitive closure as a pair relation) —
      // cluster-bounded self-joins, then one semi-join for the overlap
      def co(c: DataFrame) = c
        .select(col("cluster_id"), col("doc_id").as("a"))
        .join(c.select(col("cluster_id"), col("doc_id").as("b")), "cluster_id")
        .where(col("a") < col("b"))
        .select("a", "b")
      val coL = graft.text.Dedup.materializeRelease(co(lshC))
      val coE = graft.text.Dedup.materializeRelease(co(exC))
      coL.agg(count(lit(1)).as("n_copairs_lsh"))
        .crossJoin(coE.agg(count(lit(1)).as("n_copairs_exact")))
        .crossJoin(coL.join(coE, Seq("a", "b"), "left_semi")
          .agg(count(lit(1)).as("hits")))
        .crossJoin(lshC.agg(countDistinct("cluster_id").as("n_clusters_lsh")))
        .crossJoin(exC.agg(countDistinct("cluster_id").as("n_clusters_exact")))
        .crossJoin(bad)
        .select(col("n_clusters_lsh"), col("n_clusters_exact"),
          col("n_copairs_lsh"), col("n_copairs_exact"),
          round(col("hits") / col("n_copairs_lsh"), 4).as("pair_precision"),
          round(col("hits") / col("n_copairs_exact"), 4).as("pair_recall"),
          col("bad_dist_pairs"))
    }),

    // Online insert under CORRECTNESS: the last 20 vec_ids play an
    // arriving batch against a graph built on the rest. The base graph
    // (LSH + NN-Descent + backbone) is dumped; DuckDB replays every
    // arriving vector's beam walk, the k-cut out-edges AND the capped
    // reverse links, emitting the identical delta edge set — the
    // graph-maintenance twin of the streaming codes-append oracles.
    "q_graph_insert" -> ((s, dir) => {
      val e = emb(s, dir)
      // per-sf cut: the LAST InsertTailCount ids arrive (see the knob
      // scaladoc — at sf0.01 this is the historical vec_id >= 480)
      val cut = e.agg(max("vec_id")).head().getLong(0) + 1 - InsertTailCount
      val arriving = e.where(col("vec_id") >= cut)
      val existing = e.where(col("vec_id") < cut)
      // the base graph EXCLUDES the arriving ids, so it cannot reuse
      // the full-corpus builds above — but it is itself deterministic
      // and memoized: the stored-graph-serves-inserts pattern, built
      // once per (session, sf)
      val edges = memoized(s, dir, "graph_insert_base") {
        val idx = Lsh.train(existing, "vec_id", "embedding",
          LshConfig(nTrees = 10, kMinVecs = 80, angular = true, seed = 42L))
        val g0 = graft.ann.KnnGraph.fromLsh(idx, existing, "vec_id",
          "embedding", KnnK, ExactNN.Cosine, maxBucketOccupancy = 200)
        val g = graft.ann.NnDescent.refine(g0, existing, "vec_id",
          "embedding", KnnK, ExactNN.Cosine, iterations = 1)
        g.select(col("src"), col("dst")).unionByName(
            graft.ann.GraphSearch.randomBackbone(existing, "vec_id"))
          .dropDuplicates("src", "dst")
          .localCheckpoint()
      }
      val dumpedG = LshQueries.dumpAndReload(s, edges,
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/beam_graph_ins")
      // base-edge dist is a sentinel: the insert delta's dists are all
      // computed by the walk; base rows never reach the output filter
      val gWithDist = dumpedG.withColumn("dist", lit(2.0))
      import s.implicits._
      val entries = arriving.select(col("vec_id").as("query_id"))
        .crossJoin((0L until InsertEntries).toDF("node"))
      graft.ann.GraphSearch.insert(gWithDist, existing, "vec_id",
          "embedding", arriving, KnnK, BeamWidth, BeamHops, entries,
          maxReverseDegree = InsertRevCap)
        .where(col("src") >= cut || col("dst") >= cut)
        .orderBy("src", "dst")
    }),

    // Beam search over the NN-Descent-refined LSH k-NN graph — the
    // search half of a graph-based ANN index (NSW-style layer-0 walk).
    // The graph is dumped; DuckDB replays the ENTIRE walk hop-for-hop
    // from the dumped edge list (entry set → BeamHops bounded
    // expand/score/cut rounds → final top-k), so the whole search
    // result is cross-engine recomputed, not just spot-verified.
    "q_graph_beam_search" -> ((s, dir) => {
      val e = emb(s, dir)
      // the backbone is unioned BEFORE dumping: the oracle walks
      // whatever edge list was dumped, so connectivity augmentation is
      // part of the cross-engine-verified graph
      val withBackbone = graphRefinedBackbone(s, dir)
      val dumpedG = LshQueries.dumpAndReload(s, withBackbone,
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/beam_graph")
      graft.ann.GraphSearch.beam(dumpedG, e, "vec_id", "embedding",
          queriesDf(e), (0L until BeamEntries).toSeq, K, BeamWidth, BeamHops)
        .orderBy("query_id", "dist", "vec_id")
    }),

    // The SCALE form of the graph walk (GraphSearch.beamFrom scaladoc;
    // SCALE.md beam block: 32 global entries collapse to recall 0.018
    // at 100k×10k clusters, LSH-seeded entries restore 1.000 at
    // 23 ms/query): each query's entry set comes from the coarse LSH
    // probe, the walk refines it. BOTH the edge list and the per-query
    // entry sets are dumped, so DuckDB replays the identical walk from
    // the identical starting state — certifying the deployment-shaped
    // composition, not just the demo form.
    "q_graph_beam_seeded" -> ((s, dir) => {
      val e = emb(s, dir)
      val idx = graphLshIndex(s, dir)
      val withBackbone = graphRefinedBackbone(s, dir)
      val dumpedG = LshQueries.dumpAndReload(s, withBackbone,
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/beam_graph_seeded")
      val q = queriesDf(e)
      val entries = idx.searchAll(q, BeamWidth, Double.MaxValue,
          ExactNN.Cosine)
        .select(col("query_id"), col("vec_id").as("node"))
      val dumpedE = LshQueries.dumpAndReload(s, entries,
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/beam_entries")
      graft.ann.GraphSearch.beamFrom(dumpedG, e, "vec_id", "embedding",
          q, dumpedE, K, BeamWidth, BeamHops)
        .orderBy("query_id", "dist", "vec_id")
    }),

    // Serving under PENDING deletes (the FreshDiskANN rule,
    // arXiv:2105.09613 §4; GraphMaintainer.tombstones / GraphDeleteSpec):
    // walks still route THROUGH tombstoned nodes — cutting them from the
    // frontier would sever the paths they anchor until the next
    // consolidation — but the final k-cut filters them, so a deleted id
    // is never served. The tombstone set is rule-derived
    // (vec_id % TombstoneMod == 0, which tombstones query 0's and query
    // 50's own nearest neighbor — the exclusion provably binds), so the
    // DuckDB oracle replays the identical hop-for-hop walk from the
    // dumped edge list and applies the same final-cut filter.
    // The SCOPED graph store under the oracle: a maintainer with
    // scopedRefine=true absorbs one rule-derived batch (the tail-20
    // arrivals + the mod-50 deletes) and its scheduled TOUCHED-REGION
    // refine (supersede + replacement LSM rows — the base table is
    // never rewritten), then serves the standard 100-query beam from
    // the supersede-aware view with tombstone exclusion. Predictions
    // are dumped and graded against DuckDB's OWN exact cosine ground
    // truth over the live corpus (deleted ids excluded by the same
    // rule), so the whole scoped lifecycle — delta logging, local
    // consolidation, the serving view's supersede rule — sits under
    // CORRECTNESS, not only specs (the q_ivf_search_l2_distfit
    // pattern applied to round 13's other new engine path).
    "q_graph_scoped_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val m = scopedGraphStore(s, dir)
      // the serving view is base+delta+supersede JOINS re-evaluated per
      // walk hop — materialize it once (n×k rows, the graph itself);
      // dependency (the store) resolved before the memo lambda
      val g = memoized(s, dir, "scoped_graph_serving") {
        m.servingEdges.localCheckpoint()
      }
      import s.implicits._
      val entries = q.select(col("query_id"))
        .crossJoin((0L until BeamEntries).toDF("node"))
      val pred = LshQueries.dumpAndReload(s,
        graft.ann.GraphSearch.beamFrom(g, e, "vec_id",
          "embedding", q, entries, K, BeamWidth, BeamHops,
          excluded = Some(m.tombstones)),
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/graph_scoped_recall")
      // the live-corpus rule mirrors the STORE's delete rule exactly —
      // deletes apply only BELOW the tail cut, so a tail arrival whose
      // id happens to be a TombstoneMod multiple (possible at other
      // corpus sizes) stays live AND graded
      val nRows = e.count()
      val gt = memoized(s, dir, "exact_gt_cos_live") {
        ExactNN.topKAgg(q,
            e.where(!(pmod(col("vec_id"), lit(TombstoneMod)) === 0 &&
              col("vec_id") < nRows - InsertTailCount)),
            K, ExactNN.Cosine)
          .localCheckpoint()
      }
      Eval.setPrecisionRecall(pred.select("query_id", "vec_id"), gt)
        .agg(
          round(avg("precision"), 4).as("avg_precision"),
          round(avg("recall"), 4).as("avg_recall"),
          count(lit(1)).as("n_queries"))
    }),

    "q_graph_delete_serve" -> ((s, dir) => {
      val e = emb(s, dir)
      val withBackbone = graphRefinedBackbone(s, dir)
      val dumpedG = LshQueries.dumpAndReload(s, withBackbone,
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/beam_graph_del")
      import s.implicits._
      val q = queriesDf(e)
      val entries = q.select(col("query_id"))
        .crossJoin((0L until BeamEntries).toDF("node"))
      val tombs = e.where(pmod(col("vec_id"), lit(TombstoneMod)) === 0)
        .select(col("vec_id"))
      graft.ann.GraphSearch.beamFrom(dumpedG, e, "vec_id", "embedding",
          q, entries, K, BeamWidth, BeamHops, excluded = Some(tombs))
        .orderBy("query_id", "dist", "vec_id")
    }),

    // Constrained graph serving (GraphSearch.beamFrom `allowed` — the
    // Filtered-DiskANN rule, arXiv:2211.12850 applied at serve time):
    // the walk routes through DISALLOWED nodes (they carry the graph's
    // navigability) while a per-hop bounded pool accumulates the best
    // k allowed nodes seen ANYWHERE along the walk — post-filtering
    // the final beam under-delivers exactly when the filter binds.
    // Membership is the label % 2 = 0 predicate (~50% selective, the
    // q_lsh_search_filtered twin) evaluated MAP-SIDE in the scoring
    // join — no allow-list materialization, no extra corpus pass.
    // Graded against DuckDB's OWN exact cosine ground truth over the
    // predicate subset (recallOracle corpusWhere), so both the pool's
    // correctness and the walk's filtered recall sit under the oracle.
    "q_graph_filtered_recall" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = graphLshIndex(s, dir)
      val g = graphRefinedBackbone(s, dir)
      val entries = idx.searchAll(q, BeamWidth, Double.MaxValue,
          ExactNN.Cosine)
        .select(col("query_id"), col("vec_id").as("node"))
      val pred = LshQueries.dumpAndReload(s,
        graft.ann.GraphSearch.beamFrom(g, e, "vec_id", "embedding", q,
          entries, K, BeamWidth, BeamHops,
          allowed = Some(col("label") % 2 === 0)),
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/graph_filtered_recall")
      val gt = ExactNN.topKAgg(q, e.where(col("label") % 2 === 0), K,
        ExactNN.Cosine)
      Eval.setPrecisionRecall(pred.select("query_id", "vec_id"), gt)
        .agg(
          round(avg("precision"), 4).as("avg_precision"),
          round(avg("recall"), 4).as("avg_recall"),
          count(lit(1)).as("n_queries"))
    }),

    // Selectivity dispatch for the graph family
    // (GraphSearch.beamFromFiltered / FilteredSearch — the
    // q_lsh_search_filtered_selective twin): a 2% allow-list
    // (vec_id % 50 = 0, under the 5% cutoff at every sf) BINDS the
    // exact-scan path, so recall vs DuckDB's own filtered exact ground
    // truth must be EXACTLY 1.0 — any walk-path leakage or subset
    // mis-scan breaks the hash.
    "q_graph_filtered_selective" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = graphLshIndex(s, dir)
      val g = graphRefinedBackbone(s, dir)
      val entries = idx.searchAll(q, BeamWidth, Double.MaxValue,
          ExactNN.Cosine)
        .select(col("query_id"), col("vec_id").as("node"))
      val pred = LshQueries.dumpAndReload(s,
        graft.ann.GraphSearch.beamFromFiltered(g, e, "vec_id", "embedding",
          q, entries, K, BeamWidth, BeamHops,
          allowed = pmod(col("vec_id"), lit(50)) === 0,
          metric = ExactNN.Cosine),
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/graph_filtered_selective")
      val gt = ExactNN.topKAgg(q,
        e.where(pmod(col("vec_id"), lit(50)) === 0), K, ExactNN.Cosine)
      Eval.setPrecisionRecall(pred.select("query_id", "vec_id"), gt)
        .agg(
          round(avg("precision"), 4).as("avg_precision"),
          round(avg("recall"), 4).as("avg_recall"),
          count(lit(1)).as("n_queries"))
    }),

    // Filter-AWARE graph construction under the oracle
    // (KnnGraph.fromLshSameLabel + GraphSearch.labelRing — the
    // FilteredDiskANN build-time idea, arXiv:2211.12850): the serving
    // graph is augmented with same-label k-NN edges (derived from the
    // SAME LSH bucket join the base graph used — no second forest) and
    // a per-label connectivity ring, the walk starts from
    // filter-aware seeds (the LSH probe restricted to the allowed
    // subset), and a ~10%-selective `label = 3` predicate constrains
    // serving. Recall is graded against DuckDB's own exact cosine GT
    // over the label subset — the regime where SCALE.md measured the
    // UN-augmented walk density-starved, so this row certifies the
    // build-time answer end to end.
    "q_graph_filtered_labeled" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = graphLshIndex(s, dir)
      val base = graphRefinedBackbone(s, dir)
      val allowed = col("label") === 3
      val aug = memoized(s, dir, "graph_label_aug") {
        base
          .unionByName(graft.ann.KnnGraph.fromLshSameLabel(idx, e,
              "vec_id", "embedding", "label", KnnK, ExactNN.Cosine,
              maxBucketOccupancy = 200)
            .select(col("src"), col("dst")))
          .unionByName(graft.ann.GraphSearch.labelRing(e, "vec_id", "label"))
          .dropDuplicates("src", "dst")
          .localCheckpoint()
      }
      val entries = idx.searchAll(q, BeamWidth, Double.MaxValue,
          ExactNN.Cosine, allowed = Some(e.where(allowed).select("vec_id")))
        .select(col("query_id"), col("vec_id").as("node"))
      val pred = LshQueries.dumpAndReload(s,
        graft.ann.GraphSearch.beamFrom(aug, e, "vec_id", "embedding", q,
          entries, K, BeamWidth, BeamHops, ExactNN.Cosine,
          allowed = Some(allowed)),
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/graph_filtered_labeled")
      val gt = ExactNN.topKAgg(q, e.where(allowed), K, ExactNN.Cosine)
      Eval.setPrecisionRecall(pred.select("query_id", "vec_id"), gt)
        .agg(
          round(avg("precision"), 4).as("avg_precision"),
          round(avg("recall"), 4).as("avg_recall"),
          count(lit(1)).as("n_queries"))
    }),

    // Density-aware filtered dispatch under the oracle
    // (GraphSearch.filteredDecision / beamFromFiltered over
    // FilteredSearch.route — the round-15 answer to the measured 1M
    // collapse where a 10%-selective filter starves local
    // neighborhoods and the walk silently serves 0.22 recall): two
    // predicate arms cross the density boundary — ~50% (locally dense
    // → route `walk`) and ~10% (locally starved → route
    // `exact_density`). The estimator's inputs (entry sets, walk
    // graph) and every arm's predictions are dumped; DuckDB recomputes
    // the corpus/allowed counts, RE-DERIVES the median local-allowed
    // density from the dumps (entry ∪ one-hop candidates, top-BeamWidth
    // by the same rounded distance/ties, allowed counted, exact median),
    // replays the routing rule, and grades each arm's recall vs its own
    // filtered exact ground truth — the whole dispatch decision
    // cross-engine, the way q_autotune_* rows pin tuning decisions.
    "q_graph_filtered_auto" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = graphLshIndex(s, dir)
      val g = graphRefinedBackbone(s, dir)
      val entries = LshQueries.dumpAndReload(s,
        idx.searchAll(q, BeamWidth, Double.MaxValue, ExactNN.Cosine)
          .select(col("query_id"), col("vec_id").as("node")),
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/graph_auto_entries")
      val gDumped = LshQueries.dumpAndReload(s, g,
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/graph_auto_edges")
      val arms = FilteredAutoArms.map { case (name, mod, rem) =>
        (name, pmod(col("vec_id"), lit(mod)) === rem)
      }
      val results = arms.map { case (name, pred) =>
        val d = graft.ann.GraphSearch.filteredDecision(gDumped, e,
          "vec_id", "embedding", q, entries, K, BeamWidth, pred,
          ExactNN.Cosine)
        val res = graft.ann.GraphSearch.beamFromFiltered(gDumped, e,
            "vec_id", "embedding", q, entries, K, BeamWidth, BeamHops,
            pred, ExactNN.Cosine)
          .withColumn("arm", lit(name))
        (name, pred, d, res)
      }
      val preds = LshQueries.dumpAndReload(s,
        results.map(_._4).reduce(_ unionByName _)
          .select(col("arm"), col("query_id"), col("vec_id"), col("dist")),
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/graph_auto_preds")
      import s.implicits._
      val decisions = results.map { case (name, _, d, _) =>
        (name, d.corpusCount, d.allowedCount,
          BigDecimal(d.medianLocalAllowed.getOrElse(-1.0))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          d.route.name)
      }.toDF("arm", "corpus_n", "allowed_n", "median_local_allowed",
        "route")
      val recalls = results.map { case (name, pred, _, _) =>
        val gt = ExactNN.topKAgg(q, e.where(pred), K, ExactNN.Cosine)
        Eval.setPrecisionRecall(
            preds.where(col("arm") === name).select("query_id", "vec_id"),
            gt.select("query_id", "vec_id"))
          .agg(round(avg("recall"), 4).as("avg_recall"),
            count(lit(1)).as("n_queries"))
          .withColumn("arm", lit(name))
      }.reduce(_ unionByName _)
      decisions.join(recalls, "arm").orderBy("arm")
    }),

    // The constrained tuning knob under the oracle — completes the
    // tuning matrix's filtered edge (verdict r14 #3): four
    // maxExactFraction arms (percent values) swept over the fixed
    // ~10%-selective predicate with the selectivity-only rule (density
    // dispatch off: the cutoff itself is the knob under sweep). The
    // two serve paths the cutoff can pick are computed ONCE each (the
    // shared-scan sweep form — row-identical to per-arm
    // beamFromFiltered, GraphFilteredDispatchSpec); every arm's
    // predictions land in one dump, per-arm recall is graded GT-side
    // vs the exact ground truth over the PREDICATE SUBSET, and the
    // cheapest-arm-meeting-target rule picks the operating point.
    // DuckDB recomputes its own filtered GT, re-derives each arm's
    // recall from the dump, and replays the choice — the whole
    // constrained operating-point decision cross-engine.
    "q_autotune_filtered" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = queriesDf(e)
      val idx = graphLshIndex(s, dir)
      val g = graphRefinedBackbone(s, dir)
      val pred = pmod(col("vec_id"), lit(10)) === 3
      val entries = idx.searchAll(q, BeamWidth, Double.MaxValue,
          ExactNN.Cosine)
        .select(col("query_id"), col("vec_id").as("node"))
      val counts = e.agg(count(lit(1)).as("c"),
        count(when(pred, lit(1))).as("a")).head()
      val (nCorpus, nAllowed) = (counts.getLong(0), counts.getLong(1))
      val walk = graft.ann.GraphSearch.beamFrom(g, e, "vec_id",
        "embedding", q, entries, K, BeamWidth, BeamHops, ExactNN.Cosine,
        allowed = Some(pred))
      // the exact serve IS the ground truth (same subset, same k, same
      // metric) — one scan serves both the exact arms and the grading
      val exact = ExactNN.topKAgg(q,
          e.where(pred).select(col("vec_id"), col("embedding")), K,
          ExactNN.Cosine)
        .localCheckpoint()
      val armFrames = FilteredCutoffArms.map { a =>
        val serve =
          if (graft.ann.FilteredSearch.useExactScan(nAllowed, nCorpus,
            a / 100.0)) exact
          else walk
        serve.withColumn("arm", lit(a))
      }
      val reloaded = LshQueries.dumpAndReload(s,
        armFrames.reduce(_ unionByName _)
          .select(col("arm"), col("query_id"), col("vec_id"), col("dist")),
        s"${LshQueries.SearchDumpRoot}/${LshQueries.sfName(dir)}/autotune_filtered_arms")
      graft.ann.AutoTune.gradeArms(FilteredCutoffArms, reloaded, exact,
          AutoTuneTarget)
        .orderBy("arm")
    })
  )

  /** Online-insert query knobs: the LAST InsertTailCount vec_ids play
    * the arriving batch (so the batch stays 20 vectors at EVERY sf —
    * vec_id >= 480 was absolute, which at sf0.1's 2000 rows silently
    * made 1520 of 2000 vectors "arriving" against a 480-node base graph:
    * a 9-10 s board line measuring a misconfigured replay, not the
    * operator); entries are the InsertEntries lowest existing ids; each
    * existing node accepts at most InsertRevCap new in-links. At
    * sf0.01 (500 rows) the cut is 480 — bit-identical to the historical
    * InsertFrom constant, so the driver's oracle rows are unchanged. */
  val InsertTailCount = 20L
  val InsertEntries = 32L
  val InsertRevCap = 2
  /** sf0.01's arriving-batch cut (500 − InsertTailCount) — the value the
    * generated DuckDB oracle pins, since oracle SQL always replays the
    * sf0.01 dumps. */
  val InsertFrom = 500L - InsertTailCount

  /** Mutual-kNN cluster edge ceiling: below the 0.62+ background
    * cosine band, so mutual edges are near-dup-grade. */
  val MutualDistMax = 0.6

  /** Beam-search knobs: entry nodes 0..31, beam 32 ≥ K, 4 hops —
    * entry/beam width sized per GraphSearch's measured exploration
    * scaling (coverage comes from entries × beam, not hops). */
  val BeamEntries = 32L
  val BeamWidth = 32
  val BeamHops = 4

  /** `q_autotune_graph_beam`'s beamWidth arms (all ≥ K, ascending
    * cost) and its recall target. */
  val GraphBeamArms: Seq[Int] = Seq(10, 16, 32)
  val GraphBeamTarget = 0.95

  /** `q_graph_filtered_auto`'s predicate arms — (name, mod, remainder)
    * for `vec_id % mod = remainder`: ~50% selective (locally dense →
    * walk) and ~10% (locally starved at every sf → the density-exact
    * dispatch). Modular forms so DuckDB evaluates the identical
    * predicate. */
  val FilteredAutoArms: Seq[(String, Int, Int)] = Seq(
    ("dense_50pct", 2, 0),
    ("starved_10pct", 10, 3))

  /** `q_autotune_filtered`'s sweep: `maxExactFraction` arms as PERCENT
    * values, swept over the fixed ~10%-selective predicate
    * (`vec_id % 10 = 3`) with the selectivity-only rule (density
    * dispatch off — the knob under sweep IS the selectivity cutoff).
    * Arms below the predicate's 10% serve the filtered walk; arms at
    * or above it serve the exact subset scan (recall 1.0 by
    * construction). Ascending = ascending exact-scan cost, so
    * gradeArms' cheapest-meeting-target rule reads "the smallest
    * cutoff whose serve path still meets the recall target". */
  val FilteredCutoffArms: Seq[Int] = Seq(2, 5, 15, 50)

  /** Neighbors per node in the k-NN graph queries. */
  val KnnK = 5

  /** `q_graph_delete_serve`'s rule-derived tombstone set (vec_id ≡ 0
    * mod this) — rule-derived instead of dumped so the DuckDB oracle
    * regenerates the identical set from the embeddings table alone. */
  val TombstoneMod = 50L

  /** `q_sq_upsert_codes`' deterministic lifecycle script: ids ≡
    * UpsertDeadRem (mod UpsertMod) are tombstoned, ids ≡ UpsertUpdRem
    * take the embedding of (vec_id × UpsertSrcMul) mod corpus-size —
    * all rule-derived, so DuckDB replays delete + frozen-bounds
    * re-encode cross-engine. */
  val UpsertMod = 97L
  val UpsertDeadRem = 5L
  val UpsertUpdRem = 3L
  val UpsertSrcMul = 31L

  /** `q_sq_refit_codes`' drift script (sf0.01-pins in the oracle SQL
    * follow the [[InsertFrom]] convention): the last
    * [[InsertTailCount]] ids arrive with every component shifted
    * +[[RefitShift]] (~10 fit-MADs on the synthetic embeddings — a
    * real distribution move, far over DriftCheck's 0.5 default), and
    * base ids ≡ 0 (mod [[RefitDeadMod]]) are deleted in the same
    * batch. Both rules are DuckDB-replayable, so the oracle re-derives
    * the live corpus, re-fits the bounds, and re-encodes it. */
  val RefitShift = 1.0
  val RefitDeadMod = 41L

  /** `q_autotune_bq_depth`'s Hamming-depth arms (ascending cost) —
    * fractions of the sf0.01 corpus (500), since 1 bit/dim orders only
    * coarsely and the trustable depth scales with corpus size. */
  val BqDepthArms: Seq[Int] = Seq(25, 50, 100, 250)

  /** Hamming-scan depth for the BQ rerank queries — the SWEPT default:
    * `q_autotune_bq_depth` grades the [[BqDepthArms]] against exact GT
    * and 250 is the cheapest arm meeting the [[AutoTuneTarget]] recall
    * at the gate scale (the shallower arms top out below it — 1 bit/dim
    * Hamming ordering is coarse enough on this corpus that half of it
    * must be re-ranked). Previously a hand-set constant; now the board
    * replays the decision cross-engine every round, so a corpus change
    * that shifts the depth floor shows up as a changed `chosen` row. */
  val BqRerankDepth = 250

  /** `q_autotune_sq_depth`'s rerank-depth arms (ascending cost) —
    * starting AT k itself: 8-bit scalar quantization ranks nearly
    * exactly on 64-d data, so unlike the BQ arms (corpus fractions)
    * the interesting question is whether any depth beyond k buys
    * recall at all. */
  val SqDepthArms: Seq[Int] = Seq(10, 15, 25, 50)

  /** Rerank depth the SQ serving queries (q_sq_search_l2 /
    * q_sq_recall) use — the SWEPT default: `q_autotune_sq_depth`
    * grades [[SqDepthArms]] against exact GT and 10 (= k: the
    * quantized candidate set re-ranked but not widened) is the
    * cheapest arm meeting the [[AutoTuneTarget]] recall at the gate
    * scale — the 255-level scan orders so nearly exactly that depth
    * floors at k, which is the claim sweepSqRerankDepth's Scaladoc
    * made and the board now replays cross-engine every round. */
  val SqRerankDepth = 10

  /** `q_sq_recall`'s rerank-leg depth — deliberately NOT
    * [[SqRerankDepth]]: at the swept serving depth (= k) the rerank
    * set is exactly the quantized top-k re-priced, so ADC-vs-rerank
    * recall would compare a set to itself and the row would stop
    * measuring rerank lift. The recall row keeps a deeper DIAGNOSTIC
    * arm (the lift ceiling the sweep's last arm certifies) while the
    * serving row (`q_sq_search_l2`) runs the swept deployment shape. */
  val SqRecallProbeDepth = 50

  /** DuckDB re-derivation of the BQ model + packed codes (64 bits/word
    * — the true-packing at-rest default, midrange thresholds) — shared
    * CTE prefix of all four BQ oracles. 1-based list indexing. Bit 63
    * can't go through DuckDB's checked `1::BIGINT << 63`; its signed
    * power is written literally (−2^63), and list_sum's HUGEINT
    * accumulation makes the OR-by-addition exact before the final
    * BIGINT cast — mirroring the Spark encode's Long.MinValue power. */
  private val bqCodesSql =
    """dim AS (
      |  SELECT unnest(embedding::DOUBLE[]) AS x,
      |         unnest(range(len(embedding))) AS i
      |  FROM embeddings
      |),
      |mm AS (SELECT i, (min(x) + max(x))/2 AS thr FROM dim GROUP BY i),
      |thrl AS (SELECT list(thr ORDER BY i) AS thr FROM mm),
      |bq AS (
      |  SELECT vec_id, embedding,
      |    list_transform(range((len(embedding) + 63) // 64), w ->
      |      list_sum(list_transform(range(64), j ->
      |        CASE WHEN w*64 + j < len(embedding)
      |              AND embedding[w*64 + j + 1]::DOUBLE > thr[w*64 + j + 1]
      |             THEN CASE WHEN j = 63
      |                       THEN (-9223372036854775807 - 1)::BIGINT
      |                       ELSE (1::BIGINT << j) END
      |             ELSE 0 END))::BIGINT) AS codes
      |  FROM embeddings, thrl
      |)""".stripMargin

  /** Hamming top-k CTEs over [[bqCodesSql]]: queries are the first
    * NumQueries corpus rows (same as queriesDf), distance is summed
    * per-word popcount of XOR, ties pinned by vec_id — byte-identical to
    * the Spark TopK tail. */
  private def bqHammingSql(depth: Int): String =
    s"""qs AS (
       |  SELECT vec_id AS query_id, codes AS qc
       |  FROM bq ORDER BY vec_id LIMIT ${VectorQueries.NumQueries}
       |),
       |ham AS (
       |  SELECT qs.query_id, bq.vec_id,
       |    list_sum(list_transform(range(len(qs.qc)), w ->
       |      bit_count(xor(qs.qc[w+1], bq.codes[w+1]))))::BIGINT AS hamming
       |  FROM qs CROSS JOIN bq
       |),
       |cand AS (
       |  SELECT query_id, vec_id, hamming, rn FROM (
       |    SELECT query_id, vec_id, hamming,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY hamming, vec_id) AS rn
       |    FROM ham
       |  ) WHERE rn <= $depth
       |)""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    // Dump paths pin sf0.01 — the driver correctness-gate scale (same
    // convention as LshQueries).
    "q_ivf_cell_stats" ->
      s"""WITH c AS (
         |  SELECT * FROM read_parquet('$CellDumpRoot/sf0.01/*.parquet')
         |),
         |nv AS (SELECT count(*) AS n FROM embeddings),
         |st AS (SELECT cell, count(*)::BIGINT AS n_vectors FROM c GROUP BY cell),
         |inv AS (SELECT sum(n_vectors)::BIGINT AS tot, count(*) AS nc FROM st)
         |SELECT st.cell, st.n_vectors,
         |       inv.tot = nv.n AS total_ok,
         |       inv.nc <= ${ivfConfig.nCells} AS cell_count_ok
         |FROM st, inv, nv ORDER BY st.cell""".stripMargin,

    "q_ivf_search_l2" ->
      s"""WITH d AS (
         |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/ivf_l2/*.parquet')
         |),
         |r AS (
         |  SELECT d.query_id, d.vec_id, d.dist,
         |         round(list_distance(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS exact
         |  FROM d
         |  JOIN embeddings e ON e.vec_id = d.vec_id
         |  JOIN embeddings q ON q.vec_id = d.query_id
         |)
         |SELECT query_id, vec_id, dist,
         |       abs(exact - dist) < 1e-9 AS valid
         |FROM r ORDER BY query_id, dist, vec_id""".stripMargin,

    // Distributed-fit twin: same per-pair distance recompute as
    // q_ivf_search_l2, over the distfit dump.
    "q_ivf_search_l2_distfit" ->
      s"""WITH d AS (
         |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/ivf_l2_distfit/*.parquet')
         |),
         |r AS (
         |  SELECT d.query_id, d.vec_id, d.dist,
         |         round(list_distance(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS exact
         |  FROM d
         |  JOIN embeddings e ON e.vec_id = d.vec_id
         |  JOIN embeddings q ON q.vec_id = d.query_id
         |)
         |SELECT query_id, vec_id, dist,
         |       abs(exact - dist) < 1e-9 AS valid
         |FROM r ORDER BY query_id, dist, vec_id""".stripMargin,

    // IVF selective-dispatch recall vs DuckDB's own filtered exact
    // ground truth — must be exactly 1.0 (exact-scan path binds at 2%).
    "q_ivf_search_filtered_selective" -> LshQueries.recallOracle(
      s"${LshQueries.SearchDumpRoot}/sf0.01/ivf_filtered_selective/*.parquet",
      LshQueries.L2DistSql, None, K,
      corpusWhere = "WHERE vec_id % 50 = 0"),

    // Auto-tune sweep: DuckDB recomputes the exact GT, re-derives each
    // arm's avg recall from the combined prediction dump, and replays
    // the cheapest-arm-meeting-target choice rule — the full tuning
    // decision cross-engine, mirroring AutoTune.gradeArms's GT-side
    // round(per-query recall, 6) -> round(avg, 4) -> min-arm pipeline
    // (every arm graded over EVERY validation query; an arm with no
    // rows for a query scores recall 0 there, not a skipped row).
    "q_autotune_ivf_nprobe" -> autotuneOracleSql(
      "autotune_nprobe_arms", AutoTuneArms, AutoTuneTarget,
      LshQueries.L2DistSql),

    // BQ depth sweep: identical decision replay, L2 GT — the row that
    // certifies the BqRerankDepth default cross-engine.
    "q_autotune_bq_depth" -> autotuneOracleSql(
      "autotune_bq_arms", BqDepthArms, AutoTuneTarget,
      LshQueries.L2DistSql),

    // SQ depth sweep: identical decision replay, L2 GT — the row that
    // certifies the SqRerankDepth default cross-engine.
    "q_autotune_sq_depth" -> autotuneOracleSql(
      "autotune_sq_arms", SqDepthArms, AutoTuneTarget,
      LshQueries.L2DistSql),

    // Scoped-store serving graded against DuckDB's own exact cosine GT
    // over the live corpus (the rule-derived mod-50 deletes excluded;
    // the tail-20 arrivals are embeddings rows, so they're in the
    // corpus by construction) — recallOracle mirrors
    // Eval.setPrecisionRecall's join shapes exactly.
    "q_graph_scoped_recall" -> LshQueries.recallOracle(
      s"${LshQueries.SearchDumpRoot}/sf0.01/graph_scoped_recall/*.parquet",
      LshQueries.CosineDistSql, None, K,
      corpusWhere =
        s"WHERE NOT (vec_id % $TombstoneMod = 0 AND vec_id < $InsertFrom)"),

    // Constrained walk graded against DuckDB's own exact cosine GT over
    // the ~50% predicate subset — the pool's recall, cross-engine.
    "q_graph_filtered_recall" -> LshQueries.recallOracle(
      s"${LshQueries.SearchDumpRoot}/sf0.01/graph_filtered_recall/*.parquet",
      LshQueries.CosineDistSql, None, K,
      corpusWhere = "WHERE label % 2 = 0"),

    // Selective dispatch: exact-scan path over the 2% subset — recall
    // vs DuckDB's own filtered GT must be exactly 1.0.
    "q_graph_filtered_selective" -> LshQueries.recallOracle(
      s"${LshQueries.SearchDumpRoot}/sf0.01/graph_filtered_selective/*.parquet",
      LshQueries.CosineDistSql, None, K,
      corpusWhere = "WHERE vec_id % 50 = 0"),

    // Filter-aware construction: augmented-walk recall vs DuckDB's own
    // exact cosine GT over the ~10% label subset.
    "q_graph_filtered_labeled" -> LshQueries.recallOracle(
      s"${LshQueries.SearchDumpRoot}/sf0.01/graph_filtered_labeled/*.parquet",
      LshQueries.CosineDistSql, None, K,
      corpusWhere = "WHERE label = 3"),

    // Density-aware dispatch: DuckDB recomputes the corpus/allowed
    // counts, re-derives the median local-allowed density from the
    // dumped entries + edge list (entry ∪ one-hop candidates,
    // top-BeamWidth by the same rounded distance and (dist, node)
    // ties, allowed counted per query, exact interpolated median),
    // replays FilteredSearch.route as a CASE, and grades each arm's
    // predictions vs its own filtered exact GT.
    "q_graph_filtered_auto" -> filteredAutoOracleSql,

    // Graph-beam sweep: identical decision replay, cosine GT.
    "q_autotune_graph_beam" -> autotuneOracleSql(
      "autotune_beam_arms", GraphBeamArms, GraphBeamTarget,
      beamCos("qs.qv", "e.embedding::DOUBLE[]")),

    // Constrained cutoff sweep: the same decision replay, with the
    // ground truth computed over the PREDICATE SUBSET (DuckDB's own
    // filtered exact GT) — arms below the predicate's 10% selectivity
    // carry walk predictions, arms at/above it the exact scan's.
    "q_autotune_filtered" -> autotuneOracleSql(
      "autotune_filtered_arms", FilteredCutoffArms, AutoTuneTarget,
      beamCos("qs.qv", "e.embedding::DOUBLE[]"),
      corpusWhere = "WHERE vec_id % 10 = 3"),

    // Delete view (IVF): per-pair recompute + tombstone re-check.
    "q_ivf_search_deleted" ->
      s"""WITH d AS (
         |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/ivf_deleted/*.parquet')
         |),
         |r AS (
         |  SELECT d.query_id, d.vec_id, d.dist,
         |         round(list_distance(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS exact
         |  FROM d
         |  JOIN embeddings e ON e.vec_id = d.vec_id
         |  JOIN embeddings q ON q.vec_id = d.query_id
         |)
         |SELECT query_id, vec_id, dist,
         |       (abs(exact - dist) < 1e-9 AND vec_id % 7 <> 0) AS valid
         |FROM r ORDER BY query_id, dist, vec_id""".stripMargin,

    // Every returned angular-IVF row re-verified from the raw embeddings
    // (cosine is scale-invariant, so DuckDB recomputes it from the
    // unnormalized vectors directly, zero-clamped like cosineDistNative).
    "q_ivf_search_cosine" ->
      s"""WITH d AS (
         |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/ivf_cosine/*.parquet')
         |),
         |r AS (
         |  SELECT d.query_id, d.vec_id, d.dist,
         |    round(CASE WHEN 1.0 - list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) < 1e-6
         |          THEN 0.0
         |          ELSE 1.0 - list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) END, 6) AS exact
         |  FROM d
         |  JOIN embeddings e ON e.vec_id = d.vec_id
         |  JOIN embeddings q ON q.vec_id = d.query_id
         |)
         |SELECT query_id, vec_id, dist,
         |       abs(exact - dist) < 1e-9 AS valid
         |FROM r ORDER BY query_id, dist, vec_id""".stripMargin,

    "q_ivf_recall" -> LshQueries.recallOracle(
      s"${LshQueries.SearchDumpRoot}/sf0.01/ivf_recall_l2/*.parquet",
      LshQueries.L2DistSql, None, K),

    // Every returned IVF-PQ rerank row re-verified from the raw
    // embeddings (rerank distances are exact by construction, so a
    // mismatch means a broken encode/probe/rerank path).
    "q_ivfpq_search_l2" ->
      s"""WITH d AS (
         |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/ivfpq_l2/*.parquet')
         |),
         |r AS (
         |  SELECT d.query_id, d.vec_id, d.dist,
         |         round(list_distance(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS exact
         |  FROM d
         |  JOIN embeddings e ON e.vec_id = d.vec_id
         |  JOIN embeddings q ON q.vec_id = d.query_id
         |)
         |SELECT query_id, vec_id, dist,
         |       abs(exact - dist) < 1e-9 AS valid
         |FROM r ORDER BY query_id, dist, vec_id""".stripMargin,

    // Distributed-fit twin: same per-pair distance recompute, over the
    // distfit dump (the q_ivf_search_l2_distfit treatment for IVF-PQ).
    "q_ivfpq_search_l2_distfit" ->
      s"""WITH d AS (
         |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/ivfpq_l2_distfit/*.parquet')
         |),
         |r AS (
         |  SELECT d.query_id, d.vec_id, d.dist,
         |         round(list_distance(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS exact
         |  FROM d
         |  JOIN embeddings e ON e.vec_id = d.vec_id
         |  JOIN embeddings q ON q.vec_id = d.query_id
         |)
         |SELECT query_id, vec_id, dist,
         |       abs(exact - dist) < 1e-9 AS valid
         |FROM r ORDER BY query_id, dist, vec_id""".stripMargin,

    // Filtered IVF-PQ: per-pair distance recompute PLUS the predicate
    // re-checked on every returned id.
    "q_ivfpq_search_filtered" ->
      s"""WITH d AS (
         |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/ivfpq_filtered/*.parquet')
         |),
         |r AS (
         |  SELECT d.query_id, d.vec_id, d.dist,
         |         round(list_distance(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS exact
         |  FROM d
         |  JOIN embeddings e ON e.vec_id = d.vec_id
         |  JOIN embeddings q ON q.vec_id = d.query_id
         |)
         |SELECT query_id, vec_id, dist,
         |       (abs(exact - dist) < 1e-9 AND vec_id % 2 = 0) AS valid
         |FROM r ORDER BY query_id, dist, vec_id""".stripMargin,

    // Every returned angular-IVF-PQ rerank row re-verified from the raw
    // embeddings: rerank distances are exact cosine by construction, so
    // DuckDB recomputes each pair's cosine (zero-clamped like
    // cosineDistNative) and re-derives `valid`.
    "q_ivfpq_search_cosine" ->
      s"""WITH d AS (
         |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/ivfpq_cosine/*.parquet')
         |),
         |r AS (
         |  SELECT d.query_id, d.vec_id, d.dist,
         |    round(CASE WHEN 1.0 - list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) < 1e-6
         |          THEN 0.0
         |          ELSE 1.0 - list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) END, 6) AS exact
         |  FROM d
         |  JOIN embeddings e ON e.vec_id = d.vec_id
         |  JOIN embeddings q ON q.vec_id = d.query_id
         |)
         |SELECT query_id, vec_id, dist,
         |       abs(exact - dist) < 1e-9 AS valid
         |FROM r ORDER BY query_id, dist, vec_id""".stripMargin,

    // Both IVF-PQ prediction dumps graded against DuckDB's own exact-NN
    // ground truth (same helper as q_pq_recall — the delta between the
    // two oracles is only the dump paths).
    "q_ivfpq_recall" -> LshQueries.dualRecallOracle(
      s"${LshQueries.SearchDumpRoot}/sf0.01/ivfpq_adc/*.parquet",
      s"${LshQueries.SearchDumpRoot}/sf0.01/ivfpq_rerank/*.parquet", K),

    "q_ivfpq_code_stats" ->
      s"""WITH c AS (
         |  SELECT * FROM read_parquet('$CodeDumpRoot/sf0.01/*.parquet')
         |),
         |nv AS (SELECT count(*) AS n FROM embeddings),
         |st AS (
         |  SELECT cell, count(*)::BIGINT AS n_vectors,
         |         sum(CASE WHEN len(codes) = ${ivfPqConfig.numSubvectors}
         |             THEN 0 ELSE 1 END)::BIGINT AS bad
         |  FROM c GROUP BY cell
         |),
         |inv AS (SELECT sum(n_vectors)::BIGINT AS tot, count(*) AS nc,
         |               sum(bad)::BIGINT AS badtot FROM st)
         |SELECT st.cell, st.n_vectors,
         |       inv.tot = nv.n AS total_ok,
         |       inv.nc <= ${ivfPqConfig.nCells} AS cell_count_ok,
         |       inv.badtot = 0 AS codes_len_ok
         |FROM st, inv, nv ORDER BY st.cell""".stripMargin,

    // IVF-OPQ: same dual-dump regrade as q_ivfpq_recall — DuckDB
    // recomputes its own exact GT and grades both the rotated-space ADC
    // predictions and the original-space rerank predictions, so the
    // rotation's candidate-generation delta vs q_ivfpq_recall is itself
    // cross-engine.
    "q_ivfopq_recall" -> LshQueries.dualRecallOracle(
      s"${LshQueries.SearchDumpRoot}/sf0.01/ivfopq_adc/*.parquet",
      s"${LshQueries.SearchDumpRoot}/sf0.01/ivfopq_rerank/*.parquet", K),

    // Both PQ prediction dumps graded against DuckDB's own exact-NN
    // ground truth (LshQueries.dualRecallOracle mirrors
    // Eval.setPrecisionRecall's join shapes exactly).
    "q_pq_recall" -> LshQueries.dualRecallOracle(
      s"${LshQueries.SearchDumpRoot}/sf0.01/pq_adc/*.parquet",
      s"${LshQueries.SearchDumpRoot}/sf0.01/pq_rerank/*.parquet", K),

    // Coreset selection replayed end to end: DuckDB recomputes every
    // vector's distance to its own cell centroid from raw embeddings
    // (dumped assignment + dumped centroids), ranks within cell with
    // the same (dist, vec_id) tie rule, and applies the same
    // ceil(sqrt(n_cell)) quota — a wrong distance, rank, or quota
    // anywhere breaks the row hash.
    "q_diverse_sample" ->
      s"""WITH c AS (
         |  SELECT * FROM read_parquet('$DiverseDumpRoot/sf0.01/cells/*.parquet')
         |),
         |ct AS (
         |  SELECT * FROM read_parquet('$DiverseDumpRoot/sf0.01/centroids/*.parquet')
         |),
         |d AS (
         |  SELECT c.cell, c.vec_id,
         |         round(list_distance(e.embedding::DOUBLE[], ct.centroid), 6) AS dist
         |  FROM c JOIN embeddings e USING (vec_id) JOIN ct USING (cell)
         |),
         |n AS (SELECT cell, count(*) AS n_cell FROM d GROUP BY cell),
         |r AS (
         |  SELECT cell, vec_id, dist,
         |         row_number() OVER (PARTITION BY cell
         |                            ORDER BY dist, vec_id) AS rank
         |  FROM d
         |)
         |SELECT r.cell, r.rank, r.vec_id, r.dist, n.n_cell
         |FROM r JOIN n USING (cell)
         |WHERE r.rank <= ceil(sqrt(n.n_cell))
         |ORDER BY r.cell, r.rank""".stripMargin,

    // Same grading machinery, columns renamed to the pair under
    // comparison: DuckDB recomputes exact GT and both recalls from the
    // two prediction dumps — the OPQ-vs-PQ verdict is cross-engine.
    "q_opq_recall" -> LshQueries.dualRecallOracle(
      s"${LshQueries.SearchDumpRoot}/sf0.01/opq_pq_adc/*.parquet",
      s"${LshQueries.SearchDumpRoot}/sf0.01/opq_adc/*.parquet", K,
      adcName = "pq_recall", rerankName = "opq_recall"),

    // The IVF-SQ code check: DuckDB re-encodes EVERY vector from the
    // raw embeddings (the SQ bounds are deterministic min/max — no seed,
    // no sample) and aggregates its own per-cell weighted code sum over
    // the dumped (vec_id -> cell) assignment; the dumped codes never
    // feed the oracle's sum, so a wrong code on the Spark side breaks
    // the cell row cross-engine. Cell invariants ride along.
    "q_ivfsq_codes" ->
      s"""WITH dim AS (
         |  SELECT unnest(embedding::DOUBLE[]) AS x,
         |         unnest(range(len(embedding))) AS i
         |  FROM embeddings
         |),
         |mm AS (SELECT i, min(x) AS mn, max(x) AS mx FROM dim GROUP BY i),
         |mml AS (
         |  SELECT list(mn ORDER BY i) AS mins,
         |         list(CASE WHEN mx = mn THEN 0.0 ELSE (mx - mn)/255 END ORDER BY i) AS scales
         |  FROM mm
         |),
         |enc AS (
         |  SELECT vec_id,
         |    list_transform(embedding::DOUBLE[],
         |      (x, i) -> CASE WHEN scales[i] = 0 THEN 0
         |                ELSE least(greatest(floor((x - mins[i])/scales[i] + 0.5), 0), 255)::INT END) AS codes
         |  FROM embeddings, mml
         |),
         |d AS (SELECT vec_id, cell FROM read_parquet('$IvfSqCodeDumpRoot/sf0.01/*.parquet')),
         |w AS (
         |  SELECT d.cell, e.vec_id,
         |    (SELECT sum(c * (ci + 1)) FROM (
         |       SELECT unnest(e.codes) AS c, unnest(range(len(e.codes))) AS ci)) AS ws
         |  FROM d JOIN enc e USING (vec_id)
         |),
         |st AS (
         |  SELECT cell, count(*)::BIGINT AS n_vectors, sum(ws)::BIGINT AS code_wsum
         |  FROM w GROUP BY cell
         |),
         |nv AS (SELECT count(*) AS n FROM embeddings),
         |inv AS (SELECT sum(n_vectors)::BIGINT AS tot, count(*) AS nc FROM st)
         |SELECT st.cell, st.n_vectors, st.code_wsum,
         |       inv.tot = nv.n AS total_ok,
         |       inv.nc <= ${ivfSqConfig.nCells} AS cell_count_ok
         |FROM st, inv, nv ORDER BY st.cell""".stripMargin,

    // Every returned IVF-SQ rerank row re-verified from the raw
    // embeddings (rerank distances are exact by construction).
    "q_ivfsq_search_l2" ->
      s"""WITH d AS (
         |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/ivfsq_l2/*.parquet')
         |),
         |r AS (
         |  SELECT d.query_id, d.vec_id, d.dist,
         |         round(list_distance(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS exact
         |  FROM d
         |  JOIN embeddings e ON e.vec_id = d.vec_id
         |  JOIN embeddings q ON q.vec_id = d.query_id
         |)
         |SELECT query_id, vec_id, dist,
         |       abs(exact - dist) < 1e-9 AS valid
         |FROM r ORDER BY query_id, dist, vec_id""".stripMargin,

    // Distributed-fit twin: same per-pair distance recompute, over the
    // distfit dump.
    "q_ivfsq_search_l2_distfit" ->
      s"""WITH d AS (
         |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/ivfsq_l2_distfit/*.parquet')
         |),
         |r AS (
         |  SELECT d.query_id, d.vec_id, d.dist,
         |         round(list_distance(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS exact
         |  FROM d
         |  JOIN embeddings e ON e.vec_id = d.vec_id
         |  JOIN embeddings q ON q.vec_id = d.query_id
         |)
         |SELECT query_id, vec_id, dist,
         |       abs(exact - dist) < 1e-9 AS valid
         |FROM r ORDER BY query_id, dist, vec_id""".stripMargin,

    // Filtered IVF-SQ: per-pair distance recompute PLUS the predicate
    // re-checked on every returned id (same gate as
    // q_ivfpq_search_filtered).
    "q_ivfsq_search_filtered" ->
      s"""WITH d AS (
         |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/ivfsq_filtered/*.parquet')
         |),
         |r AS (
         |  SELECT d.query_id, d.vec_id, d.dist,
         |         round(list_distance(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS exact
         |  FROM d
         |  JOIN embeddings e ON e.vec_id = d.vec_id
         |  JOIN embeddings q ON q.vec_id = d.query_id
         |)
         |SELECT query_id, vec_id, dist,
         |       (abs(exact - dist) < 1e-9 AND vec_id % 2 = 0) AS valid
         |FROM r ORDER BY query_id, dist, vec_id""".stripMargin,

    "q_ivfsq_recall" -> LshQueries.dualRecallOracle(
      s"${LshQueries.SearchDumpRoot}/sf0.01/ivfsq_scan/*.parquet",
      s"${LshQueries.SearchDumpRoot}/sf0.01/ivfsq_rerank/*.parquet", K),

    // Every returned angular-IVF-SQ rerank row re-verified: DuckDB
    // recomputes each pair's cosine (zero-clamped like cosineDistNative)
    // and re-derives `valid`.
    "q_ivfsq_search_cosine" ->
      s"""WITH d AS (
         |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/ivfsq_cosine/*.parquet')
         |),
         |r AS (
         |  SELECT d.query_id, d.vec_id, d.dist,
         |    round(CASE WHEN 1.0 - list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) < 1e-6
         |          THEN 0.0
         |          ELSE 1.0 - list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) END, 6) AS exact
         |  FROM d
         |  JOIN embeddings e ON e.vec_id = d.vec_id
         |  JOIN embeddings q ON q.vec_id = d.query_id
         |)
         |SELECT query_id, vec_id, dist,
         |       abs(exact - dist) < 1e-9 AS valid
         |FROM r ORDER BY query_id, dist, vec_id""".stripMargin,

    // DuckDB refits the SQ bounds (exact per-dim min/max via zip-unnest)
    // and re-encodes every vector with the same floor(x/s + 0.5) half-up
    // rule — a full cross-engine recompute of the index build, possible
    // because the SQ fit is deterministic and sample-free. Unnested to
    // one scalar row per code to match the Spark side's posexplode.
    "q_sq_codes" ->
      """WITH dim AS (
        |  SELECT unnest(embedding::DOUBLE[]) AS x,
        |         unnest(range(len(embedding))) AS i
        |  FROM embeddings
        |),
        |mm AS (SELECT i, min(x) AS mn, max(x) AS mx FROM dim GROUP BY i),
        |mml AS (
        |  SELECT list(mn ORDER BY i) AS mins,
        |         list(CASE WHEN mx = mn THEN 0.0 ELSE (mx - mn)/255 END ORDER BY i) AS scales
        |  FROM mm
        |),
        |enc AS (
        |  SELECT vec_id,
        |    list_transform(embedding::DOUBLE[],
        |      (x, i) -> CASE WHEN scales[i] = 0 THEN 0
        |                ELSE least(greatest(floor((x - mins[i])/scales[i] + 0.5), 0), 255)::INT END) AS codes
        |  FROM embeddings, mml
        |)
        |SELECT vec_id, unnest(range(len(codes))) AS pos, unnest(codes) AS code
        |FROM enc ORDER BY vec_id, pos""".stripMargin,

    // Lifecycle replay: DuckDB refits the FROZEN bounds from the
    // ORIGINAL corpus, applies the same rule-derived delete + upsert
    // script (dead ≡ UpsertDeadRem, updated ≡ UpsertUpdRem take the
    // embedding of (vec_id × UpsertSrcMul) mod n), and re-encodes the
    // final table — a wrong row anywhere (a refit sneaking in, a
    // tombstone surviving, an upsert double-row) breaks the hash.
    "q_sq_upsert_codes" ->
      s"""WITH dim AS (
         |  SELECT unnest(embedding::DOUBLE[]) AS x,
         |         unnest(range(len(embedding))) AS i
         |  FROM embeddings
         |),
         |mm AS (SELECT i, min(x) AS mn, max(x) AS mx FROM dim GROUP BY i),
         |mml AS (
         |  SELECT list(mn ORDER BY i) AS mins,
         |         list(CASE WHEN mx = mn THEN 0.0 ELSE (mx - mn)/255 END ORDER BY i) AS scales
         |  FROM mm
         |),
         |n AS (SELECT count(*) AS c FROM embeddings),
         |fin AS (
         |  SELECT e.vec_id,
         |         CASE WHEN e.vec_id % $UpsertMod = $UpsertUpdRem
         |              THEN s.embedding ELSE e.embedding END AS embedding
         |  FROM embeddings e
         |  CROSS JOIN n
         |  LEFT JOIN embeddings s
         |    ON s.vec_id = (e.vec_id * $UpsertSrcMul) % n.c
         |  WHERE e.vec_id % $UpsertMod <> $UpsertDeadRem
         |),
         |enc AS (
         |  SELECT vec_id,
         |    list_transform(embedding::DOUBLE[],
         |      (x, i) -> CASE WHEN scales[i] = 0 THEN 0
         |                ELSE least(greatest(floor((x - mins[i])/scales[i] + 0.5), 0), 255)::INT END) AS codes
         |  FROM fin, mml
         |)
         |SELECT vec_id, unnest(range(len(codes))) AS pos, unnest(codes) AS code
         |FROM enc ORDER BY vec_id, pos""".stripMargin,

    // The drift-loop refit, re-derived from scratch: DuckDB rebuilds
    // the live corpus from the same rules (tail arrivals shifted
    // +RefitShift, base ids = 0 mod RefitDeadMod deleted), re-fits the
    // min/max bounds on it, and re-encodes every live row — the
    // q_sq_codes gate applied to refitAndSwap's output.
    "q_sq_refit_codes" ->
      s"""WITH live AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS emb
         |  FROM embeddings
         |  WHERE vec_id < $InsertFrom AND vec_id % $RefitDeadMod != 0
         |  UNION ALL
         |  SELECT vec_id, list_transform(embedding::DOUBLE[],
         |                                x -> x + $RefitShift) AS emb
         |  FROM embeddings WHERE vec_id >= $InsertFrom
         |),
         |dim AS (
         |  SELECT unnest(emb) AS x, unnest(range(len(emb))) AS i FROM live
         |),
         |mm AS (SELECT i, min(x) AS mn, max(x) AS mx FROM dim GROUP BY i),
         |mml AS (
         |  SELECT list(mn ORDER BY i) AS mins,
         |         list(CASE WHEN mx = mn THEN 0.0 ELSE (mx - mn)/255 END ORDER BY i) AS scales
         |  FROM mm
         |),
         |enc AS (
         |  SELECT vec_id,
         |    list_transform(emb,
         |      (x, i) -> CASE WHEN scales[i] = 0 THEN 0
         |                ELSE least(greatest(floor((x - mins[i])/scales[i] + 0.5), 0), 255)::INT END) AS codes
         |  FROM live, mml
         |)
         |SELECT vec_id, unnest(range(len(codes))) AS pos, unnest(codes) AS code
         |FROM enc ORDER BY vec_id, pos""".stripMargin,

    // Every returned SQ rerank row re-verified from the raw embeddings
    // (rerank distances are exact by construction).
    "q_sq_search_l2" ->
      s"""WITH d AS (
         |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/sq_l2/*.parquet')
         |),
         |r AS (
         |  SELECT d.query_id, d.vec_id, d.dist,
         |         round(list_distance(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS exact
         |  FROM d
         |  JOIN embeddings e ON e.vec_id = d.vec_id
         |  JOIN embeddings q ON q.vec_id = d.query_id
         |)
         |SELECT query_id, vec_id, dist,
         |       abs(exact - dist) < 1e-9 AS valid
         |FROM r ORDER BY query_id, dist, vec_id""".stripMargin,

    "q_sq_recall" -> LshQueries.dualRecallOracle(
      s"${LshQueries.SearchDumpRoot}/sf0.01/sq_adc/*.parquet",
      s"${LshQueries.SearchDumpRoot}/sf0.01/sq_rerank/*.parquet", K),

    // Full cross-engine recompute of the BQ build: DuckDB refits the
    // midrange thresholds and repacks every sign bit (no dump, no
    // tolerance — the fit is order-independent by construction).
    // Unnested to one scalar row per packed word (the posexplode twin).
    "q_bq_codes" ->
      s"""WITH $bqCodesSql
         |SELECT vec_id, unnest(range(len(codes))) AS pos,
         |       unnest(codes) AS code
         |FROM bq ORDER BY vec_id, pos""".stripMargin,

    // Full cross-engine recompute of the Hamming SEARCH: integer
    // distances + deterministic (hamming, vec_id) tie-break mean DuckDB
    // re-derives the exact same top-k rows, not a dump re-check.
    "q_bq_search_hamming" ->
      s"""WITH $bqCodesSql,
         |${bqHammingSql(K)}
         |SELECT query_id, vec_id, hamming FROM cand
         |ORDER BY query_id, hamming, vec_id""".stripMargin,

    // Full cross-engine recompute of the rerank pipeline: DuckDB
    // re-derives the depth-$BqRerankDepth Hamming candidate set AND the
    // exact-L2 top-k over it.
    "q_bq_search_l2" ->
      s"""WITH $bqCodesSql,
         |${bqHammingSql(BqRerankDepth)},
         |rr AS (
         |  SELECT c.query_id, c.vec_id,
         |    round(list_distance(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS dist
         |  FROM cand c
         |  JOIN bq e ON e.vec_id = c.vec_id
         |  JOIN bq q ON q.vec_id = c.query_id
         |)
         |SELECT query_id, vec_id, dist FROM (
         |  SELECT query_id, vec_id, dist,
         |    row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rn
         |  FROM rr
         |) WHERE rn <= $K ORDER BY query_id, dist, vec_id""".stripMargin,

    // Scan-vs-rerank recall graded wholly inside DuckDB: exact ground
    // truth, both prediction sets and both averages re-derived (the
    // aggregation shape mirrors Eval.setPrecisionRecall /
    // dualRecallOracle: n_pred inner-joined, hits coalesced to 0).
    "q_bq_recall" ->
      s"""WITH $bqCodesSql,
         |${bqHammingSql(BqRerankDepth)},
         |gq AS (
         |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
         |  FROM bq ORDER BY vec_id LIMIT ${VectorQueries.NumQueries}
         |),
         |gsc AS (
         |  SELECT gq.query_id, e.vec_id,
         |    round(list_distance(gq.qv, e.embedding::DOUBLE[]), 6) AS dist
         |  FROM gq CROSS JOIN bq e
         |),
         |gt AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rn
         |    FROM gsc
         |  ) WHERE rn <= $K
         |),
         |ng AS (SELECT query_id, count(*) AS n_gt FROM gt GROUP BY query_id),
         |pa AS (SELECT query_id, vec_id FROM cand WHERE rn <= $K),
         |npa AS (SELECT query_id, count(*) AS n_pred FROM pa GROUP BY query_id),
         |ha AS (
         |  SELECT pa.query_id, count(*) AS valid
         |  FROM pa JOIN gt USING (query_id, vec_id) GROUP BY pa.query_id
         |),
         |ra AS (
         |  SELECT round(avg(round(coalesce(ha.valid, 0) / ng.n_gt, 6)), 4) AS scan_recall
         |  FROM npa JOIN ng USING (query_id) LEFT JOIN ha USING (query_id)
         |),
         |rr AS (
         |  SELECT c.query_id, c.vec_id,
         |    round(list_distance(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS dist
         |  FROM cand c
         |  JOIN bq e ON e.vec_id = c.vec_id
         |  JOIN bq q ON q.vec_id = c.query_id
         |),
         |pb AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rn
         |    FROM rr
         |  ) WHERE rn <= $K
         |),
         |npb AS (SELECT query_id, count(*) AS n_pred FROM pb GROUP BY query_id),
         |hb AS (
         |  SELECT pb.query_id, count(*) AS valid
         |  FROM pb JOIN gt USING (query_id, vec_id) GROUP BY pb.query_id
         |),
         |rb AS (
         |  SELECT round(avg(round(coalesce(hb.valid, 0) / ng.n_gt, 6)), 4) AS rerank_recall
         |  FROM npb JOIN ng USING (query_id) LEFT JOIN hb USING (query_id)
         |)
         |SELECT ra.scan_recall, rb.rerank_recall FROM ra, rb""".stripMargin,

    // BQ cosine rerank, fully recomputed: same Hamming candidate set,
    // exact-cosine top-k over it (zero-clamped like cosineDistNative).
    "q_bq_search_cosine" ->
      s"""WITH $bqCodesSql,
         |${bqHammingSql(BqRerankDepth)},
         |rr AS (
         |  SELECT c.query_id, c.vec_id,
         |    round(CASE WHEN 1.0 - list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) < 1e-6
         |          THEN 0.0
         |          ELSE 1.0 - list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) END, 6) AS dist
         |  FROM cand c
         |  JOIN bq e ON e.vec_id = c.vec_id
         |  JOIN bq q ON q.vec_id = c.query_id
         |)
         |SELECT query_id, vec_id, dist FROM (
         |  SELECT query_id, vec_id, dist,
         |    row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rn
         |  FROM rr
         |) WHERE rn <= $K ORDER BY query_id, dist, vec_id""".stripMargin,

    // Full cross-engine recompute of the exact k-NN graph: all-pairs
    // cosine, per-node top-k with (dist, dst) ties, mutual flag via a
    // self-join of DuckDB's own graph.
    "q_knn_graph" ->
      s"""WITH sc AS (
         |  SELECT a.vec_id AS src, b.vec_id AS dst,
         |    round(CASE WHEN 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) < 1e-6
         |          THEN 0.0
         |          ELSE 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) END, 6) AS dist
         |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
         |),
         |g AS (
         |  SELECT src, dst, dist FROM (
         |    SELECT src, dst, dist,
         |      row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rn
         |    FROM sc
         |  ) WHERE rn <= $KnnK
         |)
         |SELECT g.src, g.dst, g.dist, (r.src IS NOT NULL) AS mutual
         |FROM g LEFT JOIN g r ON r.src = g.dst AND r.dst = g.src
         |ORDER BY g.src, g.dist, g.dst""".stripMargin,

    // LSH k-NN graph: every dumped edge's cosine recomputed from the
    // raw embeddings (bad_dist_edges = 0 or the hash mismatches) and
    // graph recall graded against DuckDB's own exact graph.
    "q_knn_graph_lsh" ->
      s"""WITH p AS (
         |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/knn_graph/*.parquet')
         |),
         |sc AS (
         |  SELECT a.vec_id AS src, b.vec_id AS dst,
         |    round(CASE WHEN 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) < 1e-6
         |          THEN 0.0
         |          ELSE 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) END, 6) AS dist
         |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
         |),
         |gt AS (
         |  SELECT src, dst FROM (
         |    SELECT src, dst,
         |      row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rn
         |    FROM sc
         |  ) WHERE rn <= $KnnK
         |),
         |ng AS (SELECT src AS query_id, count(*) AS n_gt FROM gt GROUP BY src),
         |np AS (SELECT src AS query_id, count(*) AS n_pred FROM p GROUP BY src),
         |h AS (
         |  SELECT p.src AS query_id, count(*) AS valid
         |  FROM p JOIN gt ON gt.src = p.src AND gt.dst = p.dst
         |  GROUP BY p.src
         |),
         |rec AS (
         |  SELECT round(avg(round(coalesce(h.valid, 0) / ng.n_gt, 6)), 4) AS graph_recall,
         |         count(*) AS n_nodes
         |  FROM np JOIN ng USING (query_id) LEFT JOIN h USING (query_id)
         |),
         |ed AS (
         |  SELECT count(*) AS n_edges,
         |    sum(CASE WHEN round(CASE WHEN 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) < 1e-6
         |                  THEN 0.0
         |                  ELSE 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) END, 6) <> p.dist
         |             THEN 1 ELSE 0 END)::BIGINT AS bad_dist_edges
         |  FROM p
         |  JOIN embeddings a ON a.vec_id = p.src
         |  JOIN embeddings b ON b.vec_id = p.dst
         |)
         |SELECT rec.graph_recall, rec.n_nodes, ed.n_edges, ed.bad_dist_edges
         |FROM rec, ed""".stripMargin,

    // NN-Descent: DuckDB grades BOTH dumped graphs (initial LSH, refined)
    // against its own exact graph — the recall lift is the cross-engine
    // claim — and recomputes every refined edge's cosine.
    "q_knn_graph_nnd" ->
      s"""WITH pi AS (
         |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/knn_graph_nnd_init/*.parquet')
         |),
         |pr AS (
         |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/knn_graph_nnd/*.parquet')
         |),
         |sc AS (
         |  SELECT a.vec_id AS src, b.vec_id AS dst,
         |    round(CASE WHEN 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) < 1e-6
         |          THEN 0.0
         |          ELSE 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) END, 6) AS dist
         |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
         |),
         |gt AS (
         |  SELECT src, dst FROM (
         |    SELECT src, dst,
         |      row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rn
         |    FROM sc
         |  ) WHERE rn <= $KnnK
         |),
         |ng AS (SELECT src AS query_id, count(*) AS n_gt FROM gt GROUP BY src),
         |ri AS (
         |  SELECT round(avg(round(coalesce(h.valid, 0) / ng.n_gt, 6)), 4) AS recall_init
         |  FROM (SELECT src AS query_id FROM pi GROUP BY src) np
         |  JOIN ng USING (query_id)
         |  LEFT JOIN (
         |    SELECT pi.src AS query_id, count(*) AS valid
         |    FROM pi JOIN gt ON gt.src = pi.src AND gt.dst = pi.dst
         |    GROUP BY pi.src
         |  ) h USING (query_id)
         |),
         |rr AS (
         |  SELECT round(avg(round(coalesce(h.valid, 0) / ng.n_gt, 6)), 4) AS recall_refined
         |  FROM (SELECT src AS query_id FROM pr GROUP BY src) np
         |  JOIN ng USING (query_id)
         |  LEFT JOIN (
         |    SELECT pr.src AS query_id, count(*) AS valid
         |    FROM pr JOIN gt ON gt.src = pr.src AND gt.dst = pr.dst
         |    GROUP BY pr.src
         |  ) h USING (query_id)
         |),
         |ed AS (
         |  SELECT count(*) AS n_edges,
         |    sum(CASE WHEN round(CASE WHEN 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) < 1e-6
         |                  THEN 0.0
         |                  ELSE 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) END, 6) <> pr.dist
         |             THEN 1 ELSE 0 END)::BIGINT AS bad_dist_edges
         |  FROM pr
         |  JOIN embeddings a ON a.vec_id = pr.src
         |  JOIN embeddings b ON b.vec_id = pr.dst
         |)
         |SELECT ri.recall_init, rr.recall_refined, ed.n_edges, ed.bad_dist_edges
         |FROM ri, rr, ed""".stripMargin,

    // Mutual-kNN clusters: DuckDB re-derives the exact graph, the
    // mutual-edge subset, and the transitive closure.
    "q_mutual_knn_clusters" ->
      s"""WITH RECURSIVE sc AS (
         |  SELECT a.vec_id AS src, b.vec_id AS dst,
         |    round(CASE WHEN 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) < 1e-6
         |          THEN 0.0
         |          ELSE 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) END, 6) AS dist
         |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
         |),
         |g AS (
         |  SELECT src, dst, dist FROM (
         |    SELECT src, dst, dist,
         |      row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rn
         |    FROM sc
         |  ) WHERE rn <= $KnnK
         |),
         |pairs AS (
         |  SELECT g.src AS doc_a, g.dst AS doc_b
         |  FROM g JOIN g r ON r.src = g.dst AND r.dst = g.src
         |  WHERE g.src < g.dst AND g.dist <= $MutualDistMax
         |),
         |nodes AS (SELECT doc_a AS d FROM pairs UNION SELECT doc_b FROM pairs),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach(a, b) AS (
         |  SELECT d, d FROM nodes
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
         |),
         |comp AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a)
         |SELECT cluster_id, count(*) AS n_docs,
         |       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS doc_ids
         |FROM comp GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,

    // Scale-graph clustering certification: DuckDB re-checks every
    // dumped LSH mutual-close pair's cosine + ceiling, re-derives the
    // LSH clusters from the dump and the EXACT clusters from raw
    // embeddings (two recursive closures), and replays the
    // co-clustered-pair agreement aggregates.
    "q_mutual_knn_clusters_lsh" ->
      s"""WITH RECURSIVE sc AS (
         |  SELECT a.vec_id AS src, b.vec_id AS dst,
         |    ${beamCos("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")} AS dist
         |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
         |),
         |g AS (
         |  SELECT src, dst, dist FROM (
         |    SELECT src, dst, dist,
         |      row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rn
         |    FROM sc
         |  ) WHERE rn <= $KnnK
         |),
         |epairs AS (
         |  SELECT g.src AS doc_a, g.dst AS doc_b
         |  FROM g JOIN g r ON r.src = g.dst AND r.dst = g.src
         |  WHERE g.src < g.dst AND g.dist <= $MutualDistMax
         |),
         |enodes AS (SELECT doc_a AS d FROM epairs UNION SELECT doc_b FROM epairs),
         |eedges AS (SELECT doc_a AS a, doc_b AS b FROM epairs
         |           UNION SELECT doc_b, doc_a FROM epairs),
         |ereach(a, b) AS (
         |  SELECT d, d FROM enodes
         |  UNION
         |  SELECT r.a, e.b FROM ereach r JOIN eedges e ON r.b = e.a
         |),
         |ecomp AS (SELECT a AS doc_id, min(b) AS cluster_id FROM ereach GROUP BY a),
         |dp AS (
         |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/mutual_lsh_pairs/*.parquet')
         |),
         |bad AS (
         |  SELECT coalesce(sum(CASE WHEN
         |      abs(${beamCos("ea.embedding::DOUBLE[]", "eb.embedding::DOUBLE[]")} - dp.dist) > 1e-9
         |      OR dp.dist > $MutualDistMax THEN 1 ELSE 0 END), 0)::BIGINT
         |    AS bad_dist_pairs
         |  FROM dp
         |  JOIN embeddings ea ON ea.vec_id = dp.doc_a
         |  JOIN embeddings eb ON eb.vec_id = dp.doc_b
         |),
         |lnodes AS (SELECT doc_a AS d FROM dp UNION SELECT doc_b FROM dp),
         |ledges AS (SELECT doc_a AS a, doc_b AS b FROM dp
         |           UNION SELECT doc_b, doc_a FROM dp),
         |lreach(a, b) AS (
         |  SELECT d, d FROM lnodes
         |  UNION
         |  SELECT r.a, e.b FROM lreach r JOIN ledges e ON r.b = e.a
         |),
         |lcomp AS (SELECT a AS doc_id, min(b) AS cluster_id FROM lreach GROUP BY a),
         |coe AS (
         |  SELECT e1.doc_id AS a, e2.doc_id AS b
         |  FROM ecomp e1 JOIN ecomp e2
         |    ON e2.cluster_id = e1.cluster_id AND e1.doc_id < e2.doc_id
         |),
         |colsh AS (
         |  SELECT l1.doc_id AS a, l2.doc_id AS b
         |  FROM lcomp l1 JOIN lcomp l2
         |    ON l2.cluster_id = l1.cluster_id AND l1.doc_id < l2.doc_id
         |),
         |agg AS (
         |  SELECT (SELECT count(*) FROM colsh) AS n_copairs_lsh,
         |         (SELECT count(*) FROM coe) AS n_copairs_exact,
         |         (SELECT count(*) FROM colsh JOIN coe USING (a, b)) AS hits,
         |         (SELECT count(DISTINCT cluster_id) FROM lcomp) AS n_clusters_lsh,
         |         (SELECT count(DISTINCT cluster_id) FROM ecomp) AS n_clusters_exact
         |)
         |SELECT n_clusters_lsh, n_clusters_exact, n_copairs_lsh,
         |       n_copairs_exact,
         |       round(hits / n_copairs_lsh, 4) AS pair_precision,
         |       round(hits / n_copairs_exact, 4) AS pair_recall,
         |       bad.bad_dist_pairs
         |FROM agg, bad""".stripMargin,

    // Online insert: full replay of every arriving vector's walk plus
    // the out-edge cut and capped reverse links (see insertWalkSql).
    "q_graph_insert" -> insertWalkSql("beam_graph_ins"),

    // Beam search: full hop-for-hop replay of the graph walk from the
    // dumped edge list (same rounding, same (dist, node) ties).
    "q_graph_beam_search" -> beamWalkSql(
      "beam_graph",
      s"""b0 AS (
         |  SELECT query_id, node, dist FROM (
         |    SELECT qs.query_id, e.vec_id AS node,
         |      ${beamCos("qs.qv", "e.embedding::DOUBLE[]")} AS dist,
         |      row_number() OVER (PARTITION BY qs.query_id
         |        ORDER BY ${beamCos("qs.qv", "e.embedding::DOUBLE[]")}, e.vec_id) AS rn
         |    FROM qs JOIN embeddings e ON e.vec_id < $BeamEntries
         |  ) WHERE rn <= $BeamWidth
         |)""".stripMargin),

    // Seeded (scale-form) beam walk: b0 scores the DUMPED per-query LSH
    // entry sets instead of global entries — same hops, same ties.
    "q_graph_beam_seeded" -> beamWalkSql(
      "beam_graph_seeded",
      s"""en AS (
         |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/beam_entries/*.parquet')
         |),
         |b0 AS (
         |  SELECT query_id, node, dist FROM (
         |    SELECT en.query_id, en.node,
         |      ${beamCos("qs.qv", "e.embedding::DOUBLE[]")} AS dist,
         |      row_number() OVER (PARTITION BY en.query_id
         |        ORDER BY ${beamCos("qs.qv", "e.embedding::DOUBLE[]")}, en.node) AS rn
         |    FROM en
         |    JOIN embeddings e ON e.vec_id = en.node
         |    JOIN qs ON qs.query_id = en.query_id
         |  ) WHERE rn <= $BeamWidth
         |)""".stripMargin),

    // Serving under pending deletes: the identical hop-for-hop walk
    // replay over the q_graph_delete_serve dump, with the rule-derived
    // tombstone set (vec_id ≡ 0 mod TombstoneMod) filtered at the FINAL
    // cut only — the FreshDiskANN route-through/never-serve rule.
    "q_graph_delete_serve" -> beamWalkSql(
      "beam_graph_del",
      s"""b0 AS (
         |  SELECT query_id, node, dist FROM (
         |    SELECT qs.query_id, e.vec_id AS node,
         |      ${beamCos("qs.qv", "e.embedding::DOUBLE[]")} AS dist,
         |      row_number() OVER (PARTITION BY qs.query_id
         |        ORDER BY ${beamCos("qs.qv", "e.embedding::DOUBLE[]")}, e.vec_id) AS rn
         |    FROM qs JOIN embeddings e ON e.vec_id < $BeamEntries
         |  ) WHERE rn <= $BeamWidth
         |)""".stripMargin,
      servedPred = s"node % $TombstoneMod <> 0"),

    // Every dumped candidate pair re-verified from the raw embeddings:
    // DuckDB recomputes the exact cosine (hash-compared against the
    // Spark-side cos_dist) and re-derives `within` — together these
    // prove pairs ⊆ the exact near-dup set at the same threshold.
    "q_lsh_near_dup_pairs" ->
      s"""WITH p AS (
         |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/lsh_near_dup/*.parquet')
         |),
         |r AS (
         |  SELECT p.vec_a, p.vec_b,
         |    round(CASE WHEN 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) < 1e-6
         |          THEN 0.0
         |          ELSE 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) END, 6) AS cos_dist
         |  FROM p
         |  JOIN embeddings a ON a.vec_id = p.vec_a
         |  JOIN embeddings b ON b.vec_id = p.vec_b
         |)
         |SELECT vec_a, vec_b, cos_dist, cos_dist <= $CosineDupThreshold AS within
         |FROM r ORDER BY vec_a, vec_b""".stripMargin,

    // Cross-set join: every dumped pair's cosine recomputed from the
    // raw embeddings (same per-pair gate as q_lsh_near_dup_pairs).
    "q_lsh_sim_join" ->
      s"""WITH p AS (
         |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/lsh_sim_join/*.parquet')
         |),
         |r AS (
         |  SELECT p.vec_a, p.vec_b,
         |    round(CASE WHEN 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) < 1e-6
         |          THEN 0.0
         |          ELSE 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) END, 6) AS dist
         |  FROM p
         |  JOIN embeddings a ON a.vec_id = p.vec_a
         |  JOIN embeddings b ON b.vec_id = p.vec_b
         |)
         |SELECT vec_a, vec_b, dist, dist <= $CosineDupThreshold AS within
         |FROM r ORDER BY vec_a, vec_b""".stripMargin,

    // Both sides re-derived: the exact cross-parity pair set from the
    // raw embeddings, the found count from the dump.
    "q_lsh_sim_join_recall" ->
      s"""WITH f AS (
         |  SELECT count(*) AS n
         |  FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/lsh_sim_join_rec/*.parquet')
         |),
         |x AS (
         |  SELECT count(*) AS n
         |  FROM embeddings a JOIN embeddings b
         |    ON a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
         |  WHERE round(CASE WHEN 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) < 1e-6
         |        THEN 0.0
         |        ELSE 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) END, 6)
         |        <= $CosineDupThreshold
         |)
         |SELECT f.n AS n_found, x.n AS n_exact,
         |       round(f.n::DOUBLE / x.n, 4) AS sim_recall
         |FROM f, x""".stripMargin,

    // The whole SemDeDup chain re-derived in DuckDB from the dumped
    // assignment: within-cell pairs, exact cosines, the min-id drop
    // rule, the per-cell summary, and the completeness invariant.
    "q_semdedup" ->
      s"""WITH c AS (
         |  SELECT * FROM read_parquet('$SemDedupDumpRoot/sf0.01/*.parquet')
         |),
         |nv AS (SELECT count(*) AS n FROM embeddings),
         |pr AS (
         |  SELECT ca.cell, cb.vec_id AS vec_b
         |  FROM c ca JOIN c cb ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
         |  JOIN embeddings a ON a.vec_id = ca.vec_id
         |  JOIN embeddings b ON b.vec_id = cb.vec_id
         |  WHERE round(CASE WHEN 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) < 1e-6
         |        THEN 0.0
         |        ELSE 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) END, 6)
         |        <= $CosineDupThreshold
         |),
         |dr AS (SELECT cell, count(DISTINCT vec_b) AS n_dropped FROM pr GROUP BY cell),
         |st AS (SELECT cell, count(*)::BIGINT AS n_vectors FROM c GROUP BY cell),
         |inv AS (SELECT sum(n_vectors)::BIGINT AS tot FROM st)
         |SELECT st.cell, st.n_vectors,
         |       coalesce(dr.n_dropped, 0)::BIGINT AS n_dropped,
         |       round(coalesce(dr.n_dropped, 0)::DOUBLE / st.n_vectors, 6) AS drop_ratio,
         |       inv.tot = nv.n AS total_ok
         |FROM st LEFT JOIN dr USING (cell), inv, nv
         |ORDER BY st.cell""".stripMargin,

    "q_embedding_near_dup" ->
      s"""WITH d AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    round(CASE WHEN 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) < 1e-6
         |          THEN 0.0
         |          ELSE 1.0 - list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) END, 6) AS cos_dist
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |)
         |SELECT vec_a, vec_b, cos_dist FROM d
         |WHERE cos_dist <= $CosineDupThreshold
         |ORDER BY vec_a, vec_b""".stripMargin
  )

  /** DuckDB cosine-distance fragment shared by the beam-walk oracles. */
  private def beamCos(a: String, b: String): String =
    s"""round(CASE WHEN 1.0 - list_cosine_similarity($a, $b) < 1e-6
       |      THEN 0.0
       |      ELSE 1.0 - list_cosine_similarity($a, $b) END, 6)""".stripMargin

  /** Shared auto-tune decision-replay SQL (DuckDB): recompute the exact
    * GT under `distSql` (which may reference `qs` as the query side and
    * `e` as the corpus row), re-derive every arm's avg recall from the
    * combined prediction dump at `dumpSub`, grading FROM THE GT SIDE
    * (arms × every validation query; missing predictions coalesce to
    * recall 0 — the AutoTune.gradeArms rule), and replay the
    * cheapest-arm-meeting-target choice. */
  private def autotuneOracleSql(dumpSub: String, arms: Seq[Int],
                                target: Double, distSql: String,
                                corpusWhere: String = ""): String =
    s"""WITH qs AS (
       |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |  FROM embeddings ORDER BY vec_id LIMIT ${VectorQueries.NumQueries}
       |),
       |sc AS (
       |  SELECT qs.query_id, e.vec_id, $distSql AS dist
       |  FROM qs CROSS JOIN (SELECT * FROM embeddings $corpusWhere) e
       |),
       |gt AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |           row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rn
       |    FROM sc
       |  ) WHERE rn <= $K
       |),
       |p AS (
       |  SELECT arm, query_id, vec_id
       |  FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/$dumpSub/*.parquet')
       |),
       |ng AS (SELECT query_id, count(*) AS n_gt FROM gt GROUP BY query_id),
       |arms AS (SELECT unnest([${arms.mkString(", ")}]) AS arm),
       |h AS (
       |  SELECT p.arm, p.query_id, count(*) AS valid
       |  FROM p JOIN gt USING (query_id, vec_id) GROUP BY p.arm, p.query_id
       |),
       |pr AS (
       |  SELECT arms.arm, ng.query_id,
       |         round(coalesce(h.valid, 0) / ng.n_gt, 6) AS recall
       |  FROM arms CROSS JOIN ng
       |  LEFT JOIN h ON h.arm = arms.arm AND h.query_id = ng.query_id
       |),
       |g AS (
       |  SELECT arm, round(avg(recall), 4) AS avg_recall,
       |         count(*) AS n_queries
       |  FROM pr GROUP BY arm
       |),
       |c AS (
       |  SELECT min(CASE WHEN avg_recall >= $target THEN arm END)
       |           AS first_meeting,
       |         max(arm) AS last_arm
       |  FROM g
       |)
       |SELECT g.arm, g.avg_recall, g.n_queries,
       |       g.arm = coalesce(c.first_meeting, c.last_arm) AS chosen
       |FROM g CROSS JOIN c ORDER BY arm""".stripMargin

  /** `q_graph_filtered_auto`'s decision-replay SQL: the density-aware
    * routing rule ([[graft.ann.FilteredSearch.route]]) re-derived
    * end-to-end by DuckDB — counts from the embeddings table, the
    * median local-allowed estimate from the dumped entry sets + edge
    * list (the same entry ∪ one-hop candidate set, the same rounded
    * cosine and (dist, node) tie order, top-BeamWidth cut, exact
    * interpolated median), the route CASE mirroring the Scala rule's
    * cutoffs, and per-arm recall graded vs DuckDB's own filtered exact
    * GT with [[LshQueries.recallOracle]]'s join shapes. */
  private def filteredAutoOracleSql: String = {
    val dump = s"${LshQueries.SearchDumpRoot}/sf0.01"
    val cos = beamCos("qs.qv", "e.embedding::DOUBLE[]")
    // per-arm fragments, indexed to keep CTE names stable
    val armDefs = FilteredAutoArms.zipWithIndex.map {
      case ((name, mod, rem), i) => (name, s"vec_id % $mod = $rem", i)
    }
    val okCols = armDefs.map { case (_, pred, i) =>
      s"e.$pred AS ok_a$i" }.mkString(",\n    ")
    val laCols = armDefs.map { case (_, _, i) =>
      s"count(*) FILTER (WHERE ok_a$i) AS la_a$i" }.mkString(",\n    ")
    val medCols = armDefs.map { case (_, _, i) =>
      s"round(quantile_cont(la_a$i, 0.5), 4) AS m_a$i" }.mkString(",\n    ")
    val cntCols = armDefs.map { case (_, pred, i) =>
      s"(count(*) FILTER (WHERE $pred))::BIGINT AS a_a$i" }
      .mkString(",\n    ")
    val recallCtes = armDefs.map { case (name, pred, i) =>
      s"""sc$i AS (
         |  SELECT qs.query_id, e.vec_id, $cos AS dist
         |  FROM qs CROSS JOIN (SELECT * FROM embeddings WHERE $pred) e
         |),
         |gt$i AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rn
         |    FROM sc$i
         |  ) WHERE rn <= $K
         |),
         |p$i AS (SELECT query_id, vec_id FROM preds WHERE arm = '$name'),
         |np$i AS (SELECT query_id, count(*) AS n_pred FROM p$i GROUP BY query_id),
         |ng$i AS (SELECT query_id, count(*) AS n_gt FROM gt$i GROUP BY query_id),
         |h$i AS (
         |  SELECT p$i.query_id, count(*) AS valid
         |  FROM p$i JOIN gt$i USING (query_id, vec_id) GROUP BY p$i.query_id
         |),
         |r$i AS (
         |  SELECT round(avg(round(coalesce(h$i.valid, 0) / ng$i.n_gt, 6)), 4)
         |           AS avg_recall,
         |         count(*) AS n_queries
         |  FROM np$i JOIN ng$i USING (query_id)
         |  LEFT JOIN h$i USING (query_id)
         |)""".stripMargin
    }.mkString(",\n")
    val maxExact = graft.ann.FilteredSearch.DefaultMaxExactFraction
    val maxAuto = graft.ann.FilteredSearch.DefaultMaxAutoExactFraction
    val armRows = armDefs.map { case (name, _, i) =>
      s"""  SELECT '$name' AS arm, cnts.corpus_n, cnts.a_a$i AS allowed_n,
         |    med.m_a$i AS median_local_allowed,
         |    CASE WHEN cnts.a_a$i <= $maxExact * cnts.corpus_n
         |           THEN 'exact_selectivity'
         |         WHEN med.m_a$i >= $K THEN 'walk'
         |         WHEN cnts.a_a$i <= $maxAuto * cnts.corpus_n
         |           THEN 'exact_density'
         |         ELSE 'walk_starved' END AS route,
         |    r$i.avg_recall, r$i.n_queries
         |  FROM cnts, med, r$i""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH g AS (
       |  SELECT * FROM read_parquet('$dump/graph_auto_edges/*.parquet')
       |),
       |und AS (
       |  SELECT src, dst FROM g UNION SELECT dst, src FROM g
       |),
       |qs AS (
       |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |  FROM embeddings ORDER BY vec_id LIMIT ${VectorQueries.NumQueries}
       |),
       |en AS (
       |  SELECT query_id, node
       |  FROM read_parquet('$dump/graph_auto_entries/*.parquet')
       |),
       |preds AS (
       |  SELECT arm, query_id, vec_id
       |  FROM read_parquet('$dump/graph_auto_preds/*.parquet')
       |),
       |cand AS (
       |  SELECT DISTINCT query_id, node FROM (
       |    SELECT query_id, node FROM en
       |    UNION ALL
       |    SELECT en.query_id, u.dst AS node FROM en JOIN und u ON u.src = en.node
       |  )
       |),
       |sc AS (
       |  SELECT c.query_id, c.node,
       |    $okCols,
       |    row_number() OVER (PARTITION BY c.query_id
       |      ORDER BY $cos, c.node) AS rn
       |  FROM cand c
       |  JOIN embeddings e ON e.vec_id = c.node
       |  JOIN qs ON qs.query_id = c.query_id
       |),
       |la AS (
       |  SELECT query_id,
       |    $laCols
       |  FROM sc WHERE rn <= $BeamWidth GROUP BY query_id
       |),
       |med AS (
       |  SELECT
       |    $medCols
       |  FROM la
       |),
       |cnts AS (
       |  SELECT count(*)::BIGINT AS corpus_n,
       |    $cntCols
       |  FROM embeddings
       |),
       |$recallCtes
       |SELECT arm, corpus_n, allowed_n, median_local_allowed, route,
       |       avg_recall, n_queries
       |FROM (
       |$armRows
       |) ORDER BY arm""".stripMargin
  }

  /** Full beam-walk replay SQL: dumped edge list at `graphDir`, initial
    * beam supplied by `b0Sql` (which may reference the shared `qs` and
    * `und` CTEs), then BeamHops expand/score/cut rounds and the final
    * top-K — the (dist, node) tie rule of the Spark TopK tail at every
    * cut. */
  /** The BeamHops expand/score/cut CTE chain (b0 -> b$BeamHops),
    * shared by every walk-replay oracle. */
  private def beamHopsFrag: String =
    (1 to BeamHops).map { h =>
      s"""c$h AS (
         |  SELECT DISTINCT b.query_id, u.dst AS node
         |  FROM b${h - 1} b JOIN und u ON u.src = b.node
         |  UNION
         |  SELECT query_id, node FROM b${h - 1}
         |),
         |b$h AS (
         |  SELECT query_id, node, dist FROM (
         |    SELECT c.query_id, c.node,
         |      ${beamCos("qs.qv", "e.embedding::DOUBLE[]")} AS dist,
         |      row_number() OVER (PARTITION BY c.query_id
         |        ORDER BY ${beamCos("qs.qv", "e.embedding::DOUBLE[]")}, c.node) AS rn
         |    FROM c$h c
         |    JOIN embeddings e ON e.vec_id = c.node
         |    JOIN qs ON qs.query_id = c.query_id
         |  ) WHERE rn <= $BeamWidth
         |)""".stripMargin
    }.mkString(",\n")

  /** `servedPred` filters the FINAL beam before the top-K cut — the
    * replay of beamFrom's `excluded` tombstone rule (walks route
    * through excluded nodes on every hop; only the served cut drops
    * them). Default TRUE = no exclusion. */
  private def beamWalkSql(graphDir: String, b0Sql: String,
                          servedPred: String = "TRUE"): String =
    s"""WITH g AS (
       |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/$graphDir/*.parquet')
       |),
       |und AS (
       |  SELECT src, dst FROM g UNION SELECT dst, src FROM g
       |),
       |qs AS (
       |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |  FROM embeddings ORDER BY vec_id LIMIT ${VectorQueries.NumQueries}
       |),
       |$b0Sql,
       |$beamHopsFrag
       |SELECT query_id, node AS vec_id, dist FROM (
       |  SELECT query_id, node, dist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY dist, node) AS rn
       |  FROM b$BeamHops WHERE $servedPred
       |) WHERE rn <= $K
       |ORDER BY query_id, dist, vec_id""".stripMargin

  /** Replay of [[graft.ann.GraphSearch.insert]]: the same beam walk for
    * each ARRIVING vector (qs = the InsertFrom..500 ids, entries = the
    * InsertEntries lowest existing ids), k-cut out-edges, then the
    * capped reverse links (top-InsertRevCap per existing node, (dist,
    * new-id) ties) — emitting the DELTA edge set insert adds. */
  private def insertWalkSql(graphDir: String): String =
    s"""WITH g AS (
       |  SELECT * FROM read_parquet('${LshQueries.SearchDumpRoot}/sf0.01/$graphDir/*.parquet')
       |),
       |und AS (
       |  SELECT src, dst FROM g UNION SELECT dst, src FROM g
       |),
       |qs AS (
       |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
       |  FROM embeddings WHERE vec_id >= $InsertFrom
       |),
       |b0 AS (
       |  SELECT query_id, node, dist FROM (
       |    SELECT qs.query_id, e.vec_id AS node,
       |      ${beamCos("qs.qv", "e.embedding::DOUBLE[]")} AS dist,
       |      row_number() OVER (PARTITION BY qs.query_id
       |        ORDER BY ${beamCos("qs.qv", "e.embedding::DOUBLE[]")}, e.vec_id) AS rn
       |    FROM qs JOIN embeddings e ON e.vec_id < $InsertEntries
       |  ) WHERE rn <= $BeamWidth
       |),
       |$beamHopsFrag,
       |outv AS (
       |  SELECT query_id AS src, node AS dst, dist FROM (
       |    SELECT query_id, node, dist,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY dist, node) AS rn
       |    FROM b$BeamHops
       |  ) WHERE rn <= $KnnK
       |),
       |rev AS (
       |  SELECT dst AS src, src AS dst, dist FROM (
       |    SELECT src, dst, dist,
       |      row_number() OVER (PARTITION BY dst
       |        ORDER BY dist, src) AS rn
       |    FROM outv
       |  ) WHERE rn <= $InsertRevCap
       |)
       |SELECT src, dst, dist FROM outv
       |UNION ALL
       |SELECT src, dst, dist FROM rev
       |ORDER BY src, dst""".stripMargin

}
