"""Entity canonicalization: near-dup entity keys → connected components →
canonical ids (north_rule J8 — the web-scale replacement for the reference's
exact-fingerprint-only dedup, /root/reference/agents/uuid_planner.py:229-241).

Pipeline:
  entity keys → minhash over char-3-gram shingles (JVM xxhash64) →
  banded LSH self-join (candidate edges) →
  connected components via alternating large-star/small-star DataFrame
  iterations (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SOCC'14 — converges in O(log n) rounds) →
  canonical id = min member id per component (stable across runs).

Skew handling (explicit, per north_rule):
  * LSH buckets are hash values → uniformly distributed; degenerate hot
    buckets (e.g. empty-string keys) are CAPPED at max_bucket, preventing
    one bucket from emitting O(n²) edges — and the drops are OBSERVED, not
    silent: pass ``observation=dedup.drop_observation()`` (threaded through
    candidate_edges/canonicalize_entities) and the same job that builds the
    candidate pairs reports (dropped_buckets, dropped_members).
  * The CC min-computation is a groupBy-min (map-side partial combine, so a
    hot node's degree never concentrates in one task) re-joined to the
    symmetric edge list — AQE skew-join splits an oversized join partition
    at runtime, and large-star itself is the skew *reducer*: after one
    round every high-degree node's neighbors point at the component min,
    collapsing hub fan-out.
  * checkpointing every round truncates the lineage (iterative joins
    otherwise stack exponentially deep plans).
"""

from __future__ import annotations

import decimal as _decimal
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def char_shingles(col, n: int = 3, hash_mode: str = "xxhash64"):
    """Char n-gram shingle hashes of a string key → array<bigint>."""
    from .dedup import content_hash64

    padded = F.lower(col)
    count = F.greatest(F.length(padded) - F.lit(n - 1), F.lit(0))
    idx = F.when(count > 0, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(
            idx, lambda i: content_hash64(F.substring(padded, i, n), hash_mode)
        )
    )


#: Above this many exclusion hashes the set-difference leaves the JVM:
#: ``array_except`` rebuilds a hash set of the right-hand array PER ROW
#: (measured: 10k exclusions × 80k keys ≈ 6 s vs 3.5 s Arrow-batched),
#: and even as a single array ``Literal`` the plan/analysis cost grows
#: with the list. Below it, one array literal + array_except stays fully
#: codegen'd with no Python worker round-trip.
_EXCLUDE_INLINE_MAX = 256


def _excluded_shingles(staged: DataFrame, ex_list) -> DataFrame:
    """Arrow-batched shingle exclusion for large lists: the sorted hash
    array ships ONCE per executor as a broadcast variable and each batch
    filters via vectorized searchsorted — never an expression-tree literal
    (the inline form bloats the plan and, at array_except's per-row
    hash-set rebuild, the runtime). First-occurrence dedup mirrors
    array_except's set semantics exactly (upstream char_shingles is
    already array_distinct, so this is belt-and-braces for parity)."""
    from pyspark.sql.types import ArrayType, LongType

    bc = staged.sparkSession.sparkContext.broadcast(
        np.array(ex_list, dtype=np.int64)
    )

    @F.pandas_udf(ArrayType(LongType()))
    def _diff(col: pd.Series) -> pd.Series:
        exc = bc.value

        def one(arr):
            a = np.asarray(arr, dtype=np.int64)
            if a.size:
                _, first = np.unique(a, return_index=True)
                a = a[np.sort(first)]
                pos = np.searchsorted(exc, a)
                pos[pos == exc.size] = 0
                a = a[exc[pos] != a] if exc.size else a
            return a

        return col.map(one)

    return staged.withColumn("_sh", _diff("_sh"))


def entity_minhash(
    entities: DataFrame,
    key_col: str = "entity_key",
    id_col: str = "entity_id",
    num_hashes: int = 32,
    hash_mode: str = "xxhash64",
    exclude=None,
    impl: str = "arrow",
    shingled: Optional[DataFrame] = None,
) -> DataFrame:
    """Minhash signatures over char-3-gram shingles of the entity key.

    ``exclude``: shingle hashes dropped before signing (see
    common_shingles — the hot-domain shared-prefix defuse). Signatures of
    a key whose every shingle is excluded degrade to the empty-set
    sentinel (never collides). Small lists inline as ONE array literal
    (array_except, pure codegen); past _EXCLUDE_INLINE_MAX the list ships
    as a broadcast variable consulted by an Arrow-batched set-difference,
    so plan size and analysis time stay flat no matter how aggressive
    drop_common_df gets (long keys + df_fraction→0 can push the list to
    10^4+ hashes).

    ``shingled``: optional precomputed ``(id_col, key_col, _sh)`` frame
    (raw char-shingle hashes, PRE-exclusion) — callers that also need the
    shingles for a DF census or an exact verify pass it (usually cached)
    so the interpreted shingle hashing runs once per job instead of once
    per consumer. Exclusion is applied here either way; values identical
    (``array_except`` after staging ≡ composed before staging)."""
    from .dedup import _MERSENNE_P, _hash_params

    params = _hash_params(num_hashes, seed=17)
    ex_list = sorted({int(x) for x in exclude}) if exclude else []
    if shingled is not None:
        staged = shingled.select(F.col(id_col), F.col(key_col), F.col("_sh"))
        if ex_list and len(ex_list) <= _EXCLUDE_INLINE_MAX:
            staged = staged.withColumn(
                "_sh",
                F.array_except("_sh", F.lit(ex_list).cast("array<long>")),
            )
    else:
        # shingles staged in their own projection — inlined, they'd be
        # folded into (and re-evaluated by) every one of the k lambdas
        # below (dedup.minhash_signatures' 36× lesson)
        sh = char_shingles(F.col(key_col), hash_mode=hash_mode)
        if ex_list and len(ex_list) <= _EXCLUDE_INLINE_MAX:
            sh = F.array_except(sh, F.lit(ex_list).cast("array<long>"))
        staged = entities.select(
            F.col(id_col),
            F.col(key_col),
            sh.alias("_sh"),
        )
    if len(ex_list) > _EXCLUDE_INLINE_MAX:
        staged = _excluded_shingles(staged, ex_list)
    if impl == "arrow":
        # numpy multiply-mod fold, bit-identical to the expr fold below —
        # see dedup.minhash_fold_arrow (the k·|sh| interpreted lambda ops
        # were the dominant per-row cost of signing)
        from .dedup import minhash_fold_arrow

        return minhash_fold_arrow(staged, params).select(
            F.col(id_col), F.col(key_col), F.col("minhash")
        )
    if impl != "expr":
        raise ValueError(f"unknown minhash impl {impl!r}")

    def _min_hash(a: int, b: int):
        # closure factory — see dedup.minhash_signatures for why not
        # default-arg lambda capture
        return F.coalesce(
            F.array_min(
                F.transform(
                    F.col("_sh"),
                    lambda s: ((F.abs(s) % F.lit(_MERSENNE_P)) * F.lit(a) + F.lit(b))
                    % F.lit(_MERSENNE_P),
                )
            ),
            F.lit(_MERSENNE_P),
        )

    sig = F.array(*[_min_hash(a, b) for a, b in params])
    return staged.select(F.col(id_col), F.col(key_col), sig.alias("minhash"))


def common_shingles(
    entities: DataFrame,
    key_col: str = "entity_key",
    df_fraction: float = 0.05,
    hash_mode: str = "xxhash64",
    sample_fraction: Optional[float] = None,
):
    """Corpus-common char-shingle hashes: shingles whose document frequency
    exceeds ``df_fraction`` of entities. THE scale-invariant hot-domain
    defuse: structurally-similar keys (same-host urls) share a long prefix
    whose shingles dominate every minhash, flooding LSH buckets with
    cross-doc collisions — and a fixed absolute bucket cap cannot save
    recall, because bucket occupancy grows linearly with corpus size until
    every bucket (including those holding true pairs) is over any cap.
    Dropping high-DF shingles BEFORE signing removes the shared prefix
    from the signatures entirely: candidates are driven by each key's
    DISTINCTIVE shingles, so buckets stay small at ANY corpus size, while
    verification still runs on the FULL shingle sets (edge semantics
    unchanged — the filter only shapes candidate recall, which the
    distinctive shingles preserve).

    One extra aggregation: explode shingles → groupBy(hash) → count —
    partial-aggregated map-side, shuffling only (hash, count). At 10^12
    keys pass ``sample_fraction`` (e.g. 0.01): DF *fractions* of genuinely
    common shingles concentrate, so a uniform sample estimates them with
    tight error while cutting the aggregation 100×. Returns a Python list
    (broadcast-size by construction: only shingles in ≥df_fraction of all
    keys can qualify, so at most 1/df_fraction × shingles-per-key entries)."""
    from .dedup import high_df_hashes

    return high_df_hashes(
        entities,
        lambda b: b.select(
            char_shingles(F.col(key_col), hash_mode=hash_mode).alias("_sh")
        ),
        df_fraction,
        sample_fraction,
    )


def candidate_edges(
    signatures: DataFrame,
    id_col: str = "entity_id",
    bands: int = 8,
    max_bucket: int = 500,
    hash_mode: str = "xxhash64",
    observation=None,
) -> DataFrame:
    """Banded self-join → undirected candidate edges (a < b). Pass
    ``observation`` (dedup.drop_observation()) to surface the hot-bucket
    drop counts on the candidate-building job."""
    from .dedup import lsh_candidate_pairs

    return lsh_candidate_pairs(
        signatures, id_col=id_col, bands=bands, max_bucket=max_bucket,
        hash_mode=hash_mode, observation=observation,
    ).selectExpr("a_id AS src", "b_id AS dst")


def _large_star(pairs: DataFrame, dedup: bool = True) -> DataFrame:
    """Large-star (Kiveris et al. SOCC'14 §3): for every node u, connect all
    strictly-larger neighbors to m = min(Γ(u) ∪ {u}).

    The per-node min is a groupBy aggregate re-joined onto the symmetric
    edge list — deliberately NOT a window min: a window partition cannot be
    split, so a hub node's entire adjacency (a hot domain can reach 10^8
    edges) would sort in ONE task. The groupBy min partial-aggregates
    map-side (a hub contributes one row per input partition to the
    shuffle), and the mins⋈edges join is AQE territory — broadcast when the
    node-min table is small, skew-split when a join partition oversizes.

    ``dedup=False`` skips the output distinct (one exchange per round):
    the alternating loop feeds this straight into _small_star, whose
    groupBy-min is duplicate-insensitive and whose own output distinct
    collapses any duplicate-driven join fan-out — pre-distinct volume is
    bounded by |E| (one row per oriented input edge) either way. Output is
    always strictly oriented (a > b); distinct only when dedup=True."""
    sym = pairs.union(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    mins = sym.groupBy("a").agg(F.min("b").alias("mb"))
    out = (
        sym.join(mins, "a")
        .where(F.col("b") > F.col("a"))
        .select(
            F.col("b").alias("a"),
            F.least(F.col("a"), F.col("mb")).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
    )
    return out.distinct() if dedup else out


def _small_star(pairs: DataFrame, oriented: bool = False) -> DataFrame:
    """Small-star: orient each edge (hi → lo); for every node u, connect u
    and all its smaller neighbors to m = min of those neighbors.

    Same groupBy-min + join formulation as _large_star (hub-safe partial
    aggregation; AQE handles the join side) — the (u, m) arm comes straight
    from the aggregate (one row per node), only the (neighbor, m) arm needs
    the join back.

    ``oriented=True`` skips the defensive orient+distinct pass — the
    alternating loop always feeds _large_star output, which is already
    strictly a > b (possibly with duplicates when large-star ran with
    dedup=False: harmless — the groupBy-min ignores them and the output
    distinct collapses the join fan-out), so re-orienting costs a full
    shuffle per round for nothing."""
    if oriented:
        directed = pairs
    else:
        directed = (
            pairs.select(
                F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
    mins = directed.groupBy("a").agg(F.min("b").alias("m"))
    return (
        directed.join(mins, "a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .union(mins.select(F.col("a"), F.col("m").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _fingerprint_metrics():
    """Order-independent edge-set fingerprint as AGGREGATE EXPRESSIONS:
    (row count, decimal sum of per-row xxhash64). Decimal accumulator keeps
    the sum exact under ANSI mode (bigint sum would overflow-error). Used
    two ways: as observe() metrics riding the per-round checkpoint
    materialization (zero extra jobs), or as a plain agg when checkpointing
    is off."""
    return [
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("s"),
    ]


def _edge_fingerprint(pairs: DataFrame):
    """Explicit-action form of the fingerprint (checkpoint=False path)."""
    row = pairs.agg(*_fingerprint_metrics()).first()
    return (row["n"], row["s"])


def _persistent_ids(spark) -> set:
    """Ids of currently persisted RDDs (localCheckpoint blocks included).
    Inspection/testing helper — attribution of OUR checkpoints uses
    _checkpointed_rdd_id, never a global diff (thread-exactness)."""
    try:
        return {
            int(i)
            for i in spark.sparkContext._jsc.getPersistentRDDs()
            .keySet()
            .toArray()
        }
    except Exception:
        return set()


def _checkpointed_rdd_id(df: DataFrame):
    """The localCheckpoint's RDD id, read straight off the DataFrame's
    LogicalRDD plan node. Exact attribution: unlike diffing the global
    persistent-RDD set before/after, this can never pick up a checkpoint
    another thread materialized in the same window (unpersisting a
    foreign localCheckpoint would CRASH that thread's computation — its
    lineage is truncated, so the lost blocks cannot be recomputed).
    None on any introspection failure."""
    try:
        return int(df._jdf.queryExecution().analyzed().rdd().id())
    except Exception:
        return None


def _unpersist_ids(spark, ids) -> None:
    """Drop the given persisted RDD ids (non-blocking). Best-effort: a
    miss (already evicted / unknown id) is ignored — unpersisting only
    affects cache residency, never correctness."""
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for i in ids:
            rdd = jmap.get(i)
            if rdd is not None:
                rdd.unpersist(False)
    except Exception:
        pass


def _checkpoint_with_fingerprint(pairs: DataFrame, round_no: int):
    """Eagerly localCheckpoint ``pairs`` and return (checkpointed, fp) with
    the fingerprint computed as observed metrics ON the checkpoint's own
    materialization job — convergence detection costs zero extra actions
    per round (was: a full count+sum pass over the edge set per round, ~2
    actions/round; at 100 TB that is an extra full edge scan per round)."""
    from pyspark.sql import Observation

    obs = Observation(f"cc_fp_{round_no}")
    observed = pairs.observe(obs, *_fingerprint_metrics())
    checkpointed = observed.localCheckpoint(eager=True)
    try:
        m = obs.get
        n, s = m["n"], m["s"]
    except Exception:
        # AQE empty-relation propagation can prune the CollectMetrics node
        # when the round's edge set is empty — aggregate the CHECKPOINTED
        # frame instead (materialized data, a trivially cheap local job)
        return checkpointed, _edge_fingerprint(checkpointed)
    # defensive: normalize a NULL sum (empty edge set) to the agg-path value
    return checkpointed, (n, s if s is not None else _decimal.Decimal(0))


def connected_components(
    edges: DataFrame,
    max_iterations: int = 20,
    checkpoint: bool = True,
) -> DataFrame:
    """(src, dst) edges → (id, component) with component = min reachable id.

    True alternating large-star / small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SOCC'14): each round
    halves the longest root-path, so convergence is O(log d) rounds in the
    component diameter d — a 10^6-long chain converges in ~20 rounds where
    plain min-label propagation would need 10^6. Each round is two
    groupBy-min aggregates, two AQE-managed joins back, and two output
    distincts (the mins⋈edges joins broadcast when the node-min side is
    small, skew-split when a partition oversizes — see _large_star);
    localCheckpoint after each round truncates lineage so round k does not
    replan k rounds of joins.

    Convergence is detected by edge-set fingerprint stability, computed as
    observe() metrics riding the per-round checkpoint materialization —
    ONE action per round, no separate fingerprint pass. If the loop
    exhausts ``max_iterations`` without converging a RuntimeError is raised
    rather than silently returning split components (the reference's
    exact-fingerprint dedup, uuid_planner.py:229-241, never under-merges;
    neither may we).
    """
    spark = edges.sparkSession
    if checkpoint:
        # materialize the RAW edge frame ONCE before deriving nodes and
        # pairs from it: both derivations need a full pass, and without
        # this the (possibly expensive) upstream chain — in
        # canonicalize_entities that is the whole signature → LSH →
        # verify pipeline — executed TWICE, once under the nodes
        # checkpoint and again under the pairs checkpoint (measured ~5 s
        # per extra pass at bench scale; guide §1.2: don't recompute what
        # you already have).
        edges = edges.localCheckpoint(eager=True)
    # canonical undirected pair set, self-loops dropped (they only add
    # nodes, handled below); node universe preserved from the raw input
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    pairs = (
        edges.select(
            F.greatest("src", "dst").alias("a"), F.least("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    prev_round_ids: set = set()
    if checkpoint:
        # nodes and pairs are INDEPENDENT derivations of the materialized
        # edge frame — overlap their checkpoint jobs from two driver
        # threads (guide §2.6; the spam_mass pattern) instead of paying
        # two sequential barriers. Results identical: each job is
        # untouched, only the scheduling overlaps.
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_nodes = pool.submit(
                inheritable_thread_target(
                    lambda: nodes.localCheckpoint(eager=True)
                )
            )
            f_pairs = pool.submit(
                inheritable_thread_target(
                    lambda: _checkpoint_with_fingerprint(pairs, 0)
                )
            )
            nodes = f_nodes.result()
            pairs, fp = f_pairs.result()
        # nodes and pairs are materialized — the raw-edge checkpoint's
        # blocks are dead weight from here on (same reclamation rule as
        # the per-round checkpoints below)
        _unpersist_ids(
            spark,
            {i for i in (_checkpointed_rdd_id(edges),) if i is not None},
        )
        prev_round_ids = {
            i for i in (_checkpointed_rdd_id(pairs),) if i is not None
        }
    else:
        fp = _edge_fingerprint(pairs)
    converged = False
    for round_no in range(1, max_iterations + 1):
        # large-star output is strictly oriented (a > b) and distinct —
        # small-star can skip its defensive re-orientation shuffle
        # large-star skips its distinct (dedup=False): small-star's
        # aggregate is duplicate-insensitive and its output distinct
        # dedupes — saves one full exchange per round
        pairs = _small_star(_large_star(pairs, dedup=False), oriented=True)
        if checkpoint:
            pairs, new_fp = _checkpoint_with_fingerprint(pairs, round_no)
            # the new round is materialized — the PREVIOUS round's
            # checkpoint blocks are dead weight; without this, iterative
            # CC leaks one edge-set copy per round into the block manager
            # (measured: repeated in-session runs degrade 24s → 50s as
            # eviction pressure mounts). Ids come straight off our own
            # checkpointed plan (thread-exact); the final round's blocks
            # stay live for the star-collapse below.
            _unpersist_ids(spark, prev_round_ids)
            prev_round_ids = {
                i for i in (_checkpointed_rdd_id(pairs),) if i is not None
            }
        else:
            new_fp = _edge_fingerprint(pairs)
        if new_fp == fp:
            converged = True
            break
        fp = new_fp
    if not converged and fp[0] > 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "alternating star rounds — raise max_iterations (components "
            "should converge in O(log diameter) rounds; non-convergence "
            "here indicates a pathological graph or a bug)"
        )

    # converged edge set is a star forest: every non-root points at its
    # component min; groupBy-min is belt-and-braces, roots + isolated
    # nodes label themselves
    stars = pairs.groupBy("a").agg(F.min("b").alias("component")).select(
        F.col("a").alias("id"), "component"
    )
    return nodes.join(stars, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )


def canonicalize_entities(
    entities: DataFrame,
    key_col: str = "entity_key",
    id_col: str = "entity_id",
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
    hash_mode: str = "xxhash64",
    estimate_prefilter=None,
    verify: str = "exact",
    max_bucket: int = 500,
    observation=None,
    auto_prefilter_ratio: float = 20.0,
    drop_common_df: Optional[float] = None,
) -> DataFrame:
    """Full canonicalization: LSH candidates → exact-Jaccard edge filter →
    connected components → (entity_id, entity_key, canonical_id).
    Singletons keep themselves as canonical.

    ``estimate_prefilter`` (a float bound, e.g. ``jaccard_threshold - 0.3``,
    or the string ``"auto"``): drop candidate pairs whose MINHASH-ESTIMATE
    Jaccard falls below the bound BEFORE the exact shingle verify — the
    signatures are already in hand (k ints/entity, broadcast-size for 10^5
    entities, partition-joinable beyond), so on hot-domain key
    distributions where LSH buckets flood (millions of candidates from
    near-uniform keys) the expensive exact verify join shrinks ~20× for the
    cost of one cheap join. Estimator std is √(j(1-j)/k); the bound must
    sit ≥3σ below the threshold so true pairs pass.

    ``"auto"`` measures the flood before paying for it: candidates and
    entities are counted (one cheap count over the already-built candidate
    frame), and the prefilter — at bound = threshold − 3·√(0.25/k), the
    worst-case 3σ margin — engages only when candidates/entities exceeds
    ``auto_prefilter_ratio``. On well-distributed keys the ratio stays
    small, the prefilter never activates, and results are bit-identical to
    the plain exact path (which is why the contract oracle is unchanged);
    on a hot-domain flood the exact verify join shrinks by the prefilter's
    selectivity. Default off (None): the exact path is the oracle-checked
    semantics.

    ``verify="estimate"`` replaces the exact char-shingle verify with the
    minhash-estimate Jaccard (fraction of agreeing signature positions) —
    the 100 TB mode, mirroring dedup.minhash_estimate_pairs: the verify
    join touches only the k-int signatures already in hand, never re-joins
    the entity keys, at ±1/√k estimator error. Default "exact".

    ``max_bucket``/``observation``: LSH hot-bucket cap and its
    dropped-bucket/member metrics (see dedup.drop_observation) — drops are
    reported on the candidate-building job, never silent.

    ``drop_common_df`` (e.g. 0.05): drop shingles present in more than
    this fraction of entities BEFORE minhash signing (common_shingles) —
    the scale-invariant hot-domain defuse. Candidates then come from each
    key's distinctive shingles (no shared-prefix bucket floods at any
    corpus size). The exact VERIFY still computes Jaccard on the FULL
    shingle sets (edge threshold semantics unchanged); estimate-mode
    verify measures agreement of the FILTERED signatures — on a hot shape
    that is the safer estimator (shared-prefix agreement no longer inflates
    cross-doc similarity toward the threshold)."""
    # ONE interpreted char-shingle pass serves every consumer that needs
    # the raw shingle sets — the DF census (drop_common_df), the minhash
    # staging, and the exact verify. Without sharing, the hot path hashed
    # every key THREE times (census explode, signature staging, verify
    # cache — ~1 s each at bench scale on ~100-shingle hot keys).
    shingled = None
    if drop_common_df is not None or verify != "estimate":
        shingled = entities.select(
            F.col(id_col),
            F.col(key_col),
            char_shingles(F.col(key_col), hash_mode=hash_mode).alias("_sh"),
        ).cache()
    exclude = None
    if drop_common_df is not None:
        from .dedup import high_df_hashes

        exclude = high_df_hashes(
            shingled, lambda b: b.select(F.col("_sh")), drop_common_df
        )
    sigs = entity_minhash(
        entities, key_col, id_col, num_hashes, hash_mode, exclude=exclude,
        shingled=shingled,
    )
    cached_sigs = None
    if verify == "estimate" or estimate_prefilter is not None:
        # the estimate paths reference sigs from THREE joins (band
        # candidates + both aliased sides of the agree-count) — without a
        # cache the tokenize→shingle→k-hash chain re-executes per
        # reference (the same recompute the k-lambda staging above kills);
        # mirrors dedup.minhash_estimate_pairs' cache. Unpersisted after
        # the CC edge set is checkpointed (blocking=False — safe because
        # connected_components materializes every round eagerly).
        cached_sigs = sigs = sigs.cache()
    cands = candidate_edges(
        sigs, id_col, bands, max_bucket=max_bucket, hash_mode=hash_mode,
        observation=observation,
    )
    cands_ckpt_ids: set = set()
    if estimate_prefilter == "auto":
        # measure the candidate flood: localCheckpoint so the LSH band
        # explode runs once (the count below materializes it, the verify
        # join reuses it) — on a flood shape recomputing the band join
        # would double the most expensive stage
        cands = cands.localCheckpoint(eager=True)
        cands_ckpt_ids = {
            i for i in (_checkpointed_rdd_id(cands),) if i is not None
        }
        n_cands = cands.count()
        n_entities = entities.select(id_col).count()
        if n_entities > 0 and n_cands / n_entities > auto_prefilter_ratio:
            sigma = (0.25 / num_hashes) ** 0.5
            estimate_prefilter = jaccard_threshold - 3.0 * sigma
        else:
            estimate_prefilter = None

    def _estimate_filtered(pairs: DataFrame, bound: float) -> DataFrame:
        sa, sb = sigs.alias("sa"), sigs.alias("sb")
        agree = F.size(
            F.filter(
                F.zip_with(
                    F.col("sa.minhash"), F.col("sb.minhash"), lambda x, y: x == y
                ),
                lambda eq: eq,
            )
        )
        est = agree.cast("double") / F.size(F.col("sa.minhash"))
        return (
            pairs.join(sa, pairs["src"] == F.col(f"sa.{id_col}"))
            .join(sb, pairs["dst"] == F.col(f"sb.{id_col}"))
            .filter(est >= bound)
            .select("src", "dst")
        )

    if verify == "estimate":
        edges = _estimate_filtered(cands, jaccard_threshold)
    else:
        if estimate_prefilter is not None:
            cands = _estimate_filtered(cands, estimate_prefilter)
        # verify candidates with exact char-shingle Jaccard before
        # clustering — on the FULL (pre-exclusion) shingle sets, read from
        # the SHARED cached shingle frame (it feeds both aliased join
        # sides and was already filled by the census/signature jobs).
        keys = shingled.select(F.col(id_col), F.col("_sh").alias("sh"))
        a, b = keys.alias("a"), keys.alias("b")
        inter = F.size(F.array_intersect("a.sh", "b.sh"))
        union = F.size(F.array_union("a.sh", "b.sh"))
        jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
        edges = (
            cands.join(a, cands["src"] == F.col(f"a.{id_col}"))
            .join(b, cands["dst"] == F.col(f"b.{id_col}"))
            .filter(jac >= jaccard_threshold)
            .select("src", "dst")
        )

    comps = connected_components(edges)
    if cached_sigs is not None:
        # connected_components eagerly checkpointed the edge set, so every
        # plan that referenced the signatures has already run — drop the
        # cache instead of leaking it for the session's lifetime
        cached_sigs.unpersist(blocking=False)
    if shingled is not None:
        shingled.unpersist(blocking=False)  # same lifecycle as the sigs
    # same reclamation for the auto-prefilter candidate checkpoint: CC has
    # its own checkpoints of everything downstream, so the (possibly huge)
    # flood-shape candidate blocks are dead weight from here on
    _unpersist_ids(entities.sparkSession, cands_ckpt_ids)
    return (
        entities.join(comps, entities[id_col] == comps["id"], "left")
        .select(
            F.col(id_col),
            F.col(key_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("canonical_id"),
        )
    )


def incremental_candidate_edges(
    flagged_sigs: DataFrame,
    id_col: str = "entity_id",
    is_new_col: str = "_is_new",
    bands: int = 8,
    max_bucket: int = 500,
    hash_mode: str = "xxhash64",
    observation=None,
) -> DataFrame:
    """LSH candidate edges restricted to pairs touching ≥1 NEW entity.

    Bands with the SAME kernel as the full run (dedup.band_hash_array), so
    an incremental batch lands in exactly the buckets a full recompute
    would build — then two delta filters make the mature-corpus case
    cheap:

    - whole buckets with zero new members are dropped BEFORE the pair
      explode (an ``exists`` over the grouped member array — on a mature
      corpus that is almost every bucket, and no prior-prior pair ever
      materializes);
    - within mixed buckets, prior-prior pairs are filtered after the
      explode (bounded by max_bucket² per bucket either way).

    Returns distinct (src, dst), src ≠ dst, each touching a new entity.
    """
    from .dedup import _bucket_member_pairs, band_hash_array

    banded = flagged_sigs.select(
        F.struct(
            F.col(id_col).alias("id"), F.col(is_new_col).alias("is_new")
        ).alias("m"),
        F.posexplode(band_hash_array(bands, hash_mode)).alias(
            "band_idx", "band_hash"
        ),
    )
    pairs = _bucket_member_pairs(
        banded.select("band_idx", "band_hash", "m"),
        ["band_idx", "band_hash"],
        max_bucket,
        observation,
        bucket_filter=lambda ms: F.exists(ms, lambda m: m["is_new"]),
    )
    return (
        pairs.where(F.col("a.is_new") | F.col("b.is_new"))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def canonicalize_incremental(
    prior: DataFrame,
    new_entities: DataFrame,
    key_col: str = "entity_key",
    id_col: str = "entity_id",
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
    hash_mode: str = "xxhash64",
    max_bucket: int = 500,
    observation=None,
    drop_common_df: Optional[float] = None,
) -> DataFrame:
    """Fold a NEW batch of entities into a prior canonicalization WITHOUT
    re-clustering the whole corpus — the daily-increment path at 10^12
    docs, where full canonicalize_entities would re-pair and re-CC
    everything for a <1% delta.

    ``prior``: the previous run's (id, key, canonical_id) assignment
    (canonical_id = min entity id of each component, as
    canonicalize_entities emits). ``new_entities``: (id, key), ids
    disjoint from prior. Returns the merged (id, key, canonical_id)
    covering prior ∪ new.

    How it stays sub-linear in the prior corpus:

    1. Signatures ARE recomputed over the union (one linear, embarrassingly
       parallel scan — signatures are per-row functions, so prior rows hash
       to byte-identical signatures), but every super-linear stage sees
       only the delta: bucket pairing skips all-prior buckets wholesale
       (incremental_candidate_edges), the exact-Jaccard verify join runs
       on new-touching candidates only, and connected components runs on
       the TOUCHED subgraph.
    2. Prior connectivity is injected as (member → canonical_id) star
       edges, but only for components actually touched by a new edge:
       edge endpoints ⋉ prior (broadcast semi-join — the endpoint set is
       delta-sized) → touched canonical ids → their members. Untouched
       prior rows stream through unchanged; the prior table is scanned,
       never shuffled (both semi-joins broadcast the small side under
       AQE).
    3. CC input = new-touching verified edges ∪ touched star edges. Since
       the star edges have exactly the transitive closure of the prior
       run's prior-prior edges, components (and their min-id
       representatives) equal a full recompute's — the equivalence the
       contract query pins against the full-corpus DuckDB oracle.

    Exactness caveats (documented, test-pinned): equivalence to a full
    recompute holds when (a) no mixed bucket exceeds ``max_bucket`` in the
    union while its prior-run counterpart stayed under (a bucket CAN cross
    the cap as the corpus grows — then the incremental result keeps
    previously-found merges a fresh full run would drop, which is the
    better behavior anyway), and (b) ``drop_common_df`` is either None or
    accepted as recomputed over the union (document frequencies shift with
    the corpus; prior signatures were signed under the OLD exclusion set,
    so aggressive DF exclusion weakens the equivalence to "same components
    for all pairs whose buckets agree"). The contract query runs with (a)
    impossible (cap ≥ corpus) and (b) None.
    """
    prior_rows = prior.select(
        F.col(id_col), F.col(key_col), F.col("canonical_id")
    )
    all_entities = prior_rows.select(id_col, key_col).unionByName(
        new_entities.select(id_col, key_col)
    )
    exclude = None
    if drop_common_df is not None:
        exclude = common_shingles(
            all_entities, key_col, df_fraction=drop_common_df,
            hash_mode=hash_mode,
        )
    sigs = entity_minhash(
        all_entities, key_col, id_col, num_hashes, hash_mode, exclude=exclude
    )
    new_ids = new_entities.select(
        F.col(id_col), F.lit(True).alias("_is_new")
    )
    flagged = sigs.join(new_ids, id_col, "left").withColumn(
        "_is_new", F.coalesce(F.col("_is_new"), F.lit(False))
    )
    cands = incremental_candidate_edges(
        flagged, id_col, "_is_new", bands, max_bucket, hash_mode, observation
    )
    # the candidate set is DELTA-sized — checkpoint it once so it can
    # seed the endpoint-id semi-join below without re-running the LSH
    # banding chain
    cands = cands.localCheckpoint(eager=True)
    cand_ids = (
        cands.select(F.col("src").alias(id_col))
        .union(cands.select(F.col("dst").alias(id_col)))
        .distinct()
    )
    # exact-Jaccard verify on FULL shingle sets — identical edge semantics
    # to canonicalize_entities' exact path; cached for the two aliased
    # join sides. Restricted to CANDIDATE ENDPOINTS first: the verify's
    # inner joins only ever read those ids, but an unrestricted cache
    # materialized the interpreted shingle pass over the ENTIRE prior
    # corpus every fold — the one remaining full-corpus super-linear-ish
    # cost of the daily increment (a delta-sized pass now).
    keys = (
        all_entities.join(cand_ids, id_col, "leftsemi")
        .select(
            F.col(id_col),
            char_shingles(F.col(key_col), hash_mode=hash_mode).alias("sh"),
        )
        .cache()
    )
    a, b = keys.alias("a"), keys.alias("b")
    inter = F.size(F.array_intersect("a.sh", "b.sh"))
    union = F.size(F.array_union("a.sh", "b.sh"))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    edges = (
        cands.join(a, cands["src"] == F.col(f"a.{id_col}"))
        .join(b, cands["dst"] == F.col(f"b.{id_col}"))
        .filter(jac >= jaccard_threshold)
        .select("src", "dst")
    )
    # delta-sized edge set feeds every join below — checkpoint once so the
    # whole LSH+verify chain doesn't replan into each of the three uses
    edges = edges.localCheckpoint(eager=True)

    endpoints = (
        edges.select(F.col("src").alias(id_col))
        .union(edges.select(F.col("dst").alias(id_col)))
        .distinct()
    )
    touched_canons = (
        prior_rows.join(endpoints, id_col, "leftsemi")
        .select("canonical_id")
        .distinct()
    )
    touched_members = prior_rows.join(
        touched_canons, "canonical_id", "leftsemi"
    )
    star_edges = touched_members.select(
        F.col(id_col).alias("src"), F.col("canonical_id").alias("dst")
    ).where(F.col("src") != F.col("dst"))

    comps = connected_components(edges.unionByName(star_edges))
    # CC materialized everything referencing the shingle cache — reclaim
    keys.unpersist(blocking=False)
    changed = (
        touched_members.select(id_col, key_col)
        .unionByName(new_entities.select(id_col, key_col))
        .join(comps, F.col(id_col) == comps["id"], "left")
        .select(
            F.col(id_col),
            F.col(key_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias(
                "canonical_id"
            ),
        )
    )
    untouched = prior_rows.join(touched_canons, "canonical_id", "left_anti")
    return untouched.select(id_col, key_col, "canonical_id").unionByName(
        changed
    )
