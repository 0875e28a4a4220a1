"""Negative sampling for KG-embedding training data.

A TransE/DistMult-style trainer consumes (positive triple, k corrupted
triples) pairs; at web scale the corruption draw must be deterministic
(re-materializable bit-identically for ablations, like every sampler in
this repo — see operators/sampling.py) and distributed (no RNG state, no
driver-side entity list). (No reference counterpart: the reference stops
at graph emission; this is the downstream-training surface the 100 TB
corpus exists to feed.)

Mechanism — hash-ring draw over a bucketed entity pool:
  * the ENTITY POOL (distinct subjects + IRI objects) is bucketed by
    ``pmod(hash(node), buckets)`` and reduced to one representative per
    bucket (min node) — a ≤``buckets``-row frame that BROADCASTS;
  * each (triple, i) probes bucket ``pmod(hash(subj‖pred‖obj‖i‖salt),
    buckets)``; empty buckets fall through to the next bucket and then
    to the global min node (a lazy 1-row broadcast, no driver action);
  * accidental positives are removed by an anti-join against the true
    edge set, and draws equal to the original object are dropped.

Every step is a JVM expression, a broadcast join, or one anti-join on
(subj, pred, neg_obj) — the only full shuffle in the plan. The md5_60
hash mode replays bit-exactly in DuckDB (the contract oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import content_hash64


def negative_samples(
    triples: DataFrame,
    k: int = 1,
    buckets: int = 4096,
    salt: str = "",
    hash_mode: str = "xxhash64",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    obj_is_iri_col: "str | None" = None,
    corrupt: str = "object",
) -> DataFrame:
    """→ ``(subj, pred, obj, i, neg_obj)`` (or ``neg_subj`` with
    ``corrupt="subject"``): ``k`` deterministic corruptions per input
    triple, filtered against the true edge set (no accidental
    positives, never the original term). Rows whose draw chain lands
    back on the original term are dropped, so a triple can yield < k
    negatives — the trainer's usual contract. TransE-style training
    corrupts both sides: call once per mode (the subject mode folds a
    marker into the salt, so its draws are independent of the object
    mode's at the same salt).

    When ``obj_is_iri_col`` is given, only IRI-object rows are corrupted
    and only IRI objects join the entity pool (literals are not
    entities)."""
    if corrupt not in ("object", "subject"):
        raise ValueError(f"corrupt must be object|subject, got {corrupt!r}")
    if k < 1:
        raise ValueError("k must be >= 1")
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    t = triples.select(subj_col, pred_col, obj_col, *(
        [obj_is_iri_col] if obj_is_iri_col else []
    ))
    # subjects are entities regardless of their objects' kind — pool the
    # subject side from the UNFILTERED frame so an entity appearing only
    # in literal-object triples can still be drawn as a corruption; only
    # the object side of the pool is IRI-gated
    all_subjects = t.select(F.col(subj_col).alias("node"))
    if obj_is_iri_col:
        t = t.filter(F.col(obj_is_iri_col)).drop(obj_is_iri_col)
    t = t.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    )
    pool = (
        all_subjects
        .unionByName(t.select(F.col("obj").alias("node")))
        .distinct()
    )
    rep = pool.groupBy(
        F.pmod(content_hash64(F.col("node"), hash_mode), F.lit(buckets))
        .alias("bucket")
    ).agg(F.min("node").alias("rep"))
    gmin = pool.agg(F.min("node").alias("gmin"))

    eff_salt = salt if corrupt == "object" else salt + "\x1fsubj"
    probes = t.select(
        "subj", "pred", "obj",
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("i"),
    ).withColumn(
        "_p",
        F.pmod(
            content_hash64(
                F.concat_ws(
                    "\x1f", "subj", "pred", "obj",
                    F.col("i").cast("string"), F.lit(eff_salt),
                ),
                hash_mode,
            ),
            F.lit(buckets),
        ),
    )
    r1 = F.broadcast(rep.select(F.col("bucket").alias("_p"), F.col("rep").alias("_r1")))
    r2 = F.broadcast(rep.select(F.col("bucket").alias("_p2"), F.col("rep").alias("_r2")))
    neg_col = "neg_obj" if corrupt == "object" else "neg_subj"
    orig_col = "obj" if corrupt == "object" else "subj"
    drawn = (
        probes.join(r1, on="_p", how="left")
        .withColumn("_p2", F.pmod(F.col("_p") + 1, F.lit(buckets)))
        .join(r2, on="_p2", how="left")
        .crossJoin(F.broadcast(gmin))
        .select(
            "subj", "pred", "obj", "i",
            F.coalesce("_r1", "_r2", "gmin").alias(neg_col),
        )
        .filter(F.col(neg_col) != F.col(orig_col))
    )
    if corrupt == "object":
        true_side = t.select(
            F.col("subj"), F.col("pred"), F.col("obj").alias("neg_obj")
        )
        keys = ["subj", "pred", "neg_obj"]
    else:
        true_side = t.select(
            F.col("subj").alias("neg_subj"), F.col("pred"), F.col("obj")
        )
        keys = ["neg_subj", "pred", "obj"]
    return drawn.join(true_side, on=keys, how="left_anti")


def _quantized(col, scale: int):
    return F.transform(
        col, lambda x: F.floor(x * F.lit(float(scale))).cast("long")
    )


def transe_ranks(
    negatives: DataFrame,
    entity_emb: DataFrame,
    relation_emb: DataFrame,
    scale: int = 1000,
    id_col: str = "id",
    vec_col: str = "vec",
    rel_col: str = "pred",
    model: str = "transe",
) -> DataFrame:
    """TransE link-prediction ranking → ``(subj, pred, obj, n_neg,
    rank)``: for each positive triple with its ``negative_samples``
    corruptions, the filtered rank of the true object by L1 TransE
    distance ``‖h + r − t‖₁`` (smaller is better; ``rank = 1 + #{
    negatives strictly closer}``, so ties never demote the positive —
    the deterministic convention). The standard KG-embedding eval
    harness (Bordes 2013), downstream of ``random_walks`` /
    ``neighbor_sample`` / ``negative_samples`` in the graph-ML training
    loop.

    **No float decides a rank**: embeddings are quantized ONCE to
    integers (``floor(x·scale)``, the SQ8/gopher discipline) and every
    distance is exact BIGINT arithmetic — Spark and DuckDB agree
    bit-for-bit, and summation order cannot flip a comparison. Rows
    missing an entity or relation embedding drop (inner joins — eval
    over the embedded subgraph, the trainer's convention).

    Scale shape: three equi-joins against the entity table (the only
    shuffles — at 10^9 entities they co-partition on the id) plus one
    BROADCAST relation join (relations are thousands, not billions);
    distances fold in-row over the arrays; one groupBy on the triple
    key emits the rank.

    ``model``: ``'transe'`` (L1 distance, smaller is better — Bordes
    2013) or ``'distmult'`` (trilinear dot ``Σ hᵢ·rᵢ·tᵢ``, LARGER is
    better — Yang 2015); the comparison direction flips with the
    model, everything else (joins, quantization, tie convention) is
    shared. Quantized products stay exact: |q| ≤ scale·|x| per factor,
    so a 1024-dim product sum is far inside BIGINT."""
    q = entity_emb.select(
        F.col(id_col).alias("_id"), _quantized(F.col(vec_col), scale).alias("_v")
    )
    r = relation_emb.select(
        F.col(rel_col).alias("_rp"),
        _quantized(F.col(vec_col), scale).alias("_rv"),
    )
    h = q.select(F.col("_id").alias("_hs"), F.col("_v").alias("_hv"))
    t = q.select(F.col("_id").alias("_to"), F.col("_v").alias("_tv"))
    tn = q.select(F.col("_id").alias("_tn"), F.col("_v").alias("_nv"))
    j = (
        negatives.join(h, on=negatives["subj"] == h["_hs"])
        .join(F.broadcast(r), on=negatives["pred"] == r["_rp"])
        .join(t, on=negatives["obj"] == t["_to"])
        .join(tn, on=negatives["neg_obj"] == tn["_tn"])
    )
    if model == "transe":
        hr = F.zip_with("_hv", "_rv", lambda a, b: a + b)

        def score(target):
            diff = F.zip_with(hr, target, lambda a, b: F.abs(a - b))
            return F.aggregate(
                diff, F.lit(0).cast("long"), lambda acc, x: acc + x
            )

        neg_beats = F.col("_dn") < F.col("_dp")  # smaller distance wins
    elif model == "distmult":
        hr = F.zip_with("_hv", "_rv", lambda a, b: a * b)

        def score(target):
            prod = F.zip_with(hr, target, lambda a, b: a * b)
            return F.aggregate(
                prod, F.lit(0).cast("long"), lambda acc, x: acc + x
            )

        neg_beats = F.col("_dn") > F.col("_dp")  # larger score wins
    else:
        raise ValueError(f"unknown model {model!r} (transe|distmult)")

    scored = j.select(
        "subj", "pred", "obj",
        score(F.col("_tv")).alias("_dp"),
        score(F.col("_nv")).alias("_dn"),
    )
    return scored.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).alias("n_neg"),
        (1 + F.sum(neg_beats.cast("long"))).alias("rank"),
    )


def transe_ranks_sql(
    negatives: str = "n",
    entities: str = "e",
    relations: str = "r",
    scale: int = 1000,
    id_col: str = "id",
    vec_col: str = "vec",
    rel_col: str = "pred",
    model: str = "transe",
) -> str:
    """DuckDB replay of ``transe_ranks`` — identical floor quantization
    and exact-integer score folds (3-ary ``list_zip`` + numeric struct
    indexing); ``model`` flips the fold (L1 vs trilinear product) and
    the comparison direction exactly as the engine does."""
    qv = (
        f"list_transform({vec_col}, x -> CAST(floor(x * {float(scale)}) "
        "AS BIGINT))"
    )
    if model == "transe":
        dist = (
            "list_sum(list_transform(list_zip(h.qv, rr.qv, {t}.qv), "
            "s -> abs(s[1] + s[2] - s[3])))"
        )
        beats = "dn < dp"
    elif model == "distmult":
        dist = (
            "list_sum(list_transform(list_zip(h.qv, rr.qv, {t}.qv), "
            "s -> s[1] * s[2] * s[3]))"
        )
        beats = "dn > dp"
    else:
        raise ValueError(f"unknown model {model!r} (transe|distmult)")
    return f"""
WITH q AS (SELECT {id_col} AS id, {qv} AS qv FROM {entities}),
qr AS (SELECT {rel_col} AS pred, {qv} AS qv FROM {relations}),
scored AS (
  SELECT n.subj, n.pred, n.obj,
         {dist.format(t='t')} AS dp,
         {dist.format(t='tn')} AS dn
  FROM {negatives} n
  JOIN q h ON n.subj = h.id
  JOIN qr rr ON n.pred = rr.pred
  JOIN q t ON n.obj = t.id
  JOIN q tn ON n.neg_obj = tn.id
)
SELECT subj, pred, obj, CAST(count(*) AS BIGINT) AS n_neg,
       CAST(1 + SUM(CASE WHEN {beats} THEN 1 ELSE 0 END) AS BIGINT)
         AS rank
FROM scored GROUP BY subj, pred, obj
"""


def _lcm_upto(n: int) -> int:
    from math import gcd

    out = 1
    for i in range(2, n + 1):
        out = out * i // gcd(out, i)
    return out


def kg_embedding_eval(
    ranks: DataFrame,
    max_rank: int,
    ks: "tuple[int, ...]" = (1, 3, 10),
) -> DataFrame:
    """Link-prediction metrics from a ``transe_ranks`` frame → ONE row
    ``(n_triples, hits_1, hits_3, hits_10, mrr_num, mrr_den)`` — all
    EXACT integers: hits are counts, and MRR is the exact rational
    ``mrr_num/mrr_den`` with ``mrr_num = Σ L/rank`` for
    ``L = lcm(1..max_rank)`` (every rank divides L, so the division is
    integer-exact and summation order cannot move the value — the
    salted-aggregate discipline applied to an evaluation metric).
    ``max_rank`` is k+1 for k corruptions per triple; ranks above it
    are excluded from mrr_num and COUNTED LOUDLY in ``n_over_max``
    (a nonzero value means the caller's max_rank claim was wrong)."""
    L = _lcm_upto(int(max_rank))
    r = F.col("rank")
    guarded = F.when(r <= max_rank, F.expr(f"CAST({L} AS BIGINT) DIV rank"))
    aggs = [
        F.count(F.lit(1)).alias("n_triples"),
        *[
            F.sum((r <= k).cast("long")).alias(f"hits_{k}")
            for k in ks
        ],
        F.sum(guarded).alias("mrr_num"),
        (F.count(F.lit(1)) * F.lit(L)).cast("long").alias("mrr_den"),
        F.sum((r > max_rank).cast("long")).alias("n_over_max"),
    ]
    return ranks.agg(*aggs)


def kg_embedding_eval_sql(
    ranks: str = "rk",
    max_rank: int = 9,
    ks: "tuple[int, ...]" = (1, 3, 10),
) -> str:
    """ANSI replay of ``kg_embedding_eval``."""
    L = _lcm_upto(int(max_rank))
    hits = ",\n       ".join(
        f"CAST(SUM(CASE WHEN rank <= {k} THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS hits_{k}"
        for k in ks
    )
    return f"""
SELECT CAST(count(*) AS BIGINT) AS n_triples,
       {hits},
       CAST(SUM(CASE WHEN rank <= {int(max_rank)} THEN {L} // rank
                     ELSE NULL END) AS BIGINT) AS mrr_num,
       CAST(count(*) * {L} AS BIGINT) AS mrr_den,
       CAST(SUM(CASE WHEN rank > {int(max_rank)} THEN 1 ELSE 0 END)
         AS BIGINT) AS n_over_max
FROM {ranks}
"""
