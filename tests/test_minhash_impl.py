"""Arrow minhash fold ≡ expr fold — bit-exact parity pins for the r6
optimization (dedup.minhash_fold_arrow). The fold is pure int64
arithmetic ((abs(s) % p) * a + b) % p with every intermediate < 2^62, so
numpy and the JVM must agree EXACTLY; these tests pin that across normal,
empty, null, excluded-everything, and randomized inputs in both hash
modes and both signature widths used by the engine."""

import random

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(20260822)
    words = ["alpha", "beta", "gamma", "delta", "x", "Y9", "zz-top", "."]
    rows = [
        (0, ""),  # empty → sentinel signature
        (1, None),  # null text → sentinel signature
        (2, "one two"),  # fewer tokens than shingle width
        (3, "a a a a a a"),  # degenerate repetition
    ] + [
        (
            10 + i,
            " ".join(rng.choice(words) for _ in range(rng.randint(1, 40))),
        )
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("hash_mode", ["xxhash64", "md5_60"])
@pytest.mark.parametrize("num_hashes", [16, 64])
def test_minhash_signatures_arrow_matches_expr(docs, hash_mode, num_hashes):
    from case_uco_ontology_map_spark.operators.dedup import minhash_signatures

    a = minhash_signatures(
        docs, num_hashes=num_hashes, hash_mode=hash_mode, impl="arrow"
    )
    e = minhash_signatures(
        docs, num_hashes=num_hashes, hash_mode=hash_mode, impl="expr"
    )
    assert _rows(a) == _rows(e)


def test_minhash_signatures_exclude_parity(docs):
    from case_uco_ontology_map_spark.operators.dedup import (
        common_shingle_hashes,
        minhash_signatures,
    )

    ex = common_shingle_hashes(docs, df_fraction=0.05)
    a = minhash_signatures(docs, exclude=ex, impl="arrow")
    e = minhash_signatures(docs, exclude=ex, impl="expr")
    assert _rows(a) == _rows(e)


def test_entity_minhash_arrow_matches_expr(spark):
    from case_uco_ontology_map_spark.operators.canonicalize import (
        common_shingles,
        entity_minhash,
    )

    rng = random.Random(7)
    rows = [
        (0, ""),
        (1, None),
        (2, "ab"),  # shorter than the 3-gram width
    ] + [
        (
            10 + i,
            "https://hot.example.com/section/"
            + "".join(rng.choice("abcdef01") for _ in range(24))
            + f"-v{i % 4}",
        )
        for i in range(60)
    ]
    ents = spark.createDataFrame(rows, "entity_id long, entity_key string")
    for exclude in (None, common_shingles(ents, df_fraction=0.2)):
        a = entity_minhash(ents, exclude=exclude, impl="arrow")
        e = entity_minhash(ents, exclude=exclude, impl="expr")
        assert _rows(a) == _rows(e)


def test_canonicalize_unchanged_by_default_impl(spark):
    """canonicalize_entities (which signs via the default impl) must land
    the exact grouping the expr fold produced — the grouping IS the
    contract surface."""
    from case_uco_ontology_map_spark.operators.canonicalize import (
        canonicalize_entities,
    )

    rng = random.Random(99)
    bases = [
        "".join(rng.choice("0123456789abcdef") for _ in range(16))
        for _ in range(25)
    ]
    rows = [
        (i * 10 + v, f"ent-{bases[i]}-v{v}")
        for i in range(25)
        for v in range(4)
    ]
    ents = spark.createDataFrame(rows, "entity_id long, entity_key string")
    out = canonicalize_entities(ents, jaccard_threshold=0.7, verify="estimate")
    got = {
        (r["entity_id"], r["canonical_id"]) for r in out.collect()
    }
    # every group of 4 variants collapses to its min id; 25 groups
    assert len({c for _, c in got}) == 25
    for eid, cid in got:
        assert cid == (eid // 10) * 10
