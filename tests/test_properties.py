"""Property-based tests (hypothesis) over refmap invariants — fuzzing the
contracts the golden tests pin pointwise."""

import json
import string
import uuid

from hypothesis import given, settings

# Deadline disabled: examples are deterministic pure-Python; wall-clock spikes
# under a loaded host (Spark JVM in the same suite) otherwise flake as
# DeadlineExceeded.
settings.register_profile("no_deadline", deadline=None)
settings.load_profile("no_deadline")
from hypothesis import strategies as st

from case_uco_ontology_map_spark.refmap.extract import extract_text, render_html
from case_uco_ontology_map_spark.refmap.identity import (
    NS_SLOT,
    fingerprint_record,
    normalize_key,
    slugify,
    tokenize,
    uuid5_str,
)

# JSON-native scalar values (no floats: canonical-JSON float repr is a
# documented non-goal — the reference fingerprints parsed-JSON payloads
# whose numerics in our pipelines are ints/strings)
scalars = st.one_of(
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.text(max_size=40),
)
records = st.dictionaries(
    st.text(string.ascii_letters + string.digits + "_- ", min_size=1, max_size=20),
    st.one_of(scalars, st.lists(st.text(max_size=20), max_size=4)),
    max_size=8,
)


@given(records)
@settings(max_examples=200)
def test_fingerprint_is_key_order_invariant(rec):
    reordered = dict(reversed(list(rec.items())))
    assert fingerprint_record(rec) == fingerprint_record(reordered)


@given(records, records)
@settings(max_examples=200)
def test_fingerprint_distinguishes_distinct_records(a, b):
    if a != b:
        assert fingerprint_record(a) != fingerprint_record(b)
    else:
        assert fingerprint_record(a) == fingerprint_record(b)


@given(records)
@settings(max_examples=100)
def test_fingerprint_matches_reference_formula(rec):
    import hashlib

    expected = hashlib.sha256(
        json.dumps(rec, sort_keys=True, separators=(",", ":")).encode("utf-8")
    ).hexdigest()
    assert fingerprint_record(rec) == expected


@given(st.text(max_size=60))
@settings(max_examples=300)
def test_uuid5_fast_path_equals_stdlib(name):
    assert uuid5_str(NS_SLOT, name) == str(uuid.uuid5(NS_SLOT, name))


@given(st.text(max_size=40))
@settings(max_examples=200)
def test_slugify_normalize_idempotent(name):
    assert slugify(slugify(name)) == slugify(name)
    assert normalize_key(normalize_key(name)) == normalize_key(name)


@given(st.text(string.ascii_letters + string.digits + "_-: ", max_size=40))
@settings(max_examples=200)
def test_tokenize_produces_lower_nonempty(name):
    toks = tokenize(name)
    assert all(t and t == t.lower() for t in toks)


# text lines in the extractor's normal form: no leading/trailing/double
# spaces, printable, non-empty
_line = st.text(
    string.ascii_letters + string.digits + ".,!?&<>'\"()-",
    min_size=1,
    max_size=30,
).map(lambda s: s.strip()).filter(lambda s: s)
_canonical_text = st.lists(
    st.lists(_line, min_size=1, max_size=6).map(" ".join), min_size=0, max_size=5
).map("\n".join)


@given(_canonical_text, st.text(max_size=20), st.sampled_from(["en", "es", "zh"]))
@settings(max_examples=200)
def test_extraction_inverts_render(text, title, lang):
    """The byte-identity invariant fuzzed: extract(render(t)) == t for any
    text already in the extractor's whitespace normal form — including
    texts containing <, >, &, quotes (entity escaping round-trip)."""
    assert extract_text(render_html(text, title, lang)) == text


@given(st.binary(max_size=200))
@settings(max_examples=100)
def test_extractor_total_on_arbitrary_bytes(raw):
    """The extractor never throws on arbitrary byte garbage (decode policy
    is utf-8/replace) and always returns a str."""
    out = extract_text(raw)
    assert isinstance(out, str)


@given(records)
def test_emitter_equals_generic_on_any_record(rec):
    """The shape-compiled TripleEmitter must emit EXACTLY the generic
    path's rows for arbitrary record shapes — including shapes it refuses
    to compile (bools/lists/floats → generic fallback) and null/empty
    patterns. One emitter instance across examples exercises template
    reuse and the per-shape verify rail."""
    from case_uco_ontology_map_spark.operators.triples import (
        extend_ontology_map_for_schema,
    )
    from case_uco_ontology_map_spark.plans.pipeline import (
        PAGE_SHARED_METADATA,
        web_ontology_map,
    )
    from case_uco_ontology_map_spark.refmap.emitter import TripleEmitter
    from case_uco_ontology_map_spark.refmap.graph import record_to_triples
    from case_uco_ontology_map_spark.refmap.planner import OntologyContext

    global _EM_CTX
    try:
        em, ctx, omap = _EM_CTX
    except NameError:
        field_types = {"url": "str", "n_chars": "int"}
        omap = extend_ontology_map_for_schema(
            web_ontology_map(), field_types, PAGE_SHARED_METADATA["artifact_type"]
        )
        ctx = OntologyContext(omap)
        em = TripleEmitter(omap, ctx)
        _EM_CTX = (em, ctx, omap)

    fp, ruuid, rows = em.rows_for(rec)
    assert rows == record_to_triples(rec, ctx, omap)
    assert not any(t and t.dead for t in em._templates.values())
