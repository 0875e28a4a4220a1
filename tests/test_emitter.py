"""Shape-compiled TripleEmitter ≡ generic record path (refmap/emitter).

The emitter is a pure specializer: every test here asserts row-for-row
equality with record_to_triples (the path whose reference parity is pinned
by test_refmap_goldens / test_golden_e2e_spark), across the shapes that
exercise its gates — null pattern, empty strings, ints, relationship maps,
propertyFieldMap, and the fallback types it must refuse to compile.
"""

from case_uco_ontology_map_spark.operators.triples import (
    extend_ontology_map_for_schema,
)
from case_uco_ontology_map_spark.plans.pipeline import (
    PAGE_SHARED_METADATA,
    _page_record,
    web_ontology_map,
)
from case_uco_ontology_map_spark.refmap.emitter import TripleEmitter
from case_uco_ontology_map_spark.refmap.graph import record_to_triples
from case_uco_ontology_map_spark.refmap.planner import OntologyContext


def _web_setup():
    field_types = {
        "url": "str", "warc_time": "str", "lang": "str", "n_chars": "int",
        "content_sha256": "str", "host": "str", "mime_type": "str",
    }
    omap = extend_ontology_map_for_schema(
        web_ontology_map(), field_types, PAGE_SHARED_METADATA["artifact_type"]
    )
    return omap, OntologyContext(omap), dict(PAGE_SHARED_METADATA)


def _assert_equal(em, ctx, omap, rec):
    fp, ruuid, rows = em.rows_for(rec)
    assert rows == record_to_triples(rec, ctx, omap)
    assert all(r[5] == ruuid for r in rows)


def test_web_shapes_match_generic():
    omap, ctx, sh = _web_setup()
    em = TripleEmitter(omap, ctx)
    cases = [
        ("https://a.example.org/1", "2025-01-01T00:00:00Z",
         b"<html><title>t</title><body>Hello world.</body></html>", "en"),
        ("https://b.example.org/2", "2025-06-30T12:34:56Z",
         b"<html><body>Zweite Seite.</body></html>", "de"),
        # null html -> empty text, n_chars=0 (pinned policy)
        ("https://c.example.org/3", "2025-01-01T00:00:00Z", None, "en"),
        # null lang and empty lang are distinct shapes
        ("https://d.example.org/4", "2025-01-01T00:00:00Z",
         b"<html><body>x</body></html>", None),
        ("https://e.example.org/5", "2025-01-01T00:00:00Z",
         b"<html><body>x</body></html>", ""),
    ]
    for url, wt, html, lang in cases:
        rec, _ = _page_record(url, wt, html, lang, sh)
        _assert_equal(em, ctx, omap, rec)
    # every compiled template must have verified, none dead
    live = [t for t in em._templates.values() if t is not None]
    assert live and all(t.verified and not t.dead for t in live)


def test_second_record_same_shape_skips_verify_but_matches():
    omap, ctx, sh = _web_setup()
    em = TripleEmitter(omap, ctx)
    for i in range(5):
        rec, _ = _page_record(
            f"https://s.example.org/{i}", "2025-01-01T00:00:00Z",
            f"<html><body>doc {i} body</body></html>".encode(), "en", sh,
        )
        _assert_equal(em, ctx, omap, rec)
    assert len([t for t in em._templates.values() if t]) == 1


def test_relationship_map_compiles_and_matches():
    omap = {
        "classes": ["URL", "DomainName"],
        "facets": ["URLFacet"],
        "properties": {
            "URL": ["fullValue"],
            "URLFacet": ["host"],
        },
        "relationships": [
            {"type": "resolvesTo", "source": "URL", "target": "DomainName"}
        ],
    }
    ctx = OntologyContext(omap)
    em = TripleEmitter(omap, ctx)
    for i in range(3):
        rec = {"fullValue": f"https://r{i}.example.org", "host": f"r{i}.example.org"}
        _assert_equal(em, ctx, omap, rec)


def test_uncompilable_value_types_fall_back():
    omap, ctx, _ = _web_setup()
    em = TripleEmitter(omap, ctx)
    # bool and list values refuse compilation but must still be correct
    for rec in (
        {"url": "https://x.example.org", "active": True},
        {"url": "https://x.example.org", "tags": ["a", "b"]},
        {"url": "https://x.example.org", "score": 0.5},
    ):
        _assert_equal(em, ctx, omap, rec)
    assert not [t for t in em._templates.values() if t is not None]


def test_value_equal_to_another_fields_value():
    # two fields sharing one value must not cross wires
    omap, ctx, sh = _web_setup()
    em = TripleEmitter(omap, ctx)
    rec, _ = _page_record(
        "https://same.example.org/x", "2025-01-01T00:00:00Z",
        b"<html><body>https://same.example.org/x</body></html>", "en", sh,
    )
    _assert_equal(em, ctx, omap, rec)


def test_dead_template_falls_back_permanently():
    omap, ctx, sh = _web_setup()
    em = TripleEmitter(omap, ctx)
    rec, _ = _page_record(
        "https://f.example.org/1", "2025-01-01T00:00:00Z",
        b"<html><body>b</body></html>", "en", sh,
    )
    # sabotage: compile then corrupt the template before first emit
    shape = em._shape(rec)
    tmpl = em._compile(rec, shape)
    tmpl.rows = tmpl.rows[:-1]  # drop a row -> verify must catch it
    em._templates[shape] = tmpl
    _assert_equal(em, ctx, omap, rec)  # still correct via fallback
    assert tmpl.dead
    _assert_equal(em, ctx, omap, rec)  # and stays correct


def test_field_insertion_order_is_part_of_the_shape():
    """Two records with the SAME key set but different insertion order must
    not share a template: plan_record's field loop is insertion-ordered,
    and when two raw fields alias to one qualified property the LAST one
    wins — ordering changes the emitted object."""
    omap, ctx, _ = _web_setup()
    em = TripleEmitter(omap, ctx)
    # 'hash' and 'content_sha256' both resolve to uco-observable:hash
    a = {"url": "https://o.example.org/1", "hash": "AAA", "content_sha256": "BBB"}
    b = {"url": "https://o.example.org/1", "content_sha256": "BBB", "hash": "AAA"}
    ra = record_to_triples(a, ctx, omap)
    rb = record_to_triples(b, ctx, omap)
    # (precondition: ordering really does change the generic output —
    # if the alias overlap ever disappears from the map, this guard keeps
    # the test honest instead of vacuously passing)
    _, _, ea = em.rows_for(a)
    _, _, eb = em.rows_for(b)
    assert ea == ra
    assert eb == rb
    if ra != rb:
        assert em._shape(a) != em._shape(b)
