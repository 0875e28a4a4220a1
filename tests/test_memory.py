"""Memory/learning surface parity — reference memory.py:1-109 replayed.

Two layers:
  * pure-function goldens — each expected value replayed by hand from the
    reference source (citations inline), so parity holds with no reference
    import;
  * live import-parity — when the reference's dependency stack (langgraph)
    is present, run the actual reference functions side-by-side (the F12
    pattern: skip, documented, when the stack is absent in this container);
  * session threading — service.session_events carries the memory context
    across bounded validation retries (graph.py:37-39,117-143).
"""

import json

import pytest

from case_uco_ontology_map_spark.refmap.memory import (
    MAX_VALIDATION_ATTEMPTS,
    extract_failure_pattern,
    generate_correction_pattern,
    learn_from_validation_result,
    load_memory_from_sessions,
    persist_learned_memory,
    save_memory_to_storage,
    update_memory_context,
    violations_to_feedback,
)


def _reference_memory():
    import importlib
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        return importlib.import_module("memory")
    except ImportError:
        return None
    finally:
        sys.path.remove("/root/reference")


# ---------------------------------------------------------------------------
# pure-function goldens (reference memory.py replayed by hand)
# ---------------------------------------------------------------------------


def test_extract_none_on_empty():
    # memory.py:42-44 — falsy violations (missing or empty) → None
    assert extract_failure_pattern({}) is None
    assert extract_failure_pattern({"violations": []}) is None
    assert extract_failure_pattern({"violations": None}) is None


def test_extract_failure_pattern_golden():
    # memory.py:46-58 — marker-bearing strings contribute the text after
    # the LAST "Message:" (split takes [-1]); others are counted but add
    # no common issue; timestamp defaults to "unknown".
    result = {
        "violations": [
            "Invalid placement. Message: filePath belongs on a Facet.",
            "no marker in this one",
            "outer Message: inner Message: nested wins",
        ],
    }
    assert extract_failure_pattern(result) == {
        "type": "validation_failure",
        "violation_count": 3,
        "common_issues": [
            "filePath belongs on a Facet.",
            "nested wins",
        ],
        "timestamp": "unknown",
    }
    assert (
        extract_failure_pattern({"violations": ["x"], "timestamp": "t0"})[
            "timestamp"
        ]
        == "t0"
    )


def test_correction_pattern_priority_boundary():
    # memory.py:61-67 — "high" iff violation_count > 2
    low = generate_correction_pattern(
        {"common_issues": ["a"], "violation_count": 2}
    )
    high = generate_correction_pattern(
        {"common_issues": ["a", "b"], "violation_count": 3}
    )
    assert low == {
        "strategy": "avoid_common_issues",
        "rules": ["a"],
        "priority": "medium",
    }
    assert high["priority"] == "high"


def test_learn_noop_on_clean_or_patternless():
    # memory.py:23 — clean results learn nothing; memory.py:24-25 — a dirty
    # result with no extractable pattern learns nothing either.
    state = {}
    learn_from_validation_result(state, {"is_clean": True, "violations": ["v"]})
    assert state == {}
    learn_from_validation_result(state, {"is_clean": False, "violations": []})
    assert state == {}


def test_learn_guard_quirk():
    # memory.py:26-29 — the presence check is `"patterns" not in
    # state.get("memory_patterns", {})`: a dict WITH the key is mutated in
    # place (existing entries preserved), anything else is re-initialized.
    dirty = {"is_clean": False, "violations": ["a Message: m1"]}

    reinit = {"memory_patterns": {"not_patterns": 1}}
    learn_from_validation_result(reinit, dirty)
    assert "not_patterns" not in reinit["memory_patterns"]
    assert reinit["memory_patterns"]["patterns"]["validation_failure"][
        "common_issues"
    ] == ["m1"]

    keep = {"memory_patterns": {"patterns": {"prior": {"kept": True}}}}
    learn_from_validation_result(keep, dirty)
    assert keep["memory_patterns"]["patterns"]["prior"] == {"kept": True}
    assert (
        keep["memory_learning"]["learning"]["validation_failure"]["strategy"]
        == "avoid_common_issues"
    )


def test_update_memory_context_reads_persistence_only():
    # memory.py:70-91 renders from memory_persistence (via
    # load_memory_from_sessions) — working keys alone yield the empty
    # message. This indirection is the reference's own design.
    state = {}
    learn_from_validation_result(
        state, {"is_clean": False, "violations": ["x Message: m"]}
    )
    assert update_memory_context(state) == "No previous memory available"

    persist_learned_memory(state)
    assert update_memory_context(state) == (
        "Previous failure patterns:\n"
        "- validation_failure: 1 violations\n"
        "Correction strategies:\n"
        "- validation_failure: avoid_common_issues"
    )


def test_update_memory_context_full_golden():
    # memory.py:74-91 — all three sections, exact rendering.
    state = {}
    save_memory_to_storage(
        state,
        {
            "patterns": {
                "validation_failure": {"violation_count": 4},
                "odd": {},  # missing count renders as 0 (pattern.get)
            },
            "knowledge": {"rule1": "always prune empty facets"},
            "learning": {
                "validation_failure": {"strategy": "avoid_common_issues"},
                "odd": {},  # missing strategy renders as "unknown"
            },
        },
    )
    assert update_memory_context(state) == (
        "Previous failure patterns:\n"
        "- validation_failure: 4 violations\n"
        "- odd: 0 violations\n"
        "Learned rules:\n"
        "- rule1: always prune empty facets\n"
        "Correction strategies:\n"
        "- validation_failure: avoid_common_issues\n"
        "- odd: unknown"
    )
    assert load_memory_from_sessions({}) == {
        "patterns": {},
        "knowledge": {},
        "learning": {},
    }


def test_violations_to_feedback_census_bridge():
    # ours — {rule → count} census → reference-style violation strings;
    # zero counts and advisory *_info rules excluded; deterministic order.
    items = violations_to_feedback(
        {
            "placement": 2,
            "datatype": 0,
            "vocabulary_info": 5,
            "max_count": 1,
        }
    )
    assert items == [
        "Validation rule 'max_count' failed. "
        "Message: max_count reported 1 violation(s).",
        "Validation rule 'placement' failed. "
        "Message: placement reported 2 violation(s).",
    ]
    # round-trip: the extractor finds exactly the post-marker summaries
    pattern = extract_failure_pattern({"violations": items})
    assert pattern["common_issues"] == [
        "max_count reported 1 violation(s).",
        "placement reported 2 violation(s).",
    ]


def test_reference_import_parity():
    """Run the actual reference functions side-by-side when importable
    (needs langgraph via state.py; absent in this container → skip)."""
    ref = _reference_memory()
    if ref is None:
        pytest.skip("reference memory.py needs langgraph (absent here)")
    cases = [
        {},
        {"violations": []},
        {"violations": ["a Message: m1", "plain", "x Message: y Message: z"]},
        {"violations": ["only"], "timestamp": "t1"},
    ]
    for case in cases:
        assert extract_failure_pattern(case) == ref.extract_failure_pattern(
            case
        )
    for count in (1, 2, 3, 5):
        fp = {"common_issues": ["i"] * count, "violation_count": count}
        assert generate_correction_pattern(
            fp
        ) == ref.generate_correction_pattern(fp)
    mine, theirs = {}, {}
    dirty = {"is_clean": False, "violations": ["a Message: m1"]}
    learn_from_validation_result(mine, dirty)
    ref.learn_from_validation_result(theirs, dirty)
    assert mine == theirs
    seeded = {
        "memory_persistence": {
            "patterns": {"p": {"violation_count": 2}},
            "knowledge": {"k": "v"},
            "learning": {"p": {"strategy": "s"}},
        }
    }
    assert update_memory_context(seeded) == ref.update_memory_context(
        dict(seeded)
    )
    assert update_memory_context({}) == ref.update_memory_context({})


# ---------------------------------------------------------------------------
# session threading (service.session_events retry loop)
# ---------------------------------------------------------------------------


def test_session_threads_memory_across_retries(
    spark, mft_payload, tmp_path, monkeypatch
):
    """Force a dirty validation and assert the bounded retry loop
    (config.py:11 MAX_VALIDATION_ATTEMPTS=3): one validation event per
    attempt, a memory event after each non-final failure carrying the
    refreshed context, and the session record persisting it."""
    from case_uco_ontology_map_spark import validation as V
    from case_uco_ontology_map_spark.service import session_events

    monkeypatch.setattr(
        V, "validate_all", lambda *a, **k: {"placement": 3, "ok_info": 1}
    )

    memory = {}
    events = list(
        session_events(
            spark, mft_payload, str(tmp_path / "s1"), memory=memory
        )
    )
    kinds = [e["event"] for e in events]
    assert kinds.count("validation") == MAX_VALIDATION_ATTEMPTS
    assert kinds.count("memory") == MAX_VALIDATION_ATTEMPTS - 1
    # memory events interleave: validation → memory → validation → ...
    assert kinds.index("memory") == kinds.index("validation") + 1

    ctx = [e for e in events if e["event"] == "memory"][-1]["context"]
    assert "Previous failure patterns:" in ctx
    assert "- validation_failure: 1 violations" in ctx
    assert "- validation_failure: avoid_common_issues" in ctx

    complete = events[-1]["session"]
    assert complete["validation_attempts"] == MAX_VALIDATION_ATTEMPTS
    assert complete["memory_context"] == ctx
    with open(tmp_path / "s1" / "session.json") as fh:
        assert json.load(fh)["memory_context"] == ctx

    # the same caller-owned dict seeds the NEXT session's context (the
    # reference's cross-session "simulated persistence", memory.py:9-18)
    assert update_memory_context(memory) == ctx


def test_session_clean_path_untouched(spark, mft_payload, tmp_path):
    """A conformant run keeps the reference event sequence exactly — one
    validation attempt, no memory events, empty context."""
    from case_uco_ontology_map_spark.service import session_events

    events = list(
        session_events(spark, mft_payload, str(tmp_path / "s2"))
    )
    assert [e["event"] for e in events] == [
        "session_start",
        "ingest",
        "ontology",
        "graph",
        "validation",
        "complete",
    ]
    validation = next(e for e in events if e["event"] == "validation")
    assert validation["is_clean"] and validation["attempt"] == 1
    assert events[-1]["session"]["memory_context"] == ""
