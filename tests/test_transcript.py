"""F13 fenced-JSON extraction/repair + ST4 bounded retry (refmap/transcript).

Fixture strings mirror the reference's parser contract
(/root/reference/utils.py:57-91, agents/custom_facet.py:39-59).
"""

import json

import pytest

from case_uco_ontology_map_spark.refmap.transcript import (
    MAX_CUSTOM_FACET_ATTEMPTS,
    MAX_GRAPH_GENERATOR_ATTEMPTS,
    MAX_HALLUCINATION_ATTEMPTS,
    MAX_VALIDATION_ATTEMPTS,
    bounded_retry,
    extract_json_payload,
    fenced_json_col,
    parse_ontology_response,
)

GOOD = 'Thinking...\n```json\n{"classes": ["URL"], "facets": []}\n```\ndone'
TWO_BLOCKS = (
    '```json\n{"draft": 1}\n```\nrevised:\n```json\n{"final": 2}\n```'
)
# NOTE reference parity: RE_FENCED_JSON requires the block to END at a
# '}', so content with words after the object ('{"a": 1} and then...')
# matches NO block at all, and the "truncate to last brace" repair can
# never shorten a matched block (it already ends at '}') — the repair
# path's observable outcome is always the formatted error dict. We pin
# that behavior rather than an imagined fix.
TRAILING_GARBAGE = '```json\n{"a": 1} and then some words\n```'
NO_BLOCK = "no json here at all"
COMMENTED = (
    'Here you go:\n```json\n{\n  "name": "X",  // the name\n  "n": 3\n}\n```'
)
BARE_BRACES = 'prefix {"k": "v"} suffix'


def test_parse_last_block_wins():
    assert parse_ontology_response(TWO_BLOCKS) == {"final": 2}


def test_parse_good_block():
    assert parse_ontology_response(GOOD)["classes"] == ["URL"]


def test_parse_trailing_garbage_matches_no_block():
    # words after the object break the fence match entirely (see NOTE)
    assert "error" in parse_ontology_response(TRAILING_GARBAGE)


def test_parse_repair_path_yields_formatted_error():
    # '{"a": 1}}' parses as "Extra data"; repair truncates to the last
    # brace — which IS the end of the block — so the formatted error dict
    # with the content excerpt comes back (utils.py:84-88)
    out = parse_ontology_response('```json\n{"a": 1}}\n```')
    assert out["error"].startswith("Malformed JSON block")
    assert '{"a": 1}}' in out["error"]


def test_parse_error_dicts_never_raise():
    assert "error" in parse_ontology_response(NO_BLOCK)
    assert "error" in parse_ontology_response("```json\n{oops\n```")
    assert "error" in parse_ontology_response("")


def test_extract_payload_strips_line_comments():
    assert extract_json_payload(COMMENTED) == {"name": "X", "n": 3}


def test_extract_payload_outer_braces_without_fence():
    assert extract_json_payload(BARE_BRACES) == {"k": "v"}


def test_extract_payload_raises_without_object():
    with pytest.raises(ValueError):
        extract_json_payload("nothing structured")


def test_fenced_json_col_matches_python(spark):
    rows = [(GOOD,), (TWO_BLOCKS,), (NO_BLOCK,), ("```json\n{bad\n```",)]
    df = spark.createDataFrame(rows, "content string")
    out = df.select(
        fenced_json_col(df.content, "final int").alias("j")
    ).collect()
    # row 1: schema mismatch -> struct of nulls; row 2: final=2;
    # rows 3-4: no/malformed block -> null struct
    assert out[1]["j"]["final"] == 2
    assert out[2]["j"] is None
    assert out[3]["j"] is None


def test_guardrail_constants_match_reference():
    # config.py:9-12
    assert MAX_CUSTOM_FACET_ATTEMPTS == 2
    assert MAX_GRAPH_GENERATOR_ATTEMPTS == 3
    assert MAX_VALIDATION_ATTEMPTS == 3
    assert MAX_HALLUCINATION_ATTEMPTS == 2


def test_bounded_retry_succeeds_midway():
    calls = []

    def flaky(attempt):
        calls.append(attempt)
        if attempt < 1:
            raise json.JSONDecodeError("bad", "", 0)
        return {"ok": attempt}

    result, used, ok = bounded_retry(flaky, MAX_VALIDATION_ATTEMPTS)
    assert ok and used == 2 and result == {"ok": 1}
    assert calls == [0, 1]


def test_bounded_retry_exhaustion_falls_through():
    result, used, ok = bounded_retry(
        lambda attempt: None,
        MAX_CUSTOM_FACET_ATTEMPTS,
        fallback={"customFacets": []},
    )
    assert not ok
    assert used == MAX_CUSTOM_FACET_ATTEMPTS
    assert result == {"customFacets": []}  # proceed degraded, never abort


def test_bounded_retry_predicate():
    result, used, ok = bounded_retry(
        lambda attempt: {"is_clean": attempt == 2},
        MAX_VALIDATION_ATTEMPTS,
        succeeded=lambda r: r["is_clean"],
    )
    assert ok and used == 3 and result["is_clean"]
