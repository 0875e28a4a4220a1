"""F13 + ST4 — LLM-transcript replay helpers: fenced-JSON extraction /
repair and bounded retry guardrails.

The reference drives an LLM per session and must therefore (a) fish JSON
payloads out of free-text model responses and (b) bound how often a stage
may fail before the supervisor falls through to the next step. The Spark
engine's deterministic path never produces malformed payloads, so these
exist for *parity replay* of saved reference transcripts and for callers
who plug an LLM stage back in:

  * ``parse_ontology_response`` — the synthesis-stage parser: LAST fenced
    ```json block, parse, on failure truncate to the last ``}`` and retry
    (/root/reference/utils.py:57-91).
  * ``extract_json_payload`` — the custom-facet parser: first fenced block
    (else whole text), trim to the outermost ``{...}``, strip ``//`` line
    comments, parse (/root/reference/agents/custom_facet.py:39-59).
  * ``fenced_json_col`` — JVM Column twin for bulk transcript tables:
    regexp_extract of the last fenced block + ``from_json`` (SURVEY §2.7
    F13 note), so replaying a million-row transcript table never leaves
    the JVM.
  * ``bounded_retry`` + ``MAX_*_ATTEMPTS`` — ST4: the supervisor's
    attempt counters (/root/reference/config.py:9-12). Semantics match
    the router (/root/reference/graph.py:73-99): at most N attempts, a
    predicate decides success, exhaustion returns the fallback and
    proceeds (the reference "falls through" rather than aborting the
    session — graph_generator.py:230-250).
"""

from __future__ import annotations

import json
import re
from typing import Any, Callable, Dict, Optional, Tuple, TypeVar

# Guardrails (reference config.py:9-12)
MAX_CUSTOM_FACET_ATTEMPTS = 2
MAX_GRAPH_GENERATOR_ATTEMPTS = 3
MAX_VALIDATION_ATTEMPTS = 3
MAX_HALLUCINATION_ATTEMPTS = 2

# reference utils.py:57 — last fenced {..} block, ```json or bare ```
RE_FENCED_JSON = re.compile(r"```(?:json)?\s*(\{.*?\})\s*```", re.DOTALL)
# reference custom_facet.py — first fence (any tag), then brace trim
_CODE_FENCE = re.compile(r"```(?:json)?\s*(.*?)```", re.DOTALL)
_LINE_COMMENT = re.compile(r"//[^\n]*")


def parse_ontology_response(content: str) -> Dict[str, Any]:
    """LAST fenced JSON block → dict; truncate-to-last-``}`` repair on
    malformed payloads; error dict (never raise) on the floor cases —
    byte-parity with reference utils.py:60-91."""
    matches = RE_FENCED_JSON.findall(content or "")
    if not matches:
        return {"error": "No JSON block found in the agent response."}
    block = matches[-1]
    try:
        return json.loads(block)
    except json.JSONDecodeError as e:
        # repair: truncate to the last '}' (utils.py:75-86); when no brace
        # exists the original error flows to the same formatted error dict
        final_e: json.JSONDecodeError = e
        last = block.rfind("}")
        if last != -1:
            try:
                return json.loads(block[: last + 1])
            except json.JSONDecodeError as repaired_e:
                final_e = repaired_e
        return {
            "error": "Malformed JSON block found in agent response: "
            f"{final_e}. Content: '{block[:200]}...'"
        }


def extract_json_payload(text: str) -> Dict[str, Any]:
    """First fenced block (else whole text) → outermost braces → strip
    ``//`` comments → parse. Raises ValueError when no object is present
    (parity: custom_facet.py:39-59 raises into its retry loop)."""
    match = _CODE_FENCE.search(text or "")
    candidate = (match.group(1) if match else (text or "")).strip()
    start, end = candidate.find("{"), candidate.rfind("}")
    if start == -1 or end == -1:
        raise ValueError("No JSON object detected in custom facet response")
    candidate = candidate[start : end + 1]
    cleaned = "\n".join(
        _LINE_COMMENT.sub("", line) for line in candidate.splitlines()
    )
    return json.loads(cleaned)


def fenced_json_col(col, schema: str):
    """Column twin: LAST fenced JSON block of ``col`` parsed as ``schema``.

    ``regexp_extract_all`` + ``element_at(-1)`` + ``from_json`` — stays in
    whole-stage codegen for bulk transcript replay; rows with no block or
    malformed JSON yield null (filter with ``isNotNull`` for the error
    census the reference prints per session)."""
    from pyspark.sql import functions as F

    blocks = F.regexp_extract_all(
        col, F.lit(r"```(?:json)?\s*(\{[\s\S]*?\})\s*```"), 1
    )
    # try_element_at: rows with zero fenced blocks yield null, not an error
    last = F.try_element_at(blocks, F.lit(-1))
    return F.from_json(last, schema)


T = TypeVar("T")


def bounded_retry(
    fn: Callable[[int], T],
    max_attempts: int,
    succeeded: Optional[Callable[[T], bool]] = None,
    fallback: Optional[T] = None,
) -> Tuple[Optional[T], int, bool]:
    """ST4: run ``fn(attempt)`` up to ``max_attempts`` times; a result
    passing ``succeeded`` (default: not None) returns immediately.

    Returns ``(result, attempts_used, ok)``. Exhaustion returns
    ``(fallback, max_attempts, False)`` — the supervisor's fall-through
    (graph.py:74-82): the session proceeds with a degraded artifact rather
    than aborting, and the caller records the failure. Exceptions from
    ``fn`` count as failed attempts (the reference's parse errors route
    back through the supervisor the same way)."""
    ok = succeeded or (lambda r: r is not None)
    for attempt in range(max_attempts):
        try:
            result = fn(attempt)
        except Exception:
            if attempt == max_attempts - 1:
                break
            continue
        if ok(result):
            return result, attempt + 1, True
    return fallback, max_attempts, False
