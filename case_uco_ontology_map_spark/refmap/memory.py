"""Validation-failure learning surface — the reference's "memory
architecture" (memory.py:1-109) re-expressed as pure functions over a plain
session-state dict (no LangGraph State dependency).

Semantics are byte-for-byte the reference's:

- ``load_memory_from_sessions`` / ``save_memory_to_storage`` ≙
  memory.py:9-18 ("simulated" persistence: a ``memory_persistence`` key on
  the state dict).
- ``learn_from_validation_result`` ≙ memory.py:21-37 — on a non-clean
  validation result, extract a failure pattern, store it under
  ``state["memory_patterns"]["patterns"][type]``, derive a correction
  strategy into ``state["memory_learning"]["learning"][type]``.
- ``extract_failure_pattern`` ≙ memory.py:40-58 — violation strings are
  scanned for a ``"Message:"`` marker; the text after the LAST marker is
  the common-issue summary (``split("Message:")[-1].strip()``).
- ``generate_correction_pattern`` ≙ memory.py:61-67 — priority "high"
  iff violation_count > 2, else "medium".
- ``update_memory_context`` ≙ memory.py:70-91 — renders patterns /
  knowledge / learning sections from the PERSISTED memory
  (``memory_persistence``), not the working ``memory_patterns`` /
  ``memory_learning`` keys. That indirection is the reference's own
  design: learning lands in working keys and only becomes visible to the
  context after an explicit ``save_memory_to_storage``. The session runner
  (service.session_events) performs that save after each learn step so the
  context actually threads across validation retries — see
  ``persist_learned_memory``.

The reference wires ``update_memory_context`` into every supervisor
routing step (graph.py:24,37-39; agents/supervisor.py:8); our batch
equivalent threads it through the bounded validation-retry loop in
``service.session_events`` (config.py:11 MAX_VALIDATION_ATTEMPTS = 3).
"""

from typing import Any, Dict, List, Optional

# memory.py:12 — the default (empty) memory shape.
EMPTY_MEMORY: Dict[str, Any] = {"patterns": {}, "knowledge": {}, "learning": {}}

#: config.py:11 — bound on the validation retry loop the memory context
#: threads through (graph.py:129-131 terminates at this count).
MAX_VALIDATION_ATTEMPTS = 3


def load_memory_from_sessions(state: Dict[str, Any]) -> Dict[str, Any]:
    """memory.py:9-13 — read persisted memory off the state, defaulting to
    the empty three-section shape."""
    return state.get(
        "memory_persistence",
        {"patterns": {}, "knowledge": {}, "learning": {}},
    )


def save_memory_to_storage(
    state: Dict[str, Any], memory_data: Dict[str, Any]
) -> None:
    """memory.py:16-18 — persist memory onto the state dict."""
    state["memory_persistence"] = memory_data


def extract_failure_pattern(
    validation_result: Dict[str, Any],
) -> Optional[Dict[str, Any]]:
    """memory.py:40-58 — summarize a failed validation into a pattern dict.

    Returns None when there are no violations (empty list or missing key —
    the reference's falsy check). Each violation string containing
    ``"Message:"`` contributes the text after its last marker.
    """
    violations = validation_result.get("violations")
    if not violations:
        return None

    pattern: Dict[str, Any] = {
        "type": "validation_failure",
        "violation_count": len(violations),
        "common_issues": [],
        "timestamp": validation_result.get("timestamp", "unknown"),
    }

    for violation in violations:
        if "Message:" in violation:
            issue = violation.split("Message:")[-1].strip()
            pattern["common_issues"].append(issue)

    return pattern


def generate_correction_pattern(
    failure_pattern: Dict[str, Any],
) -> Dict[str, Any]:
    """memory.py:61-67 — strategy derived from a failure pattern; priority
    escalates past 2 violations."""
    return {
        "strategy": "avoid_common_issues",
        "rules": failure_pattern["common_issues"],
        "priority": "high" if failure_pattern["violation_count"] > 2 else "medium",
    }


def learn_from_validation_result(
    state: Dict[str, Any], validation_result: Dict[str, Any]
) -> None:
    """memory.py:21-37 — on a dirty result, record the failure pattern and
    its correction strategy in the working memory keys.

    Faithfully reproduces the reference's guard quirk: the presence check
    is against ``state.get("memory_patterns", {})`` — so an existing
    ``memory_patterns`` dict that already has a ``"patterns"`` key is kept
    (and mutated in place), anything else is re-initialized.
    """
    if not validation_result.get("is_clean", False):
        failure_pattern = extract_failure_pattern(validation_result)
        if failure_pattern:
            if "patterns" not in state.get("memory_patterns", {}):
                state["memory_patterns"] = {"patterns": {}}
            state["memory_patterns"]["patterns"][
                failure_pattern["type"]
            ] = failure_pattern

            correction_strategy = generate_correction_pattern(failure_pattern)
            if correction_strategy:
                if "learning" not in state.get("memory_learning", {}):
                    state["memory_learning"] = {"learning": {}}
                state["memory_learning"]["learning"][
                    failure_pattern["type"]
                ] = correction_strategy


def update_memory_context(state: Dict[str, Any]) -> str:
    """memory.py:70-91 — render the persisted memory as the context string
    the supervisor threads into each routing step."""
    memory_data = load_memory_from_sessions(state)
    context_parts: List[str] = []

    if memory_data.get("patterns"):
        context_parts.append("Previous failure patterns:")
        for pattern_type, pattern in memory_data["patterns"].items():
            context_parts.append(
                f"- {pattern_type}: {pattern.get('violation_count', 0)} violations"
            )

    if memory_data.get("knowledge"):
        context_parts.append("Learned rules:")
        for rule_type, rule in memory_data["knowledge"].items():
            context_parts.append(f"- {rule_type}: {rule}")

    if memory_data.get("learning"):
        context_parts.append("Correction strategies:")
        for strategy_type, strategy in memory_data["learning"].items():
            context_parts.append(
                f"- {strategy_type}: {strategy.get('strategy', 'unknown')}"
            )

    return "\n".join(context_parts) if context_parts else "No previous memory available"


def persist_learned_memory(state: Dict[str, Any]) -> None:
    """Bridge the reference's working-keys → persisted-memory gap (ours).

    ``learn_from_validation_result`` writes to ``memory_patterns`` /
    ``memory_learning`` while ``update_memory_context`` reads only
    ``memory_persistence`` — in the reference nothing connects the two, so
    the context stays "No previous memory available" even after learning.
    The session runner calls this after each learn step so retries actually
    see the accumulated patterns. Knowledge is merged, not replaced, so
    externally-seeded rules survive.
    """
    memory = load_memory_from_sessions(state)
    merged = {
        "patterns": {
            **memory.get("patterns", {}),
            **state.get("memory_patterns", {}).get("patterns", {}),
        },
        "knowledge": dict(memory.get("knowledge", {})),
        "learning": {
            **memory.get("learning", {}),
            **state.get("memory_learning", {}).get("learning", {}),
        },
    }
    save_memory_to_storage(state, merged)


def violations_to_feedback(violations: Dict[str, int]) -> List[str]:
    """Render our validation layer's ``{rule → count}`` census as the
    reference validator's violation-string list (validator.py:40-94 builds
    ``feedback_items`` strings; the memory extractor keys on a
    ``"Message:"`` marker inside each, memory.py:52-55).

    One string per rule with a non-zero count, deterministic order
    (sorted by rule name). ``*_info`` rules are advisory (sh:Info severity,
    validation.is_conformant ignores them) and are excluded — they never
    made the result dirty, so they must not seed failure patterns.
    """
    items: List[str] = []
    for rule in sorted(violations):
        count = violations[rule]
        if count and not rule.endswith("_info"):
            items.append(
                f"Validation rule '{rule}' failed. "
                f"Message: {rule} reported {count} violation(s)."
            )
    return items
