"""PII scrubbing for training corpora: redact emails / IPv4s / phone
numbers with typed placeholders and per-document counts — the standard
pre-training compliance pass (no reference counterpart; part of the
large-scale training-data operator family).

Pure JVM ``regexp_replace`` / ``regexp_count`` expressions — zero Python,
zero shuffle, whole-stage codegen, linear per row. Patterns are written in
the Java-regex ∩ RE2 portable subset (no lookaround, no backrefs) so the
DuckDB contract oracle replays them verbatim.

Phone matching requires a leading ``+`` (international form) — bare local
numbers are indistinguishable from ids/quantities at corpus scale and
would mass-false-positive; callers needing looser rules pass their own
patterns.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# name -> (pattern, replacement); applied in insertion order on the
# progressively scrubbed text (emails first: their local parts may contain
# digit runs the later patterns would chew on). Counts are measured on the
# ORIGINAL text.
PII_PATTERNS: Dict[str, Tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ip": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "phone": (r"\+\d[\d\- ]{6,}\d", "<PHONE>"),
}


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    patterns: Optional[Dict[str, Tuple[str, str]]] = None,
) -> DataFrame:
    """Replace ``text_col`` with its scrubbed form and append one
    ``n_<name>`` count column per pattern (counts over the original
    text)."""
    pats = patterns or PII_PATTERNS
    scrubbed = F.col(text_col)
    for pattern, repl in pats.values():
        scrubbed = F.regexp_replace(scrubbed, pattern, repl)
    return df.select(
        *[c for c in df.columns if c != text_col],
        scrubbed.alias(text_col),
        *[
            F.regexp_count(F.col(text_col), F.lit(pattern))
            .cast("long")  # BIGINT like every count surface (oracle parity)
            .alias(f"n_{name}")
            for name, (pattern, _) in pats.items()
        ],
    )
