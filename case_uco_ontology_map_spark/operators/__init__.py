"""Spark operators: record fan-out, triple emission, dedup, similarity,
text analysis, canonicalization — each a DataFrame→DataFrame transform."""
