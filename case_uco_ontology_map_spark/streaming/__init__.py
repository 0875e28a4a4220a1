"""Incremental semantics: checkpoint manifests, exact resume, lineage."""
