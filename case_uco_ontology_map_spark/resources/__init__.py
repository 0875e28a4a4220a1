"""Packaged static resources (compiled ontology dictionary)."""
