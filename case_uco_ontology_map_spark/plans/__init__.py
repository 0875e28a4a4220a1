"""Logical plans: end-to-end pipelines composed from operators."""
