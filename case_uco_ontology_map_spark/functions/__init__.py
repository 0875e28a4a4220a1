"""Spark-side functions: Column expressions (JVM, codegen-friendly) and
Arrow-batched pandas UDFs (the only Python in the hot path)."""
