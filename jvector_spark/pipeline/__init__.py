"""Training-data pipeline operators (beyond reference parity).

Large-scale LLM-data-pipeline operations over the ``documents`` /
``embeddings`` tables: deduplication (exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding near-dup), text analysis (language ID,
quality scoring, token counting, fingerprinting).

Everything here is built from JVM-side Catalyst expressions (higher-order
functions, built-in hashes) — no Python UDFs — so the hot path stays in
whole-stage codegen and scales with partitioning alone. Each operator has
an adjacent DuckDB oracle-SQL builder that replicates the same math for
the correctness gate.
"""
