"""jvector_spark — a PySpark-native vector analytics engine.

Re-expresses the observable capabilities of datastax/jvector (an embedded
graph-ANN vector search library; see /root/reference) as an idiomatic
Apache Spark engine:

- vector columns (``array<float>``) over DataFrames / Parquet,
- similarity scalar functions with the reference's score normalization
  (reference ``vector/VectorSimilarityFunction.java:37-69``),
- exact top-k / k-NN join / threshold / filtered search,
- PQ / BQ / NVQ lossy compression with two-phase (approximate→rerank) search
  (reference ``quantization/ProductQuantization.java``, ``GraphSearcher.java:471``),
- a partitioned (IVF) index with build / persist / load / merge / delete
  (reference ``graph/GraphIndexBuilder.java``, ``graph/disk/OnDiskGraphIndex.java``),
- streaming ingest via Structured Streaming ``foreachBatch`` segments
  (reference ``docs/tutorials/3-larger-than-memory-tutorial.md``),
- LLM-data-pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding near-dup), text analysis, multimodal columns.

Design: DataFrame/SQL-first, Catalyst-optimized, Arrow-batched pandas UDFs
only where built-in expressions cannot express the semantics.
"""

__version__ = "0.1.0"

from jvector_spark.session import get_spark  # noqa: F401
