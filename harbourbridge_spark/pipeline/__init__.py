"""Large-scale training-data pipeline operators (SURVEY §7.2 M8).

Beyond the reference's migration surface, these are the operations a
100 TB training-data pipeline needs, each designed Spark-first and
oracle-checkable:

- ``hashing``     engine-portable deterministic hashes (same value in
                  Spark SQL and DuckDB SQL — the correctness-gate trick)
- ``text``        tokenization, language-ID heuristic, quality scoring,
                  document fingerprinting
- ``dedup``       exact, MinHash-LSH, SimHash, n-gram Jaccard,
                  embedding-cosine near-duplicate detection
- ``similarity``  brute-force cosine top-k + LSH-bucketed ANN
- ``multimodal``  binary media columns: schema, partitioning, and
                  Arrow-batched decode plumbing (decode stubbed)
"""
