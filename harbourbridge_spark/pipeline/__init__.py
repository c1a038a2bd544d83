"""Large-scale training-data pipeline operators (SURVEY §7.2 M8).

Beyond the reference's migration surface, these are the operations a
100 TB training-data pipeline needs, each designed Spark-first and
oracle-checkable:

- ``hashing``     engine-portable deterministic hashes (same value in
                  Spark SQL and DuckDB SQL — the correctness-gate trick)
- ``text``        tokenization, language-ID heuristic, quality scoring,
                  document fingerprinting, chunking, PII redaction,
                  surprisal, boilerplate detection
- ``curation``    benchmark decontamination, stratified quota
                  sampling, token-budget sequence packing
- ``dedup``       exact, MinHash-LSH (SQL + vectorized-kernel paths),
                  SimHash, n-gram Jaccard, embedding-cosine
                  near-duplicate detection, connected-component
                  clustering, removal manifests
- ``similarity``  brute-force cosine top-k + LSH-bucketed + IVF ANN
- ``multimodal``  binary media columns: schema, size-aware
                  partitioning, Arrow-batched decode with REAL
                  dependency-free codecs (WAV/BMP/PPM/PNG/Y4M),
                  nearest-neighbor resize, per-frame fan-out
"""
