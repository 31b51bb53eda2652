"""ecommerce_lakehouse_spark — a from-scratch PySpark-native lakehouse
table-maintenance and incremental-processing engine.

Re-expresses the capabilities of the reference medallion lakehouse
(nahilahmed/ecommerce-lakehouse) as an idiomatic Spark-first engine over an
Iceberg-style copy-on-write table format:

- ``table``       : snapshot/manifest/stats table format ("icehouse")
- ``operators``   : MERGE INTO (SCD1/SCD2/fact/partial), sessionization,
                    SCD2 change capture, affected-key re-aggregation
- ``maintenance`` : bin-packing compaction, Z-order/Hilbert clustering,
                    manifest rewrite, snapshot expiry, resumable ledger
- ``functions``   : vectorized kernels (Morton/Hilbert), text analysis,
                    dedup (exact/MinHash-LSH/SimHash/Jaccard/cosine),
                    similarity search, multimodal column plumbing
- ``sources``     : batch/stream ingestion with audit columns & dead-letter
- ``datagen``     : deterministic Common-Crawl-style pages generator

Design scale target: 10^12 documents on a multi-executor cluster; tests run
on local mode at small synthetic scale.
"""

__version__ = "0.1.0"
