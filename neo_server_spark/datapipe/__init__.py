"""Large-scale training-data pipeline operators (BASELINE north star).

Beyond the reference's own surface: deduplication (exact/MinHash-LSH/SimHash/
n-gram Jaccard/embedding), similarity search (brute-force + LSH-bucketed ANN),
text analysis (lang-id, quality, tokens, fingerprints), multimodal binary
columns.  Every operator is designed against the 100 TB layout: narrow
projections, hash-partitioned shuffles on bounded keys, broadcast for small
sides, no driver-side loops.
"""

from neo_server_spark.datapipe import dedup, sampling, similarity, text, multimodal  # noqa: F401
