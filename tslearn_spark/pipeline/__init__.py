"""Large-scale training-data pipeline operators.

Built on the same engine primitives as the time-series layer: hash
aggregates for exact dedup, inverted-index token joins for n-gram
Jaccard (never an n^2 crossJoin), MinHash/SimHash banding for LSH,
brute-force + LSH-bucketed cosine top-k for embeddings.

Every operator is DataFrame-declarative so Catalyst pushes filters into
the parquet scans and AQE handles skew (hot tokens are the classic skew
source; the token-frequency cap below is the salting-free fix).
"""

from tslearn_spark.pipeline.dedup import (
    canonicalize,
    connected_components,
    embedding_neardup_pairs,
    exact_duplicates,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from tslearn_spark.pipeline.text import (
    language_id,
    quality_scores,
    token_counts,
    document_fingerprints,
)
from tslearn_spark.pipeline.multimodal import (
    build_mp4,
    build_webm,
    extract_features,
    extract_metadata,
    frame_sample,
    parse_media_metadata,
    parse_mp4_metadata,
    parse_webm_metadata,
)
from tslearn_spark.pipeline.simsearch import (
    assign_ivf_lists,
    auto_ivf_params,
    auto_lsh_bits,
    brute_force_topk,
    ivf_topk,
    lsh_topk,
    multiprobe_buckets_udf,
    train_ivf_centroids,
)

__all__ = [
    "canonicalize",
    "connected_components",
    "embedding_neardup_pairs",
    "exact_duplicates",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "language_id",
    "quality_scores",
    "token_counts",
    "document_fingerprints",
    "assign_ivf_lists",
    "brute_force_topk",
    "ivf_topk",
    "auto_ivf_params",
    "auto_lsh_bits",
    "lsh_topk",
    "multiprobe_buckets_udf",
    "train_ivf_centroids",
    "build_mp4",
    "build_webm",
    "extract_features",
    "extract_metadata",
    "frame_sample",
    "parse_media_metadata",
    "parse_mp4_metadata",
    "parse_webm_metadata",
]
