from etl_spark.functions.content import (
    content_sha256,
    content_sha256_pandas,
    doc_fingerprint,
    lang_id_heuristic,
    normalize_lang,
    quality_score,
    token_count,
)
from etl_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "content_sha256",
    "content_sha256_pandas",
    "normalize_lang",
    "token_count",
    "lang_id_heuristic",
    "quality_score",
    "doc_fingerprint",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
