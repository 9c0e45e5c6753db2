from etl_spark.operators.dedupe import (
    choose_dedupe_strategy,
    latest_by_key,
    latest_by_key_salted,
    latest_by_key_window,
)
from etl_spark.operators.multimodal import extract_media_features, synthesize_media
from etl_spark.operators.sessionize import (
    session_stats,
    sessionize_pandas,
    suppress_consecutive_duplicates,
    with_session_id,
)
from etl_spark.operators.similarity import brute_force_topk, ivf_topk, lsh_topk
from etl_spark.operators.textdedup import (
    exact_dedupe,
    fingerprint_dedupe,
    minhash_lsh_pairs,
    minhash_signature,
    minhash_signature_table,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)

__all__ = [
    "latest_by_key",
    "choose_dedupe_strategy",
    "latest_by_key_salted",
    "latest_by_key_window",
    "with_session_id",
    "session_stats",
    "sessionize_pandas",
    "suppress_consecutive_duplicates",
    "exact_dedupe",
    "fingerprint_dedupe",
    "minhash_signature",
    "minhash_signature_table",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_near_pairs",
    "brute_force_topk",
    "lsh_topk",
    "ivf_topk",
    "extract_media_features",
    "synthesize_media",
]
