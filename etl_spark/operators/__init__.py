from etl_spark.operators.cover import (
    cover_table,
    hierarchical_cover_udf,
    naive_cover_table,
)
from etl_spark.operators.dedupe import (
    choose_dedupe_strategy,
    latest_by_key,
    latest_by_key_salted,
    latest_by_key_window,
)
from etl_spark.operators.multimodal import (
    extract_media_features,
    frame_sample,
    resize_media,
    synthesize_media,
)
from etl_spark.operators.sessionize import (
    session_stats,
    sessionize_pandas,
    suppress_consecutive_duplicates,
    with_session_id,
)
from etl_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_topk,
)
from etl_spark.operators.textdedup import (
    exact_dedupe,
    fingerprint_dedupe,
    minhash_lsh_pairs,
    minhash_signature,
    minhash_signature_table,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    winnowing_fingerprints,
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
    "winnowing_fingerprints",
    "embedding_near_dup_pairs",
    "cover_table",
    "hierarchical_cover_udf",
    "naive_cover_table",
    "extract_media_features",
    "resize_media",
    "frame_sample",
    "synthesize_media",
]
