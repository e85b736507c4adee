from .cdc import DATA_TYPES, derive_changes, filter_data
from .dedup import (
    exact_dedup,
    minhash_bands,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_bands_df,
    simhash_col,
    simhash_df,
    simhash_pairs,
)
from .graph import connected_components
from .lineage import checkpoint_scope, persistent_rdd_ids, unpersist_rdds
from .merge import apply_changes, merge_upsert
from .multimodal import (
    audio_window_plan,
    frame_sample_plan,
    image_features,
    synthesize_media_table,
)
from .partitioning import calculate_num_partitions, get_partition_count, size_output
from .similarity import (
    brute_force_topk,
    ivf_assignments,
    ivf_query_cells,
    ivf_topk,
    lsh_bucket_col,
    lsh_buckets_df,
    lsh_multi_topk,
    lsh_table_buckets_df,
    lsh_topk,
)
from .skew import salted, salted_agg, salted_join
from .text import (
    fingerprint_col,
    lang_id_col,
    quality_score_col,
    shingles_col,
    split_bucket_col,
    token_count_col,
    tokens_col,
    word_count_col,
)
from .void_scrub import drop_void_fields

__all__ = [
    "DATA_TYPES", "derive_changes", "filter_data",
    "exact_dedup", "minhash_bands", "minhash_lsh_pairs", "minhash_signatures",
    "ngram_jaccard_pairs", "simhash_bands_df", "simhash_col", "simhash_df",
    "simhash_pairs",
    "connected_components",
    "checkpoint_scope", "persistent_rdd_ids", "unpersist_rdds",
    "apply_changes", "merge_upsert",
    "audio_window_plan", "frame_sample_plan", "image_features",
    "synthesize_media_table",
    "calculate_num_partitions", "get_partition_count", "size_output",
    "brute_force_topk", "ivf_assignments", "ivf_query_cells", "ivf_topk",
    "lsh_bucket_col", "lsh_buckets_df", "lsh_multi_topk",
    "lsh_table_buckets_df", "lsh_topk",
    "salted", "salted_agg", "salted_join",
    "fingerprint_col", "lang_id_col", "quality_score_col", "shingles_col",
    "split_bucket_col", "token_count_col", "tokens_col", "word_count_col",
    "drop_void_fields",
]
