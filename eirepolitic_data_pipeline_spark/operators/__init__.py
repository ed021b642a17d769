from .merge import (  # noqa: F401
    WritePolicy,
    merge_for_policy,
    merge_upsert_antijoin,
)
from .dedupe import (  # noqa: F401
    decontaminate,
    dedupe_keep_first,
    dedupe_lines,
    dedupe_keep_last,
    dedupe_total_order,
    dedupe_with_conflicts,
    exact_canonical_ids,
    exact_duplicate_groups,
    jaccard_similar_pairs,
    min_label_components,
    minhash_dedup,
    minhash_dedup_keep,
    minhash_lsh_candidates,
    minhash_signatures,
    pairs_from_postings,
    shingle_postings,
    simhash_band_keys,
    simhash_longs,
    simhash_near_pairs,
    simhash_signatures,
    winnowed_fingerprint_frame,
)
from .temporal import (  # noqa: F401
    current_else_latest,
    interval_overlap_counts,
    point_in_interval_join,
    scope_replace_union,
    temporal_integrity_report,
)
from .ranking import argmax_per_group, dense_rank_in, top_n_per_group  # noqa: F401
from .similarity import (  # noqa: F401
    ann_recall,
    centroid_cells,
    centroid_cells_frame,
    centroid_probe_ranks,
    compact_ivf_pq_index,
    cosine_col,
    hashed_projection_bucket,
    ivf_grid_cells,
    ivf_pq_index_drift,
    ivf_probe_cells,
    knn_bruteforce,
    knn_bruteforce_pandas,
    knn_ivf_adc,
    knn_ivf_adc_residual,
    knn_ivf_pq,
    knn_ivf_pq_index,
    knn_lsh,
    knn_pq_adc,
    knn_quantized_rerank,
    refresh_ivf_pq_index,
    semantic_dedup,
    sign_lsh_bucket,
    write_ivf_pq_index,
)
from .relevance import bigram_lm_bits, bm25_scores  # noqa: F401
from .vectors import (  # noqa: F401
    diversity_sample,
    ivf_pq_encode,
    ivf_pq_fit,
    ivf_pq_fit_residual,
    kmeans_assign,
    kmeans_fit,
    pq_codes,
    pq_decode,
    pq_encode,
    pq_fit,
    quantize_int8,
    semdedup,
)
from .sketches import hll_estimate, hll_merge, hll_rollup  # noqa: F401
from .incremental import incremental_additive, recompute_groups  # noqa: F401
from .skew import salted_agg, salted_string_agg, salted_top_n  # noqa: F401
from .profiling import (  # noqa: F401
    ngram_counts,
    ngram_heavy_hitters,
    source_overlap,
)
from .curation import (  # noqa: F401
    curate_corpus,
    curate_corpus_stages,
    dataset_split,
    domain_stats,
    filter_domains,
    hash_bucket,
    hash_sample,
    mix_sources,
    pack_sequences,
    resample_periodic,
    split_column,
    stratified_sample,
)
