"""Relational & vector operators (SURVEY.md SS2)."""

from .knn import (  # noqa: F401
    build_ivf_index,
    delete_from_ivf_index,
    exact_knn,
    exact_knn_fast,
    ivf_cell_stats,
    ivf_knn,
    ivf_knn_join,
    ivf_knn_join_persisted,
    ivf_knn_persisted,
    load_centroid_bank,
    self_knn,
    suggest_overfetch,
    upsert_ivf_index,
)
from .evaluate import (  # noqa: F401
    detailed_results,
    ir_metrics,
    query_stats,
)
from .corpus import (  # noqa: F401
    build_clone_map,
    build_corpus,
    extract_snippets,
)
from .relational import (  # noqa: F401
    as_of_join,
    heavy_hitters,
    latest_per_key,
    mixture_sample,
    temperature_sample,
    ngram_contamination,
    salted_key_counts,
    snapshot_diff,
    stratified_sample_deterministic,
)
from .sketch import (  # noqa: F401
    bloom_build,
    bloom_probe,
    count_min_build,
    count_min_estimate,
    hll_build,
    hll_estimate,
    hll_merge,
    vhist_build,
    vhist_merge,
    vhist_quantiles,
    kmv_build,
    kmv_estimate,
    kmv_merge,
)
from .export import (  # noqa: F401
    export_shards,
    leakage_safe_split,
    pack_sequences,
    shard_assignment,
    shard_stats,
    split_assignment,
)
from .layout import (  # noqa: F401
    file_pruning_stats,
    interleave_bits,
    scale_to_bits,
    write_zordered,
    zorder_key,
)
from .retrieval import (  # noqa: F401
    bm25_index,
    bm25_topk,
    rrf_fuse,
)
from .classify import (  # noqa: F401
    doc_features,
    linear_filter_scores,
    planted_corpus,
    train_linear_filter,
)
from .cleanse import (  # noqa: F401
    boilerplate_lines,
    line_document_frequency,
    remove_boilerplate_lines,
)
from .lm import (  # noqa: F401
    bigram_lm_scores,
    dsir_select,
    dsir_weights,
    kn_lm_scores,
    perplexity_buckets,
    train_bigram_lm,
    train_kn_bigram_lm,
)
from .bpe import (  # noqa: F401
    SEP as BPE_SEP,
    apply_bpe,
    apply_bpe_expr,
    bpe_vocab,
    train_bpe,
    word_histogram,
)
from .dimred import (  # noqa: F401
    build_pca_ivf_index,
    load_pca_model,
    pca_ivf_knn,
    pca_ivf_knn_persisted,
    pca_knn,
    pca_project,
    train_pca,
)
from .pq import (  # noqa: F401
    build_pq_index,
    load_pq_codebooks,
    pq_adc_topk,
    pq_adc_topk_expr,
    pq_assign,
    pq_knn,
    pq_knn_persisted,
    train_pq_codebooks,
)
from .cluster import (  # noqa: F401
    kmeans_bank,
    kmeans_lloyd,
)
from .dedup import (  # noqa: F401
    asym_containment_pairs,
    bottomk_sketch_postings,
    bucket_stats,
    cluster_top_terms,
    containment_candidates,
    containment_pairs,
    persist_bounded,
    duplicate_groups,
    elect_canonical,
    tfidf_cosine_pairs,
    tfidf_pairs_from_postings,
    tfidf_postings,
    embedding_near_duplicates,
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_bands,
    minhash_signatures,
    ngram_jaccard_pairs,
    novelty_scores,
    semantic_contamination,
    semantic_duplicates,
    simhash,
    simhash_chunks,
    simhash_near_pairs,
    srp_bands,
    srp_candidate_pairs,
    srp_near_duplicates,
    strip_duplicate_runs,
    strip_until_clean,
    substring_duplicate_runs,
)
