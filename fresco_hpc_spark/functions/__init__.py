from fresco_hpc_spark.functions.text import (  # noqa: F401
    chunk_documents,
    document_fingerprint,
    language_id,
    ngram_decontaminate,
    quality_rules,
    redact_pii,
    repetition_stats,
    rolling_fingerprint,
    text_stats,
    tf_idf_top_terms,
    token_count,
    token_counts,
    unigram_logprob_score,
    vocab_stats,
)
from fresco_hpc_spark.functions.sampling import (  # noqa: F401
    corpus_split,
    hash_fraction,
    hash_sample,
    stratified_hash_sample,
    temperature_mixture_sample,
    token_budget_sample,
)
from fresco_hpc_spark.functions.dedup import (  # noqa: F401
    dedup_corpus,
    dup_clusters,
    exact_dedup,
    minhash_band_index,
    minhash_dup_pairs,
    minhash_dup_pairs_between,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_prefix,
    simhash_dup_pairs,
)
from fresco_hpc_spark.functions.multimodal import (  # noqa: F401
    decode_image_features,
    describe_frames,
    extract_audio_features,
    resize_images,
    sample_frames,
    synthetic_media,
)
from fresco_hpc_spark.functions.vectors import (  # noqa: F401
    brute_force_knn,
    class_centroids,
    cosine_similarity_col,
    embedding_near_dup_pairs,
    ivf_ann_topk,
    ivf_assign,
    ivf_train_centroids,
    lsh_ann_topk,
    semantic_dedup,
)
