from fresco_hpc_spark.functions.text import (  # noqa: F401
    document_fingerprint,
    language_id,
    text_stats,
    token_count,
)
from fresco_hpc_spark.functions.dedup import (  # noqa: F401
    exact_dedup,
    minhash_dup_pairs,
    ngram_jaccard_pairs,
    simhash_dup_pairs,
)
from fresco_hpc_spark.functions.vectors import (  # noqa: F401
    brute_force_knn,
    cosine_similarity_col,
    lsh_ann_topk,
)
