from .asof import asof_join  # noqa: F401
from .dedup import (  # noqa: F401
    connected_components,
    dedup_exact,
    minhash_lsh_pairs,
    minhash_signatures,
    shingle_ngrams,
    simhash64,
    simhash_pairs,
)
from .knn import cosine_topk, lsh_ann_topk  # noqa: F401
