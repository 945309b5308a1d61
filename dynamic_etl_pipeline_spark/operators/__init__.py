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
from .knn import cosine_topk, ivf_ann_topk, lsh_ann_topk  # noqa: F401
from .merge import merge_upsert, scd2_apply  # noqa: F401
from .skew import salted_agg, salted_join  # noqa: F401
from .bucketing import bucketed_join, write_bucketed  # noqa: F401
