from .ops import (  # noqa: F401
    ann_topk,
    dim_topk,
    embedding_near_dup,
    ivf_ann_topk,
)
