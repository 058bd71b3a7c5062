from .losses import (categorical_reconstruction_loss, quantize_loss,
                     reconstruction_loss)
from .gumbel import gumbel_softmax_sample, sample_gumbel
from .kmeans import kmeans
from .sinkhorn import sinkhorn_knopp
from .normalize import l2norm
from .metrics import TopKAccumulator, topk_match_ranks, topk_metric_sums
from .topk import full_topk, sharded_topk
from .debug import compute_debug_metrics, select_columns_per_row

__all__ = [
    "categorical_reconstruction_loss", "quantize_loss", "reconstruction_loss",
    "gumbel_softmax_sample", "sample_gumbel", "kmeans", "sinkhorn_knopp",
    "l2norm", "TopKAccumulator", "topk_match_ranks", "topk_metric_sums",
    "full_topk", "sharded_topk", "compute_debug_metrics",
    "select_columns_per_row",
]
