from .losses import (categorical_reconstruction_loss, quantize_loss,
                     reconstruction_loss)
from .gumbel import gumbel_softmax_sample, sample_gumbel
from .kmeans import kmeans
from .sinkhorn import sinkhorn_knopp
from .normalize import l2norm
from .metrics import TopKAccumulator, topk_match_ranks, topk_metric_sums

__all__ = [
    "categorical_reconstruction_loss", "quantize_loss", "reconstruction_loss",
    "gumbel_softmax_sample", "sample_gumbel", "kmeans", "sinkhorn_knopp",
    "l2norm", "TopKAccumulator", "topk_match_ranks", "topk_metric_sums",
]
