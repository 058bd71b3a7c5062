"""Model zoo exports (parity: ``/root/reference/genrec/models/__init__.py:95-110``)."""

from .rqvae import (QuantizeDistance, QuantizeForwardMode, Quantize, RqVae,
                    kmeans_init_params)
from .sasrec import SASRec, predict_topk
from .hstu import HSTU
from .tiger import Tiger, build_trie, make_generate_fn
from .cobra import Cobra, beam_fusion
from .llm import CausalLM, resize_token_embeddings
from .lcrec import LCRec, WordTokenizer
from .notellm import Query2Embedding

__all__ = [
    "QuantizeDistance", "QuantizeForwardMode", "Quantize", "RqVae",
    "kmeans_init_params", "SASRec", "predict_topk", "HSTU", "Tiger",
    "build_trie", "make_generate_fn", "Cobra", "beam_fusion", "CausalLM",
    "resize_token_embeddings", "LCRec", "WordTokenizer", "Query2Embedding",
]
