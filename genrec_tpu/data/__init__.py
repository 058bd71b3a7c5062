from .schemas import FUT_SUFFIX, SeqBatch, SeqData, TokenizedSeqBatch
from .sequences import Sample, SequenceCorpus, build_corpus, hash_user_id
from .batching import (pad_batch_rows, sasrec_eval_batch, sasrec_train_batch,
                       tiger_batch)
from .loader import Loader, cycle
from .synthetic import (SyntheticItemDataset, make_catalog, make_interactions,
                        synthetic_corpus)
from .text_encoder import (HashedTextEncoder, SentenceTransformerEncoder,
                           make_text_encoder)

__all__ = [
    "FUT_SUFFIX", "SeqBatch", "SeqData", "TokenizedSeqBatch",
    "Sample", "SequenceCorpus", "build_corpus", "hash_user_id",
    "pad_batch_rows", "sasrec_eval_batch", "sasrec_train_batch", "tiger_batch",
    "Loader", "cycle",
    "SyntheticItemDataset", "make_catalog", "make_interactions",
    "synthetic_corpus",
    "HashedTextEncoder", "SentenceTransformerEncoder", "make_text_encoder",
]
