"""genrec-tpu: a TPU-native generative-recommendation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of phonism/genrec
(mounted read-only at ``/root/reference``): RQ-VAE semantic-ID learning,
sequential recommenders (SASRec, HSTU), generative retrieval (TIGER, COBRA,
LCRec) with constrained beam decoding, plus the data pipelines, trainers,
metrics, checkpointing and gin-style configuration that wire them together.

Layer map (bottom → top), mirroring SURVEY.md §7:

* :mod:`genrec_tpu.configlib` — gin-compatible config parser + CLI
* :mod:`genrec_tpu.data` — Amazon-2014 ingest, per-model sample generators,
  fixed-shape sharded host loaders
* :mod:`genrec_tpu.ops` / :mod:`genrec_tpu.kernels` — pure-jnp ops and Pallas
  TPU kernels for the hot paths
* :mod:`genrec_tpu.nn` — Flax building blocks (norms, embeddings, T5 stack)
* :mod:`genrec_tpu.models` — RQ-VAE, TIGER, SASRec, HSTU, COBRA, LCRec, NoteLLM
* :mod:`genrec_tpu.decoding` — vectorized trie + jit beam search
* :mod:`genrec_tpu.parallel` — mesh construction and sharding helpers
* :mod:`genrec_tpu.core` — train engine, orbax checkpointing, metric logging
* :mod:`genrec_tpu.trainers` — gin-configured per-model entry points
"""

__version__ = "0.1.0"
