"""Drop-in Flax dropout module with selectable TPU-tuned backends.

Same call contract as ``flax.linen.Dropout`` (``__call__(x,
deterministic=...)``, draws from the ``"dropout"`` rng stream).

Backend policy (measured on v5e, round-2 A/B):

- default — **pure-XLA counter-hash dropout** (``kernels.dropout.
  hash_dropout``): the murmur3 keep-mask is a few elementwise uint32 ops
  that fuse into the producing/consuming XLA fusions, and the custom VJP
  regenerates the mask in the backward. No rng-bit tensor, no stored pred
  mask — removes the ~1.2 ms/step of dropout traffic that plain
  ``jax.random.bernoulli`` dropout paid at the TIGER paper config, without
  the fusion-splitting custom call below.
- ``GENREC_TPU_FUSED_DROPOUT=1`` — the standalone pallas kernel. Moves the
  fewest bytes in isolation but its custom call SPLITS the surrounding XLA
  fusions and loses net (13.2k vs 17.3k ex/s on the TIGER step); kept for
  A/B and as the interpreter-test target.
- ``GENREC_TPU_NO_HASH_DROPOUT=1`` (or ``GENREC_TPU_NO_FUSED_KERNELS=1``)
  — plain ``flax.linen.Dropout`` (threefry / hardware-RNG bernoulli).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from genrec_tpu.kernels.attention import _disabled
from genrec_tpu.kernels.dropout import (_fused_dropout, fused_dropout_supported,
                                        hash_dropout)


def _backend() -> str:
    if os.environ.get("GENREC_TPU_FUSED_DROPOUT", "") not in ("", "0"):
        if fused_dropout_supported():
            return "pallas"
    import genrec_tpu.kernels.dropout as fd
    if fd.INTERPRET:   # tests exercise the pallas kernel body on CPU
        return "pallas"
    if _disabled("GENREC_TPU_NO_HASH_DROPOUT"):
        return "plain"
    return "hash"


class Dropout(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate <= 0.0:
            return x
        backend = _backend()
        if backend == "plain":
            return nn.Dropout(self.rate, name="inner")(x,
                                                       deterministic=False)
        from genrec_tpu.core.rng import seed_from_rng
        seed = seed_from_rng(self.make_rng("dropout"))
        if backend == "pallas":
            return _fused_dropout(x, jnp.asarray(seed, jnp.int32), self.rate)
        return hash_dropout(x, seed, self.rate)
