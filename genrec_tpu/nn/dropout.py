"""Drop-in Flax dropout module with an optional fused-TPU-kernel backend.

Same call contract as ``flax.linen.Dropout`` (``__call__(x,
deterministic=...)``, draws from the ``"dropout"`` rng stream).

Backend policy (measured on v5e, round-2 A/B): XLA *fuses* the mask
application into the producing/consuming fusions, so although the
standalone pallas dropout kernel moves fewer bytes in isolation, inserting
it SPLITS those fusions and forces extra materialisations of the
activation tensors — a net loss on the TIGER step (13.2k vs 17.3k ex/s).
The fused kernel therefore stays opt-in (``GENREC_TPU_FUSED_DROPOUT=1``,
or the interpreter tests); the default is plain ``nn.Dropout``. The
attention-probability dropout is different — it lives *inside* the fused
softmax kernel where there is no XLA fusion to break.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from genrec_tpu.kernels.dropout import _fused_dropout, fused_dropout_supported


def _use_fused_module() -> bool:
    if os.environ.get("GENREC_TPU_FUSED_DROPOUT", "") not in ("", "0"):
        return fused_dropout_supported()
    import genrec_tpu.kernels.dropout as fd
    return fd.INTERPRET   # tests exercise the kernel body on CPU


class Dropout(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate <= 0.0:
            return x
        if not _use_fused_module():
            return nn.Dropout(self.rate, name="inner")(x,
                                                       deterministic=False)
        seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                  2 ** 31 - 1)
        return _fused_dropout(x, jnp.asarray(seed, jnp.int32), self.rate)
