"""MLP block (Flax).

Parity target: ``/root/reference/genrec/modules/encoder.py:380-420`` (``MLP``):
stacked bias-free Dense layers with SiLU activations between them (none after
the last), optional L2 normalization of the output. Used as the RQ-VAE
encoder/decoder tower.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from genrec_tpu.ops.normalize import l2norm


class MLP(nn.Module):
    hidden_dims: Sequence[int]   # includes the output dim as last entry
    normalize_out: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # init parity: the reference's MLP uses torch nn.Linear defaults
        # (kaiming_uniform(a=√5) = U(±1/√fan_in)); see TORCH_LINEAR_INIT.
        from genrec_tpu.nn.transformer import TORCH_LINEAR_INIT
        for i, dim in enumerate(self.hidden_dims):
            x = nn.Dense(dim, use_bias=False, dtype=self.dtype,
                         kernel_init=TORCH_LINEAR_INIT,
                         name=f"dense_{i}")(x)
            if i < len(self.hidden_dims) - 1:
                x = nn.silu(x)
        if self.normalize_out:
            x = l2norm(x, axis=-1)
        return x
