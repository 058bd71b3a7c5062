"""Loss functions for RQ-VAE training.

Parity target: ``/root/reference/genrec/modules/loss.py``:
``ReconstructionLoss`` (:8-23), ``CategoricalReconstructionLoss`` (:26-54),
``QuantizeLoss`` (:57-77). Implemented as pure functions (idiomatic JAX — the
reference wraps these in parameterless ``nn.Module``\\ s).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reconstruction_loss(x_hat: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Squared-L2 reconstruction loss summed over the feature axis → (B,)."""
    return jnp.sum(jnp.square(x_hat - x), axis=-1)


def categorical_reconstruction_loss(x_hat: jnp.ndarray, x: jnp.ndarray,
                                    n_cat_feats: int) -> jnp.ndarray:
    """Squared-L2 on dense dims + BCE-with-logits on trailing categorical dims.

    ``n_cat_feats`` is static (shapes must be known under jit).
    """
    if n_cat_feats <= 0:
        return reconstruction_loss(x_hat, x)
    dense = reconstruction_loss(x_hat[:, :-n_cat_feats], x[:, :-n_cat_feats])
    logits = x_hat[:, -n_cat_feats:]
    labels = x[:, -n_cat_feats:]
    # numerically-stable BCE with logits: max(z,0) - z*y + log(1+exp(-|z|))
    bce = (jnp.maximum(logits, 0.0) - logits * labels
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return dense + jnp.sum(bce, axis=-1)


def quantize_loss(query: jnp.ndarray, value: jnp.ndarray,
                  commitment_weight: float = 1.0) -> jnp.ndarray:
    """VQ loss: codebook term + β·commitment term, summed over dim → (B,).

    ``emb_loss`` pulls codebook vectors toward (stopped) encoder outputs;
    ``query_loss`` pulls encoder outputs toward (stopped) codebook vectors.
    """
    sg = jax.lax.stop_gradient
    emb_loss = jnp.sum(jnp.square(sg(query) - value), axis=-1)
    query_loss = jnp.sum(jnp.square(query - sg(value)), axis=-1)
    return emb_loss + commitment_weight * query_loss
