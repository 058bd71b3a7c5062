"""Reference-checkpoint interop: convert phonism/genrec torch state dicts
into genrec_tpu Flax parameter trees.

A user of the reference switching to this framework can load their trained
``.pt`` checkpoints directly::

    sd = torch.load("best_model.pt", map_location="cpu")   # state_dict
    params = convert_sasrec_state_dict(sd)

Key-name contracts are the reference modules' parameter names
(``/root/reference/genrec/models/sasrec.py`` / ``hstu.py``); torch Linear
weights are (out, in) and transpose to Flax (in, out) kernels. Numerical
parity (logits match to fp32 tolerance) is verified in
``tests/test_interop.py`` against the actual reference modules.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _t(w) -> jnp.ndarray:
    """torch Linear weight (out, in) → flax kernel (in, out)."""
    return jnp.asarray(np.asarray(w).T.copy())


def _a(w) -> jnp.ndarray:
    return jnp.asarray(np.asarray(w))


def _to_numpy(sd: Dict) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def convert_sasrec_state_dict(sd: Dict) -> dict:
    """Reference ``SASRec.state_dict()`` → genrec_tpu SASRec params."""
    sd = _to_numpy(sd)
    n_blocks = 1 + max((int(k.split(".")[1]) for k in sd
                        if k.startswith("blocks.")), default=-1)
    params = {
        "item_embedding": _a(sd["item_embedding.weight"]),
        "position_embedding": _a(sd["position_embedding.weight"]),
        "final_norm": {"scale": _a(sd["final_norm.weight"]),
                       "bias": _a(sd["final_norm.bias"])},
    }
    for i in range(n_blocks):
        p = f"blocks.{i}."
        params[f"block_{i}"] = {
            "norm1": {"scale": _a(sd[p + "norm1.weight"]),
                      "bias": _a(sd[p + "norm1.bias"])},
            "norm2": {"scale": _a(sd[p + "norm2.weight"]),
                      "bias": _a(sd[p + "norm2.bias"])},
            "attention": {
                "q_proj": {"kernel": _t(sd[p + "attention.q_proj.weight"]),
                           "bias": _a(sd[p + "attention.q_proj.bias"])},
                "k_proj": {"kernel": _t(sd[p + "attention.k_proj.weight"]),
                           "bias": _a(sd[p + "attention.k_proj.bias"])},
                "v_proj": {"kernel": _t(sd[p + "attention.v_proj.weight"]),
                           "bias": _a(sd[p + "attention.v_proj.bias"])},
            },
            "ffn": {
                "fc1": {"kernel": _t(sd[p + "ffn.fc1.weight"]),
                        "bias": _a(sd[p + "ffn.fc1.bias"])},
                "fc2": {"kernel": _t(sd[p + "ffn.fc2.weight"]),
                        "bias": _a(sd[p + "ffn.fc2.bias"])},
            },
        }
    return params


def convert_hstu_state_dict(sd: Dict) -> dict:
    """Reference ``HSTU.state_dict()`` → genrec_tpu HSTU params."""
    sd = _to_numpy(sd)
    n_layers = 1 + max((int(k.split(".")[1]) for k in sd
                        if k.startswith("layers.")), default=-1)
    params = {
        "item_embedding": _a(sd["item_embedding.weight"]),
        "final_norm": {"scale": _a(sd["final_norm.weight"]),
                       "bias": _a(sd["final_norm.bias"])},
    }
    for i in range(n_layers):
        p = f"layers.{i}."
        layer = {
            "projection": {"kernel": _t(sd[p + "projection.weight"]),
                           "bias": _a(sd[p + "projection.bias"])},
            "position_bias": _a(
                sd[p + "position_bias.relative_attention_bias.weight"]),
            "attn_norm": {"scale": _a(sd[p + "attn_norm.weight"]),
                          "bias": _a(sd[p + "attn_norm.bias"])},
            "ffn_norm": {"scale": _a(sd[p + "ffn_norm.weight"]),
                         "bias": _a(sd[p + "ffn_norm.bias"])},
            # reference ffn is Sequential(Linear, SiLU, Dropout, Linear, ...)
            "ffn_in": {"kernel": _t(sd[p + "ffn.0.weight"]),
                       "bias": _a(sd[p + "ffn.0.bias"])},
            "ffn_out": {"kernel": _t(sd[p + "ffn.3.weight"]),
                        "bias": _a(sd[p + "ffn.3.bias"])},
        }
        tkey = p + "temporal_bias.temporal_attention_bias.weight"
        if tkey in sd:
            layer["temporal_bias"] = _a(sd[tkey])
        params[f"layer_{i}"] = layer
    return params
