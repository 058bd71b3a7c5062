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


def convert_rqvae_state_dict(sd: Dict) -> dict:
    """Reference ``RqVae.state_dict()`` → genrec_tpu RqVae params.

    The reference MLP is a ``nn.Sequential`` (Linear/SiLU/...), so kernels
    live at ``encoder.mlp.<idx>.weight`` for ascending Linear indices.
    """
    sd = _to_numpy(sd)

    def mlp(prefix):
        idxs = sorted(int(k.split(".")[2]) for k in sd
                      if k.startswith(prefix + ".mlp.")
                      and k.endswith(".weight"))
        return {f"dense_{i}": {"kernel": _t(sd[f"{prefix}.mlp.{j}.weight"])}
                for i, j in enumerate(idxs)}

    params = {"encoder": mlp("encoder"), "decoder": mlp("decoder")}
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("layers.") and "embedding" in k)
    for i in range(n_layers):
        params[f"layer_{i}"] = {
            "embedding": _a(sd[f"layers.{i}.embedding.weight"])}
    return params


def convert_tiger_state_dict(sd: Dict) -> dict:
    """Reference ``Tiger.state_dict()`` → genrec_tpu Tiger params.

    The reference's unused positional tables (``pos_embedding``,
    ``decoder_pos_embedding`` — disabled in its forward, tiger.py:172-179)
    are dropped.
    """
    sd = _to_numpy(sd)

    def block(side, i):
        p = f"transformer.{side}.layers.{i}."
        out = {
            "norm1": {"weight": _a(sd[p + "norm1.weight"])},
            "norm2": {"weight": _a(sd[p + "norm2.weight"])},
            "self_attn": {
                "q": {"kernel": _t(sd[p + "self_attn.attn.q.weight"])},
                "kv": {"kernel": _t(sd[p + "self_attn.attn.kv.weight"])},
                "o": {"kernel": _t(sd[p + "self_attn.attn.o.weight"])},
                "rel_bias": _a(sd[p + "self_attn.attn.rel_bias.weight"]),
            },
            "ff": {"wi": {"kernel": _t(sd[p + "ff.wi.weight"])},
                   "wo": {"kernel": _t(sd[p + "ff.wo.weight"])}},
        }
        if p + "cross_attn.attn.q.weight" in sd:
            out["norm_cross"] = {
                "weight": _a(sd[p + "norm_cross.weight"])}
            out["cross_attn_layer"] = {
                "q": {"kernel": _t(sd[p + "cross_attn.attn.q.weight"])},
                "k": {"kernel": _t(sd[p + "cross_attn.attn.k.weight"])},
                "v": {"kernel": _t(sd[p + "cross_attn.attn.v.weight"])},
                "o": {"kernel": _t(sd[p + "cross_attn.attn.o.weight"])},
            }
        return out

    def depth(side):
        return 1 + max(int(k.split(".")[3]) for k in sd
                       if k.startswith(f"transformer.{side}.layers."))

    params = {
        "bos_embedding": _a(sd["bos_embedding"]),
        "norm": {"weight": _a(sd["norm.weight"])},
        "norm_context": {"weight": _a(sd["norm_context.weight"])},
        "sem_id_embedding": {
            "embedding": _a(sd["sem_id_embedding.emb.weight"])},
        "user_id_embedding": {
            "embedding": _a(sd["user_id_embedding.emb.weight"])},
        "in_proj": {"kernel": _t(sd["in_proj.weight"])},
        "in_proj_context": {"kernel": _t(sd["in_proj_context.weight"])},
        "output_head": {"kernel": _t(sd["output_head.weight"])},
        "transformer": {
            "encoder": {f"layer_{i}": block("encoder", i)
                        for i in range(depth("encoder"))},
            "decoder": {f"layer_{i}": block("decoder", i)
                        for i in range(depth("decoder"))},
        },
    }
    return params
