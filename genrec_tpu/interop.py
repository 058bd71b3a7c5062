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


def convert_cobra_state_dict(sd: Dict) -> dict:
    """Reference ``Cobra.state_dict()`` → genrec_tpu Cobra params.

    Torch layout (``/root/reference/genrec/models/cobra.py``):
    ``encoder.*`` LightT5Encoder (nn.TransformerEncoderLayer: fused MHA
    in_proj + out_proj, linear1/2, norm1/2), ``cobra_emb.*`` embedding
    tables, ``decoder.decoder.layers.*`` torch TransformerDecoderLayer —
    whose cross-attention runs over EMPTY memory, so ``multihead_attn.*``
    weights are mathematically dead and dropped; its norm2 maps to our
    ``norm_cross`` and norm3 to our FFN norm. ``sparse_head.{c}`` →
    ``head_{c}``. The unused ``feat_queue`` buffers are dropped.
    """
    sd = _to_numpy(sd)

    def ln(prefix):
        return {"scale": _a(sd[prefix + ".weight"]),
                "bias": _a(sd[prefix + ".bias"])}

    def lin(prefix):
        out = {"kernel": _t(sd[prefix + ".weight"])}
        if prefix + ".bias" in sd:
            out["bias"] = _a(sd[prefix + ".bias"])
        return out

    def enc_layer(i):
        p = f"encoder.encoder.layers.{i}."
        return {
            "qkv": {"kernel": _t(sd[p + "self_attn.in_proj_weight"]),
                    "bias": _a(sd[p + "self_attn.in_proj_bias"])},
            "attn_out": lin(p + "self_attn.out_proj"),
            "ff1": lin(p + "linear1"),
            "ff2": lin(p + "linear2"),
            "norm1": ln(p + "norm1"),
            "norm2": ln(p + "norm2"),
        }

    def dec_layer(i):
        p = f"decoder.decoder.layers.{i}."
        return {
            "qkv": {"kernel": _t(sd[p + "self_attn.in_proj_weight"]),
                    "bias": _a(sd[p + "self_attn.in_proj_bias"])},
            "attn_out": lin(p + "self_attn.out_proj"),
            "ff1": lin(p + "linear1"),
            "ff2": lin(p + "linear2"),
            "norm1": ln(p + "norm1"),
            "norm_cross": ln(p + "norm2"),   # empty-memory cross-attn norm
            "norm2": ln(p + "norm3"),        # our FFN norm name
        }

    n_enc = 1 + max(int(k.split(".")[3]) for k in sd
                    if k.startswith("encoder.encoder.layers."))
    n_dec = 1 + max(int(k.split(".")[3]) for k in sd
                    if k.startswith("decoder.decoder.layers."))
    n_heads = 1 + max(int(k.split(".")[1]) for k in sd
                      if k.startswith("sparse_head."))

    encoder = {
        "embedding": {"embedding": _a(sd["encoder.embedding.weight"])},
        "pos_embedding": {
            "embedding": _a(sd["encoder.pos_embedding.weight"])},
        "final_norm": ln("encoder.layer_norm"),
        "proj": lin("encoder.proj"),
    }
    for i in range(n_enc):
        encoder[f"layer_{i}"] = enc_layer(i)

    params = {
        "encoder": encoder,
        "id_embed": {"embedding": _a(sd["cobra_emb.id_embed.weight"])},
        "type_embed": {"embedding": _a(sd["cobra_emb.type_embed.weight"])},
        "pos_embed": {"embedding": _a(sd["cobra_emb.pos_embed.weight"])},
    }
    for i in range(n_dec):
        params[f"dec_{i}"] = dec_layer(i)
    for c in range(n_heads):
        params[f"head_{c}"] = lin(f"sparse_head.{c}")
    return params


# ---------------------------------------------------------------------------
# HF Qwen2 → CausalLM (the LCRec/NoteLLM backbone)
# ---------------------------------------------------------------------------

def convert_qwen2_state_dict(sd: Dict, tie_embeddings: bool = True) -> dict:
    """HF ``Qwen2ForCausalLM.state_dict()`` → genrec_tpu ``CausalLM`` params.

    The reference loads Qwen2.5-1.5B via HF AutoModelForCausalLM
    (``/root/reference/genrec/models/lcrec.py:17-60``); this converter maps
    those weights onto the in-repo TPU backbone (same architecture family:
    RMSNorm pre-norm, RoPE, GQA with q/k/v biases, SwiGLU). Logits parity is
    verified against a random-init HF Qwen2 in tests/test_interop.py.

    Accepts keys with or without the ``model.`` prefix. Pass the matching
    ``CausalLM(..., rope_theta=config.rope_theta, tie_embeddings=...)``.
    """
    sd = _to_numpy(sd)
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):] if k.startswith("model.") else k: v
              for k, v in sd.items()}
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("layers."))

    def layer(i):
        p = f"layers.{i}."
        return {
            "attn_norm": {"weight": _a(sd[p + "input_layernorm.weight"])},
            "q": {"kernel": _t(sd[p + "self_attn.q_proj.weight"]),
                  "bias": _a(sd[p + "self_attn.q_proj.bias"])},
            "k": {"kernel": _t(sd[p + "self_attn.k_proj.weight"]),
                  "bias": _a(sd[p + "self_attn.k_proj.bias"])},
            "v": {"kernel": _t(sd[p + "self_attn.v_proj.weight"]),
                  "bias": _a(sd[p + "self_attn.v_proj.bias"])},
            "o": {"kernel": _t(sd[p + "self_attn.o_proj.weight"])},
            "mlp_norm": {
                "weight": _a(sd[p + "post_attention_layernorm.weight"])},
            "gate": {"kernel": _t(sd[p + "mlp.gate_proj.weight"])},
            "up": {"kernel": _t(sd[p + "mlp.up_proj.weight"])},
            "down": {"kernel": _t(sd[p + "mlp.down_proj.weight"])},
        }

    params = {
        "wte": _a(sd["embed_tokens.weight"]),
        "final_norm": {"weight": _a(sd["norm.weight"])},
        **{f"layer_{i}": layer(i) for i in range(n_layers)},
    }
    if not tie_embeddings:
        params["lm_head"] = {"kernel": _t(sd["lm_head.weight"])}
    return params


def qwen2_model_kwargs(config) -> dict:
    """HF ``Qwen2Config`` (or dict) → ``CausalLM`` constructor kwargs."""
    get = (lambda k, d=None: getattr(config, k, d)) \
        if not isinstance(config, dict) else config.get
    return dict(
        vocab_size=get("vocab_size"),
        d_model=get("hidden_size"),
        n_layers=get("num_hidden_layers"),
        n_heads=get("num_attention_heads"),
        n_kv_heads=get("num_key_value_heads"),
        ff_dim=get("intermediate_size"),
        max_len=min(get("max_position_embeddings", 32768), 32768),
        rope_theta=float(get("rope_theta", 10000.0)),
        tie_embeddings=bool(get("tie_word_embeddings", True)),
    )


def inject_lora_params(params: dict, rank: int, rng,
                       stddev: float = 0.02) -> dict:
    """Re-nest converted dense params for ``lora_rank>0`` models.

    ``CausalLM(lora_rank=r)`` wraps every projection in :class:`LoraDense`,
    whose base Dense lives under a ``base`` subtree plus fresh
    ``lora_a``/``lora_b``. This moves each projection's {kernel, bias}
    under ``base`` and adds zero-initialised adapters (lora_b=0 ⇒ the
    wrapped model is numerically identical to the converted one).
    """
    proj_names = ("q", "k", "v", "o", "gate", "up", "down")
    out = {}
    for key, val in params.items():
        if key.startswith("layer_"):
            new_layer = {}
            for name, sub in val.items():
                if name in proj_names:
                    d_in = sub["kernel"].shape[0]
                    d_out = sub["kernel"].shape[1]
                    rng, k1 = jax.random.split(rng)
                    new_layer[name] = {
                        "base": sub,
                        "lora_a": jax.random.normal(
                            k1, (d_in, rank), jnp.float32) * stddev,
                        "lora_b": jnp.zeros((rank, d_out), jnp.float32),
                    }
                else:
                    new_layer[name] = sub
            out[key] = new_layer
        else:
            out[key] = val
    return out


QWEN2_BACKBONE_FORMAT = "qwen2-backbone-v1"


def convert_qwen2_checkpoint(src_dir: str, out_dir: str) -> dict:
    """Convert a local HF Qwen2 checkpoint directory into a genrec_tpu
    backbone artifact: ``out_dir/params`` (orbax), ``out_dir/config.json``
    (CausalLM kwargs + eos id + format tag) and a copied ``tokenizer.json``
    when present. Returns the written config.

    Replaces the reference's hub-side ``AutoModelForCausalLM.from_pretrained``
    (``/root/reference/genrec/models/lcrec.py:17-46``) with an offline,
    one-time conversion; :meth:`LCRec.from_qwen2_backbone` consumes the
    artifact. CLI: ``python scripts/convert_qwen2.py <hf_dir> <out_dir>``.
    """
    import glob
    import json
    import os
    import shutil

    import orbax.checkpoint as ocp

    with open(os.path.join(src_dir, "config.json")) as f:
        hf_cfg = json.load(f)
    sd = {}
    st_files = sorted(glob.glob(os.path.join(src_dir, "*.safetensors")))
    if st_files:
        from safetensors.numpy import load_file
        for fpath in st_files:
            sd.update(load_file(fpath))
    else:
        import torch
        bins = sorted(glob.glob(os.path.join(src_dir, "pytorch_model*.bin")))
        if not bins:
            raise FileNotFoundError(
                f"No *.safetensors or pytorch_model*.bin in {src_dir}")
        for fpath in bins:
            sd.update(torch.load(fpath, map_location="cpu"))

    kwargs = qwen2_model_kwargs(hf_cfg)
    params = convert_qwen2_state_dict(
        sd, tie_embeddings=kwargs["tie_embeddings"])

    out_dir = os.path.abspath(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(out_dir, "params"),
               jax.tree_util.tree_map(np.asarray, params), force=True)
    ckptr.wait_until_finished()
    config = {"format": QWEN2_BACKBONE_FORMAT, "model": kwargs,
              "eos_token_id": hf_cfg.get("eos_token_id"),
              "bos_token_id": hf_cfg.get("bos_token_id"),
              "pad_token_id": hf_cfg.get("pad_token_id")}
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    tok_src = os.path.join(src_dir, "tokenizer.json")
    if os.path.exists(tok_src):
        shutil.copy(tok_src, os.path.join(out_dir, "tokenizer.json"))
    return config
