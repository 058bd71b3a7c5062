"""Two-sided HSTU diagnostic, side 2: reference-eval of genrec_tpu weights.

Converts trained genrec_tpu HSTU best-checkpoints (the post-fix parity
seeds keep theirs in /tmp/parity_hstu_<seed>/best) into a torch reference
``HSTU`` state_dict (the exact inverse of
``genrec_tpu.interop.convert_hstu_state_dict``) and scores them with the
REFERENCE's own eval loop on the shared test split. Comparing against our
eval of the same weights isolates any eval-loop semantic difference; the
r5 precision probe already pinned our eval's bf16/fp32/platform
invariance, so agreement here closes the eval question entirely.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
         python scripts/hstu_cross_eval.py --seeds 113-120
Appends to out/parity/hstu_cross_eval.jsonl.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "out", "parity", "hstu_cross_eval.jsonl")


def to_torch_state_dict(params: dict, n_layers: int) -> dict:
    """genrec_tpu HSTU params → reference HSTU state_dict (inverse of
    interop.convert_hstu_state_dict; Dense kernels transpose)."""
    import torch
    t = lambda a: torch.tensor(np.asarray(a, np.float32).T)
    a = lambda x: torch.tensor(np.asarray(x, np.float32))
    sd = {
        "item_embedding.weight": a(params["item_embedding"]),
        "final_norm.weight": a(params["final_norm"]["scale"]),
        "final_norm.bias": a(params["final_norm"]["bias"]),
    }
    for i in range(n_layers):
        L = params[f"layer_{i}"]
        p = f"layers.{i}."
        sd[p + "projection.weight"] = t(L["projection"]["kernel"])
        sd[p + "projection.bias"] = a(L["projection"]["bias"])
        sd[p + "position_bias.relative_attention_bias.weight"] = \
            a(L["position_bias"])
        sd[p + "attn_norm.weight"] = a(L["attn_norm"]["scale"])
        sd[p + "attn_norm.bias"] = a(L["attn_norm"]["bias"])
        sd[p + "ffn_norm.weight"] = a(L["ffn_norm"]["scale"])
        sd[p + "ffn_norm.bias"] = a(L["ffn_norm"]["bias"])
        sd[p + "ffn.0.weight"] = t(L["ffn_in"]["kernel"])
        sd[p + "ffn.0.bias"] = a(L["ffn_in"]["bias"])
        sd[p + "ffn.3.weight"] = t(L["ffn_out"]["kernel"])
        sd[p + "ffn.3.bias"] = a(L["ffn_out"]["bias"])
        if "temporal_bias" in L:
            sd[p + "temporal_bias.temporal_attention_bias.weight"] = \
                a(L["temporal_bias"])
    return sd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="113-120")
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.seeds.split("-"))

    import jax
    import jax.numpy as jnp
    import torch
    from torch.utils.data import DataLoader
    from scripts.reference_parity import (bind_tpu_corpus, install_reference,
                                          make_shared_corpus,
                                          ref_evaluate, ref_seq_dataset)
    from genrec_tpu.core.checkpoint import CheckpointManager
    from genrec_tpu.models.hstu import HSTU as JaxHSTU

    install_reference()
    from genrec.data.amazon_hstu import hstu_eval_collate_fn
    from genrec.models.hstu import HSTU as TorchHSTU

    bind_tpu_corpus()
    _, corpus = make_shared_corpus()
    test_dl = DataLoader(ref_seq_dataset("hstu", corpus, "test"),
                         batch_size=256, shuffle=False, num_workers=0,
                         collate_fn=lambda x: hstu_eval_collate_fn(x, 50))

    tm = TorchHSTU(num_items=corpus.num_items, max_seq_len=50, embed_dim=64,
                   num_heads=2, num_blocks=2, dropout=0.2,
                   num_position_buckets=32, num_time_buckets=64,
                   use_temporal_bias=True)

    jm = JaxHSTU(num_items=corpus.num_items, max_seq_len=50, embed_dim=64,
                 num_heads=2, num_blocks=2, dropout=0.2,
                 num_position_buckets=32, num_time_buckets=64,
                 use_temporal_bias=True)
    ids0 = jnp.ones((1, 50), jnp.int32)
    template = jax.tree_util.tree_map(
        np.asarray, jm.init({"params": jax.random.PRNGKey(0)}, ids0,
                            timestamps=ids0)["params"])

    for seed in range(lo, hi + 1):
        ckpt_dir = f"/tmp/parity_hstu_{seed}/best"
        if not os.path.isdir(ckpt_dir):
            continue
        params = CheckpointManager(ckpt_dir).restore(template)
        missing, unexpected = tm.load_state_dict(
            to_torch_state_dict(params, 2), strict=True), None
        m = ref_evaluate(tm, test_dl, use_temporal_bias=True)
        rec = {"seed": seed, "eval": "reference_torch",
               **{k: float(v) for k, v in m.items()}}
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
