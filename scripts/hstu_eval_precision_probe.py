"""HSTU eval-precision probe: same trained weights, bf16 vs fp32 scoring.

The r5 HSTU head-to-head signature — R@1/R@5 at parity (p>0.3) but R@10
−0.0035 (p=0.012) — fits ranking-score noise at the rank-6..10 boundary,
not worse-trained weights: the parity eval ran the forward in bf16
(amp=True) while the reference evals in torch fp32, and adding
independent noise to near-tied scores strictly degrades deep-rank
recall on average.

This probe loads the SAME trained best-checkpoints the parity seeds
saved (/tmp/parity_hstu_<seed>/best) and scores each with our eval at
dtype=bfloat16 and dtype=float32. Any systematic bf16−fp32 difference is
pure eval-side precision effect (weights, data, protocol identical).

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
         python scripts/hstu_eval_precision_probe.py [--seeds 100-139]
Appends one record per (seed, dtype) to out/parity/hstu_eval_probe.jsonl.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "out", "parity", "hstu_eval_probe.jsonl")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="100-139")
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.seeds.split("-"))

    import jax
    import jax.numpy as jnp
    from functools import partial
    from scripts.reference_parity import bind_tpu_corpus, make_shared_corpus
    from genrec_tpu.core.checkpoint import CheckpointManager
    from genrec_tpu.data import Loader, sasrec_eval_batch
    from genrec_tpu.models.hstu import HSTU
    from genrec_tpu.models.sasrec import predict_topk
    from genrec_tpu.ops import TopKAccumulator, topk_metric_sums

    bind_tpu_corpus()
    _, corpus = make_shared_corpus()
    loader = Loader(corpus.generate_samples("test"), 256,
                    partial(sasrec_eval_batch, max_seq_len=50,
                            with_time=True), shuffle=False)

    def evaluate(params, dtype):
        model = HSTU(num_items=corpus.num_items, max_seq_len=50,
                     embed_dim=64, num_heads=2, num_blocks=2, dropout=0.2,
                     num_position_buckets=32, num_time_buckets=64,
                     use_temporal_bias=True, dtype=dtype)

        @jax.jit
        def eval_step(params, ids, ts, tgt, valid):
            out = model.apply({"params": params}, ids, timestamps=ts,
                              deterministic=True)
            topk = predict_topk(out.logits[:, -1, :], 10)
            return topk_metric_sums(tgt[:, None], topk[:, :, None],
                                    (1, 5, 10), valid=valid)

        acc = TopKAccumulator(ks=(1, 5, 10))
        for b in loader:
            sums = eval_step(params, jnp.asarray(b.ids), jnp.asarray(b.x),
                             jnp.asarray(b.ids_fut), jnp.asarray(b.valid))
            acc.update_sums({k: float(np.asarray(v))
                             for k, v in sums.items()})
        return acc.reduce()

    import jax.numpy as jnp
    template_model = HSTU(num_items=corpus.num_items, max_seq_len=50,
                          embed_dim=64, num_heads=2, num_blocks=2,
                          dropout=0.2, num_position_buckets=32,
                          num_time_buckets=64, use_temporal_bias=True)
    ids0 = jnp.ones((1, 50), jnp.int32)
    template = jax.tree_util.tree_map(
        np.asarray,
        template_model.init({"params": jax.random.PRNGKey(0)}, ids0,
                            timestamps=ids0)["params"])
    recs = []
    for seed in range(lo, hi + 1):
        ckpt_dir = f"/tmp/parity_hstu_{seed}/best"
        if not os.path.isdir(ckpt_dir):
            continue
        ckpt = CheckpointManager(ckpt_dir)
        step = ckpt.latest_step()
        params = ckpt.restore(template)
        for dtype, name in ((jnp.bfloat16, "bfloat16"),
                            (jnp.float32, "float32")):
            m = evaluate(params, dtype)
            rec = {"seed": seed, "eval_dtype": name, "ckpt_step": int(step),
                   **{k: float(v) for k, v in m.items()}}
            recs.append(rec)
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)

    for name in ("bfloat16", "float32"):
        v = np.array([r["Recall@10"] for r in recs
                      if r["eval_dtype"] == name])
        if len(v):
            print(f"{name}: n={len(v)} mean R@10 {v.mean():.4f} "
                  f"median {np.median(v):.4f}", flush=True)
    both = {}
    for r in recs:
        both.setdefault(r["seed"], {})[r["eval_dtype"]] = r["Recall@10"]
    d = np.array([v["bfloat16"] - v["float32"] for v in both.values()
                  if len(v) == 2])
    if len(d):
        print(f"paired bf16-f32 diff: mean {d.mean():+.4f} "
              f"sd {d.std(ddof=1):.4f} n={len(d)}", flush=True)


if __name__ == "__main__":
    main()
