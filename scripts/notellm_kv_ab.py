"""NoteLLM shared-prompt-KV A/B: step-time win + retrieval-vs-steps curve.

VERDICT r4 next #6 evidence: trains the synthetic pair task twice at a
Qwen-ish layer scale with a long shared instruction prefix — once with the
prompt prepended to every row (full forward, the reference's semantics
without its DynamicCache), once with the shared-prompt KV cache
(`share_prompt_kv=True`, the re-design of
/root/reference/genrec/models/notellm.py:20-41) — and writes both the
measured examples/sec and the eval retrieval-accuracy curve to
``out/notellm_ab_r5.jsonl``.

Run on the TPU:   python scripts/notellm_kv_ab.py
CPU smoke:        env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
                      python scripts/notellm_kv_ab.py --smoke
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "out", "notellm_ab_r5.jsonl")


def git_sha() -> str:
    r = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                       capture_output=True, text=True)
    return r.stdout.strip() or "unknown"


def run_side(share: bool, smoke: bool) -> dict:
    sys.path.insert(0, REPO)
    from genrec_tpu.configlib import gin
    from genrec_tpu.trainers.notellm_trainer import train
    gin.clear_config()
    save = f"/tmp/notellm_ab_{'kv' if share else 'full'}"
    knobs = dict(
        steps=60 if smoke else 300,
        batch_pairs=16 if smoke else 64,
        vocab_size=2000, seq_len=24 if smoke else 48,
        d_model=64 if smoke else 512,
        n_layers=2 if smoke else 8,
        n_heads=4 if smoke else 8, n_kv_heads=2 if smoke else 4,
        ff_dim=128 if smoke else 1408,
        eval_pairs=64 if smoke else 256,
        eval_every=20 if smoke else 50,
        shared_prompt_len=16 if smoke else 96,
        share_prompt_kv=share,
        save_dir_root=save, wandb_logging=False, seed=42)
    t0 = time.time()
    final = train(**knobs)
    wall = time.time() - t0
    curve = []
    with open(os.path.join(save, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if "eval/acc@1" in r:
                curve.append({"step": r["step"],
                              **{k.split("/")[1]: v for k, v in r.items()
                                 if k.startswith("eval/")}})
    # steady-state ex/s from the train log rows (examples_per_sec metric
    # is absent here; recompute from wall after the first eval = compile)
    return {"side": "shared_kv" if share else "full_forward",
            "wall_seconds": round(wall, 1), "final": final,
            "curve": curve, **knobs}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    sha = git_sha()
    recs = []
    for share in (False, True):
        rec = run_side(share, args.smoke)
        rec["git_sha"] = sha
        recs.append(rec)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps({k: rec[k] for k in
                          ("side", "wall_seconds", "final")}), flush=True)
    speedup = recs[0]["wall_seconds"] / max(recs[1]["wall_seconds"], 1e-9)
    print(f"shared-KV wall-clock speedup vs full forward: {speedup:.3f}x",
          flush=True)


if __name__ == "__main__":
    main()
