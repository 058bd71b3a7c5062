"""COBRA beam_fusion A/B: KV-cached cascade vs full re-forward (r5).

Times the jitted beam_fusion eval step at the amazon-config scale
(d=256, 8-layer decoder, 20-item histories, 128-token texts, beam 50)
with the cached cascade (default) and with
GENREC_TPU_NO_COBRA_CACHED_GENERATE=1 (the r4 layout), via one subprocess
each (the flag is read inside jit tracing). Appends both rows to
out/tpu_measurements.jsonl with metric cobra_beam_fusion_users_per_sec.

Run on TPU: python scripts/cobra_generate_ab.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_side(cached: bool) -> None:
    sys.path.insert(0, REPO)
    import numpy as np
    import jax
    import jax.numpy as jnp
    from genrec_tpu.models.cobra import Cobra, beam_fusion

    model = Cobra(encoder_n_layers=1, encoder_vocab_size=32128,
                  id_vocab_size=256, n_codebooks=3, d_model=256,
                  decoder_n_layers=8, decoder_num_heads=8,
                  decoder_dropout=0.1, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    B, T, Lt, N = 64, 20, 128, 2000
    C, K = model.n_codebooks, model.id_vocab_size
    ids = jnp.asarray(rng.integers(0, K, (B, T * C)), jnp.int32)
    toks = jnp.asarray(rng.integers(1, 32128, (B, T, Lt)), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids,
                        toks)["params"]
    item_vecs = jnp.asarray(rng.normal(size=(N, 256)), jnp.float32)
    item_sem = jnp.asarray(rng.integers(0, K, (N, C)), jnp.int32)

    def step():
        out = beam_fusion(model, params, ids, toks, item_vecs, item_sem,
                          n_candidates=10, n_beam=50)
        return np.asarray(out.item_ids)

    step()                                   # compile
    windows = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(5):
            step()
        windows.append(B * 5 / (time.perf_counter() - t0))
    med = float(np.median(windows))
    spread = (max(windows) - min(windows)) / 2 / med * 100
    sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                         capture_output=True, text=True).stdout.strip()
    rec = {"metric": "cobra_beam_fusion_users_per_sec",
           "value": round(med, 1), "unit": "users/sec (beam 50, fusion)",
           "vs_baseline": None,
           "cached_cascade": cached, "spread_pct": round(spread, 2),
           "batch": B, "beam": 50, "git_sha": sha,
           "device_kind": jax.devices()[0].device_kind,
           "protocol": "median of 5 windows x 5 steps, fetch-fenced"}
    with open(os.path.join(REPO, "out", "tpu_measurements.jsonl"),
              "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    if os.environ.get("_COBRA_AB_CHILD"):
        run_side(os.environ.get(
            "GENREC_TPU_NO_COBRA_CACHED_GENERATE", "") in ("", "0"))
        return
    for env_val in ("0", "1"):
        env = dict(os.environ, _COBRA_AB_CHILD="1",
                   GENREC_TPU_NO_COBRA_CACHED_GENERATE=env_val)
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env)
        if r.returncode != 0:
            sys.exit(r.returncode)


if __name__ == "__main__":
    main()
