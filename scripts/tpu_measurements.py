"""Sequential TPU measurement runner.

Runs the queued benchmark set one process at a time (two concurrent TPU
processes contaminate timing and queue the compile service — CLAUDE.md),
with generous timeouts for remote compiles, appending one JSON line per
measurement to ``out/tpu_measurements.jsonl``.

Usage: python scripts/tpu_measurements.py [--quick] [--only NAME ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MEASUREMENTS = [
    # (name, argv, timeout_s[, env overrides])
    # bare bench.py now runs the FULL suite (r4); the per-model entries
    # here keep their single-model invocations
    ("tiger_headline", [sys.executable, "bench.py", "--model", "tiger"],
     3600),
    ("rqvae", [sys.executable, "bench.py", "--model", "rqvae"], 3600),
    ("sasrec", [sys.executable, "bench.py", "--model", "sasrec"], 3600),
    ("hstu", [sys.executable, "bench.py", "--model", "hstu"], 3600),
    # A/B pair for the r2 SASRec 26.6k-vs-46-54k anomaly: the naive-CE
    # variant is the prime suspect for the low outlier
    ("sasrec_no_fused_ce",
     [sys.executable, "bench.py", "--model", "sasrec"], 3600,
     {"GENREC_TPU_NO_FUSED_CE": "1"}),
    ("hstu_no_fused_ce",
     [sys.executable, "bench.py", "--model", "hstu"], 3600,
     {"GENREC_TPU_NO_FUSED_CE": "1"}),
    ("cobra", [sys.executable, "bench.py", "--model", "cobra"], 3600),
    # r3 A/B: unique-text dedupe (default-on) vs the per-position encode
    ("cobra_no_dedupe",
     [sys.executable, "bench.py", "--model", "cobra"], 3600,
     {"GENREC_TPU_NO_TEXT_DEDUPE": "1"}),
    # dedupe is catalog-bounded, so its win grows with batch: B=256 puts
    # 5376 history positions over the same 2000-item catalog
    ("cobra_b256",
     [sys.executable, "bench.py", "--model", "cobra", "--batch", "256"],
     3600),
    ("lcrec_decode",
     [sys.executable, "bench.py", "--model", "lcrec_decode"], 3600),
    ("tiger_generate", [sys.executable, "bench.py", "--generate"], 3600),
    ("qwen_scale",
     [sys.executable, "scripts/qwen_scale_bench.py"], 5400),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="--smoke every bench (CPU-friendly dry run)")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    out_path = os.path.join(ROOT, "out", "tpu_measurements.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    failures = 0
    for entry in MEASUREMENTS:
        name, argv, timeout = entry[:3]
        env = dict(os.environ, **(entry[3] if len(entry) > 3 else {}))
        if args.only and name not in args.only:
            continue
        cmd = list(argv)
        if args.quick:
            cmd.append("--smoke" if argv[1] == "bench.py" else "--tiny")
        print(f"== {name}: {' '.join(cmd)}", flush=True)
        t0 = time.time()
        try:
            proc = subprocess.run(cmd, cwd=ROOT, capture_output=True,
                                  text=True, timeout=timeout, env=env)
        except subprocess.TimeoutExpired:
            rec = {"name": name, "error": f"timeout after {timeout}s"}
            failures += 1
            print(json.dumps(rec), flush=True)
            with open(out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            continue
        wall = round(time.time() - t0, 1)
        line = ""
        for ln in (proc.stdout or "").splitlines():
            if ln.startswith("{"):
                line = ln
        rec = {"name": name, "wall_s": wall, "rc": proc.returncode}
        if line:
            try:
                rec["result"] = json.loads(line)
            except json.JSONDecodeError:
                rec["raw"] = line
        if proc.returncode != 0:
            failures += 1
            rec["stderr_tail"] = (proc.stderr or "")[-500:]
        print(json.dumps(rec), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
