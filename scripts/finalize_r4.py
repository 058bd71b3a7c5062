"""End-of-round evidence consolidation (run after the parity chains).

1. Dedupe identical (side, seed) rows per model table — a leftover r3b
   chain and the r4 chain both ran reference tiger seed 104; same torch
   seed + same corpus ⇒ byte-identical runs, keep one.
2. Promote post-MLP-init-fix RQ-VAE rows (scripts/promote_rqvae_rows.py).
3. Regenerate the parity report table into STATUS.md at the
   <!-- PARITY_TABLE --> marker.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "out", "parity")


def dedupe(model: str) -> None:
    path = os.path.join(OUT, f"{model}_runs.jsonl")
    if not os.path.exists(path):
        return
    rows = [json.loads(l) for l in open(path) if l.strip()]
    seen, out = {}, []
    for r in rows:
        key = (r["side"], r.get("seed"))
        if key in seen:
            out[seen[key]] = r          # keep the newest duplicate
        else:
            seen[key] = len(out)
            out.append(r)
    if len(out) != len(rows):
        with open(path, "w") as f:
            for r in out:
                f.write(json.dumps(r) + "\n")
        print(f"{model}: deduped {len(rows)} -> {len(out)} rows")


def main():
    for m in ("tiger", "sasrec", "hstu", "rqvae", "cobra", "lcrec"):
        dedupe(m)
    r = subprocess.run([sys.executable, "scripts/promote_rqvae_rows.py"],
                       cwd=REPO, capture_output=True, text=True)
    print(r.stdout.strip() or r.stderr.strip())

    from scripts.reference_parity import report
    table = report(["sasrec", "hstu", "rqvae", "tiger", "cobra", "lcrec"])
    status = open(os.path.join(REPO, "STATUS.md")).read()
    marker = "<!-- PARITY_TABLE -->"
    if marker in status:
        start = status.index(marker)
        end = status.index("\n\n", start) if "\n\n" in status[start:] else \
            start + len(marker)
        end = status.find("\n\n", start)
        status = status[:start] + marker + "\n" + table + status[end:]
        with open(os.path.join(REPO, "STATUS.md"), "w") as f:
            f.write(status)
        print("STATUS.md parity table regenerated")
    print(table)


if __name__ == "__main__":
    main()
