#!/bin/bash
# e5000 resume, take 2. Eager reference runs hit a dtype bug in the
# reference's own _sinkhorn_knopp (float marginals vs double kernel -
# torch.compile's inductor was inserting the promotion; plain eager
# RuntimeErrors). The shim casts the marginals to double before calling
# the reference function - the same promotion the compiled path performs,
# so numerics are unchanged. Rows carry dynamo_disabled + shim notes.
set -u
cd /root/repo
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu TORCHDYNAMO_DISABLE=1 \
    OMP_NUM_THREADS=2 nice -n 10 python - <<'PYEOF' \
    >> out/parity/rqvae_e5000.log 2>&1
import json, os, sys
sys.path.insert(0, "/root/repo")
from scripts.reference_parity import OUT_DIR, git_sha, install_reference, \
    make_shared_corpus
from scripts.parity_rqvae_tiger import run_reference_rqvae, run_tpu_rqvae

install_reference()
import genrec.models.rqvae as rmod
_orig_sk = rmod._sinkhorn_knopp
def _sk_double(cost, row_marginals, col_marginals, **kw):
    return _orig_sk(cost, row_marginals.double(), col_marginals.double(),
                    **kw)
rmod._sinkhorn_knopp = _sk_double

catalog, _ = make_shared_corpus()
path = os.path.join(OUT_DIR, "rqvae_runs_e5000.jsonl")
done = set()
if os.path.exists(path):
    done = {(r["side"], r["seed"]) for r in map(json.loads, open(path))}
for seed in (100, 104, 105):
    for side, fn in (("genrec_tpu",
                      lambda s: run_tpu_rqvae(s, 5000, out_suffix="_e5000")),
                     ("reference",
                      lambda s: run_reference_rqvae(catalog, s, 5000))):
        if (side, seed) in done:
            print(f"skip {side} {seed}", flush=True)
            continue
        rec = fn(seed)
        rec["git_sha"] = git_sha()
        if side == "reference":
            rec["dynamo_disabled"] = True
            rec["sinkhorn_marginals_cast_to_double"] = True
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
PYEOF
echo "rqvae e5000 resume2 done"
