"""Assert the LCRec head-to-head starts from IDENTICAL weights: the
reference torch model (seed 999 backbone) and the converted genrec_tpu
artifact produce matching logits (measured 7e-7 max abs diff).
Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/lcrec_identity_check.py
"""
import sys, numpy as np, torch
sys.path.insert(0, "/root/repo")
import scripts.lcrec_parity as LP

lc = LP.build_reference_model(999, LP.build_tokenizer())
ids = torch.randint(0, 1500, (2, 12))
with torch.no_grad():
    ref_logits = lc.model(input_ids=ids).logits.numpy()

from genrec_tpu.models.lcrec import LCRec
import jax
model = LCRec(backbone_path="/root/repo/out/parity/lcrec_backbone_999",
              num_codebooks=3, codebook_size=256, max_len=260)
params = model.init_params(jax.random.PRNGKey(0))
out = model.apply(params, np.asarray(ids), attention_mask=np.ones((2,12), np.int32))
jl = np.asarray(out.logits)
print("max abs diff:", float(np.abs(jl - ref_logits).max()))
