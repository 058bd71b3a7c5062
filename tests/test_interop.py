"""Numerical parity: reference torch models vs genrec_tpu with converted
weights. Loads the actual reference modules (torch-only imports) and
compares logits — behavior parity, not just shape compatibility."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/genrec/models"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


def _load_ref(name):
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", os.path.join(REF, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sasrec_logits_match_reference():
    from genrec_tpu.interop import convert_sasrec_state_dict
    from genrec_tpu.models.sasrec import SASRec

    ref = _load_ref("sasrec")
    torch.manual_seed(0)
    rm = ref.SASRec(num_items=50, max_seq_len=12, embed_dim=32, num_heads=2,
                    num_blocks=2, ffn_dim=64, dropout=0.0)
    rm.eval()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 51, (4, 12)).astype(np.int64)
    ids[:, :3] = 0  # padding prefix
    with torch.no_grad():
        ref_logits, _ = rm(torch.as_tensor(ids))

    model = SASRec(num_items=50, max_seq_len=12, embed_dim=32, num_heads=2,
                   num_blocks=2, ffn_dim=64, dropout=0.0)
    params = convert_sasrec_state_dict(rm.state_dict())
    out = model.apply({"params": params}, jnp.asarray(ids, jnp.int32))

    np.testing.assert_allclose(np.asarray(out.logits),
                               ref_logits.numpy(), atol=2e-4, rtol=1e-3)


def test_sasrec_loss_matches_reference():
    from genrec_tpu.interop import convert_sasrec_state_dict
    from genrec_tpu.models.sasrec import SASRec

    ref = _load_ref("sasrec")
    torch.manual_seed(1)
    rm = ref.SASRec(num_items=30, max_seq_len=8, embed_dim=16, num_heads=2,
                    num_blocks=1, ffn_dim=32, dropout=0.0)
    rm.eval()
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 31, (4, 8)).astype(np.int64)
    tgt = rng.integers(0, 31, (4, 8)).astype(np.int64)  # some ignored 0s
    with torch.no_grad():
        _, ref_loss = rm(torch.as_tensor(ids), torch.as_tensor(tgt))

    model = SASRec(num_items=30, max_seq_len=8, embed_dim=16, num_heads=2,
                   num_blocks=1, ffn_dim=32, dropout=0.0)
    params = convert_sasrec_state_dict(rm.state_dict())
    out = model.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                      targets=jnp.asarray(tgt, jnp.int32))
    np.testing.assert_allclose(float(out.loss), float(ref_loss), rtol=1e-4)


def test_hstu_logits_match_reference():
    from genrec_tpu.interop import convert_hstu_state_dict
    from genrec_tpu.models.hstu import HSTU

    ref = _load_ref("hstu")
    torch.manual_seed(2)
    rm = ref.HSTU(num_items=40, max_seq_len=10, embed_dim=32, num_heads=2,
                  num_blocks=2, dropout=0.0, use_temporal_bias=True)
    rm.eval()
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 41, (3, 10)).astype(np.int64)
    ids[:, :2] = 0
    ts = np.cumsum(rng.integers(1000, 100000, (3, 10)), axis=1)
    with torch.no_grad():
        ref_logits, _ = rm(torch.as_tensor(ids), torch.as_tensor(ts))

    model = HSTU(num_items=40, max_seq_len=10, embed_dim=32, num_heads=2,
                 num_blocks=2, dropout=0.0, use_temporal_bias=True)
    params = convert_hstu_state_dict(rm.state_dict())
    out = model.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                      timestamps=jnp.asarray(ts, jnp.int32))
    np.testing.assert_allclose(np.asarray(out.logits),
                               ref_logits.numpy(), atol=3e-4, rtol=1e-3)
