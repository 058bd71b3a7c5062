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


def _install_reference_package():
    """Make ``import genrec.models.rqvae`` resolve against the read-only
    reference tree, with a stub ``gin`` module (gin-config is not installed).
    Test-scaffolding only — no reference code is copied."""
    import sys
    import types

    if "gin" not in sys.modules:
        gin_stub = types.ModuleType("gin")

        def configurable(fn=None, **kw):
            return fn if fn is not None else (lambda f: f)

        gin_stub.configurable = configurable
        gin_stub.constants_from_enum = configurable
        gin_stub.REQUIRED = object()
        sys.modules["gin"] = gin_stub

    base = os.path.dirname(REF)
    for pkg, path in [("genrec", base),
                      ("genrec.modules", os.path.join(base, "modules")),
                      ("genrec.models", os.path.join(base, "models"))]:
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = [path]
            sys.modules[pkg] = m


def test_rqvae_semantic_ids_match_reference():
    from genrec_tpu.interop import convert_rqvae_state_dict
    from genrec_tpu.models.rqvae import RqVae

    _install_reference_package()
    from genrec.models import rqvae as ref

    torch.manual_seed(3)
    rm = ref.RqVae(input_dim=24, embed_dim=8, hidden_dims=[16],
                   codebook_size=12, codebook_kmeans_init=False,
                   n_layers=3, n_cat_features=0)
    rm.eval()
    rng = np.random.default_rng(3)
    x = rng.normal(size=(16, 24)).astype(np.float32)
    with torch.no_grad():
        ref_out = rm.get_semantic_ids(torch.as_tensor(x))

    model = RqVae(input_dim=24, embed_dim=8, hidden_dims=(16,),
                  codebook_size=12, n_layers=3, n_cat_features=0)
    params = convert_rqvae_state_dict(rm.state_dict())
    out = model.apply({"params": params}, jnp.asarray(x),
                      method=RqVae.get_semantic_ids, train=False)

    np.testing.assert_array_equal(np.asarray(out.sem_ids),
                                  ref_out.sem_ids.numpy())
    np.testing.assert_allclose(np.asarray(out.quantize_loss),
                               ref_out.quantize_loss.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_tiger_forward_matches_reference():
    from genrec_tpu.interop import convert_tiger_state_dict
    from genrec_tpu.models.tiger import Tiger

    _install_reference_package()
    from genrec.models import tiger as ref

    torch.manual_seed(4)
    rm = ref.Tiger(embedding_dim=16, attn_dim=32, dropout=0.0, num_heads=4,
                   n_layers=4, num_item_embeddings=8,
                   num_user_embeddings=20, sem_id_dim=3)
    rm.eval()
    rng = np.random.default_rng(4)
    B, L, C = 3, 4, 3
    user = rng.integers(0, 100, B).astype(np.int64)
    items = rng.integers(0, 8, (B, L * C)).astype(np.int64)
    types = np.tile(np.arange(C), (B, L)).astype(np.int64)
    tgt = rng.integers(0, 8, (B, C)).astype(np.int64)
    tgt_types = np.tile(np.arange(C), (B, 1)).astype(np.int64)
    mask = np.ones((B, L * C), np.int64)
    mask[0, -3:] = 0
    with torch.no_grad():
        ref_out = rm(torch.as_tensor(user)[:, None], torch.as_tensor(items),
                     torch.as_tensor(types), torch.as_tensor(tgt),
                     torch.as_tensor(tgt_types), torch.as_tensor(mask))

    model = Tiger(embedding_dim=16, attn_dim=32, dropout=0.0, num_heads=4,
                  n_layers=4, num_item_embeddings=8, num_user_embeddings=20,
                  sem_id_dim=3)
    params = convert_tiger_state_dict(rm.state_dict())
    out = model.apply({"params": params}, jnp.asarray(user, jnp.int32),
                      jnp.asarray(items, jnp.int32),
                      jnp.asarray(types, jnp.int32),
                      jnp.asarray(tgt, jnp.int32),
                      jnp.asarray(tgt_types, jnp.int32),
                      jnp.asarray(mask, bool))

    np.testing.assert_allclose(np.asarray(out.logits),
                               ref_out.logits.numpy(), atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(float(out.loss), float(ref_out.loss),
                               rtol=1e-4)
