"""NoteLLM (Query2Embedding) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from genrec_tpu.models.notellm import Query2Embedding, compute_metrics


def _make(alpha=0.0):
    model = Query2Embedding(vocab_size=100, emb_token_id=5, d_model=32,
                            n_layers=1, n_heads=4, n_kv_heads=2, ff_dim=64,
                            max_len=32, alpha=alpha)
    rng = np.random.default_rng(0)
    ids = rng.integers(6, 100, (8, 12)).astype(np.int32)
    ids[:, -1] = 5  # [EMB] token at the end
    ids = jnp.asarray(ids)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids)["params"]
    return model, params, ids


def test_forward_and_embeddings():
    model, params, ids = _make()
    out = model.apply({"params": params}, ids)
    assert out.embeddings.shape == (8, 32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.embeddings), axis=-1), 1.0, rtol=1e-4)
    assert np.isfinite(float(out.loss))
    assert float(out.generation_loss) == 0.0


def test_embedding_taken_at_emb_token():
    model, params, ids = _make()
    out1 = model.apply({"params": params}, ids)
    # moving [EMB] earlier changes the embedding
    ids2 = np.asarray(ids).copy()
    ids2[:, -1] = 7
    ids2[:, 5] = 5
    out2 = model.apply({"params": params}, jnp.asarray(ids2))
    assert not np.allclose(np.asarray(out1.embeddings),
                           np.asarray(out2.embeddings))


def test_generation_loss_mixing():
    model, params, ids = _make(alpha=0.5)
    labels = ids.at[:, :6].set(-100)
    out = model.apply({"params": params}, ids, category_labels=labels)
    assert float(out.generation_loss) > 0
    np.testing.assert_allclose(
        float(out.loss),
        0.5 * float(out.contrastive_loss) + 0.5 * float(out.generation_loss),
        rtol=1e-5)


def test_contrastive_training_improves_retrieval():
    import optax
    model, params, ids = _make()
    tx = optax.adam(3e-3)
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        def lf(p):
            return model.apply({"params": p}, ids).loss
        loss, g = jax.value_and_grad(lf)(p)
        u, s = tx.update(g, s)
        return optax.apply_updates(p, u), s, loss

    p = params
    first = None
    for i in range(30):
        p, state, loss = step(p, state)
        if first is None:
            first = float(loss)
    assert float(loss) < first

    out = model.apply({"params": p}, ids)
    emb = np.asarray(out.embeddings)
    m = compute_metrics(emb[0::2], emb[1::2], ks=(1,))
    assert m["acc@1"] >= 0.5  # pairs should retrieve each other after training


def test_notellm_trainer_e2e(tmp_path):
    from genrec_tpu.configlib import gin
    from genrec_tpu.trainers.notellm_trainer import train
    gin.parse_config("""
        train.steps = 30
        train.batch_pairs = 16
        train.vocab_size = 500
        train.seq_len = 16
        train.d_model = 32
        train.n_layers = 1
        train.n_heads = 4
        train.n_kv_heads = 2
        train.ff_dim = 64
        train.eval_pairs = 32
        train.eval_every = 30
        train.wandb_logging = False
    """)
    gin.bind_parameter("train.save_dir_root", str(tmp_path))
    m = train()
    assert "acc@10" in m and 0.0 <= m["acc@10"] <= 1.0


def test_query2embedding_from_backbone(tmp_path):
    """NoteLLM on a converted Qwen2 backbone: pretrained rows preserved,
    [EMB] appended, forward + contrastive loss run."""
    import pytest
    pytest.importorskip("torch")
    import torch
    from transformers import Qwen2Config
    from transformers.models.qwen2 import Qwen2ForCausalLM
    from safetensors.torch import save_file

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    cfg = Qwen2Config(vocab_size=64, hidden_size=32, intermediate_size=48,
                      num_hidden_layers=1, num_attention_heads=2,
                      num_key_value_heads=2, tie_word_embeddings=True,
                      eos_token_id=2)
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(cfg)
    cfg.save_pretrained(str(hf_dir))
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()
               if k != "lm_head.weight"},
              str(hf_dir / "model.safetensors"))
    from genrec_tpu.interop import convert_qwen2_checkpoint
    bb = tmp_path / "bb"
    convert_qwen2_checkpoint(str(hf_dir), str(bb))

    from genrec_tpu.models.notellm import query2embedding_from_backbone
    model, params, emb_id = query2embedding_from_backbone(
        str(bb), jax.random.PRNGKey(0), max_len=32)
    assert emb_id == 64
    assert params["lm"]["wte"].shape == (65, 32)
    np.testing.assert_allclose(
        np.asarray(params["lm"]["wte"][:64]),
        hf.model.embed_tokens.weight.detach().numpy(), rtol=1e-6)
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 64, (4, 12)).astype(np.int32)
    ids[:, -1] = emb_id
    out = model.apply({"params": params}, jnp.asarray(ids))
    assert np.isfinite(float(out.loss))
    assert out.embeddings.shape == (4, 32)


def test_notellm_trainer_fsdp_e2e(tmp_path):
    """train.fsdp=True shards the backbone over the data axis."""
    import jax
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from genrec_tpu.configlib import gin
    from genrec_tpu.trainers.notellm_trainer import train
    gin.parse_config("""
        train.steps = 6
        train.batch_pairs = 8
        train.vocab_size = 512
        train.seq_len = 16
        train.d_model = 64
        train.n_layers = 1
        train.n_heads = 4
        train.n_kv_heads = 2
        train.ff_dim = 128
        train.eval_pairs = 16
        train.eval_every = 6
        train.fsdp = True
        train.wandb_logging = False
    """)
    gin.bind_parameter("train.save_dir_root", str(tmp_path))
    m = train()
    assert "acc@10" in m


def test_embed_cached_matches_full_forward():
    """Shared-prompt KV path == prompt-prepended full forward (the cache
    changes the compute schedule, not the function; reference
    notellm.py:20-41,144-156)."""
    model, params, ids = _make()
    P = 7
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(6, 100, (P,)).astype(np.int32))
    full = jnp.concatenate(
        [jnp.broadcast_to(prompt[None], (ids.shape[0], P)), ids], axis=1)
    e_full = model.apply({"params": params}, full,
                         method=Query2Embedding.embed)
    e_cached = model.apply({"params": params}, prompt, ids,
                           method=Query2Embedding.embed_cached)
    np.testing.assert_allclose(np.asarray(e_cached), np.asarray(e_full),
                               atol=2e-5)


def test_embed_cached_with_padding():
    """Rows with trailing pads pool the right [EMB] position on the
    cached path too."""
    model, params, ids = _make()
    ids2 = np.asarray(ids).copy()
    ids2[0, 8:] = 0          # trailing pads
    ids2[0, 7] = 5           # [EMB] just before the pads
    ids2 = jnp.asarray(ids2)
    P = 5
    prompt = jnp.asarray(
        np.random.default_rng(4).integers(6, 100, (P,)).astype(np.int32))
    full = jnp.concatenate(
        [jnp.broadcast_to(prompt[None], (ids2.shape[0], P)), ids2], axis=1)
    e_full = model.apply({"params": params}, full,
                         method=Query2Embedding.embed)
    e_cached = model.apply({"params": params}, prompt, ids2,
                           method=Query2Embedding.embed_cached)
    np.testing.assert_allclose(np.asarray(e_cached), np.asarray(e_full),
                               atol=2e-5)


def test_notellm_trainer_shared_prompt_kv(tmp_path):
    from genrec_tpu.configlib import gin
    from genrec_tpu.trainers.notellm_trainer import train
    gin.parse_config("""
        train.steps = 20
        train.batch_pairs = 8
        train.vocab_size = 500
        train.seq_len = 16
        train.d_model = 32
        train.n_layers = 1
        train.n_heads = 4
        train.n_kv_heads = 2
        train.ff_dim = 64
        train.eval_pairs = 16
        train.eval_every = 20
        train.shared_prompt_len = 8
        train.share_prompt_kv = True
        train.wandb_logging = False
    """)
    gin.bind_parameter("train.save_dir_root", str(tmp_path))
    m = train()
    assert "acc@10" in m and 0.0 <= m["acc@10"] <= 1.0
