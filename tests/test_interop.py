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


# ---------------------------------------------------------------------------
# HF Qwen2 → CausalLM (VERDICT round-1 task #2)
# ---------------------------------------------------------------------------

def test_qwen2_converter_logits_parity():
    """Converted random-init HF Qwen2 weights produce matching logits,
    including under left padding (the LCRec generate layout)."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config
    from transformers.models.qwen2 import Qwen2ForCausalLM

    cfg = Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=1000000.0,
        tie_word_embeddings=True, attention_dropout=0.0)
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(cfg).eval()

    from genrec_tpu.interop import convert_qwen2_state_dict, \
        qwen2_model_kwargs
    from genrec_tpu.models.llm import CausalLM
    kwargs = qwen2_model_kwargs(cfg)
    model = CausalLM(**kwargs)
    params = convert_qwen2_state_dict(hf.state_dict(),
                                      tie_embeddings=kwargs["tie_embeddings"])

    rng = np.random.default_rng(0)
    B, L = 3, 12
    ids = rng.integers(0, 128, (B, L))
    mask = np.ones((B, L), np.int64)
    mask[0, :4] = 0   # left padding
    mask[2, :7] = 0
    ids = ids * mask  # pad positions → token 0

    with torch.no_grad():
        hf_logits = hf(input_ids=torch.tensor(ids),
                       attention_mask=torch.tensor(mask)).logits.numpy()
    out = model.apply({"params": params}, jnp.asarray(ids, jnp.int32),
                      attention_mask=jnp.asarray(mask, jnp.int32))
    ours = np.asarray(out.logits)
    # compare on real (unpadded) positions only — HF computes positions for
    # pad slots differently, but they never contribute to loss or decoding
    real = mask.astype(bool)
    np.testing.assert_allclose(ours[real], hf_logits[real],
                               rtol=2e-4, atol=2e-4)


def test_qwen2_converter_untied_head():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config
    from transformers.models.qwen2 import Qwen2ForCausalLM
    cfg = Qwen2Config(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=32, tie_word_embeddings=False)
    torch.manual_seed(1)
    hf = Qwen2ForCausalLM(cfg).eval()
    from genrec_tpu.interop import convert_qwen2_state_dict, \
        qwen2_model_kwargs
    from genrec_tpu.models.llm import CausalLM
    kwargs = qwen2_model_kwargs(cfg)
    model = CausalLM(**kwargs)
    params = convert_qwen2_state_dict(hf.state_dict(), tie_embeddings=False)
    ids = np.random.default_rng(2).integers(0, 64, (2, 9))
    with torch.no_grad():
        hf_logits = hf(input_ids=torch.tensor(ids)).logits.numpy()
    out = model.apply({"params": params}, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(out.logits), hf_logits,
                               rtol=2e-4, atol=2e-4)


def test_qwen2_lora_injection_is_identity():
    """inject_lora_params(rank) must keep the model numerically identical
    (lora_b starts at zero) while creating trainable adapters."""
    from genrec_tpu.interop import convert_qwen2_state_dict, \
        inject_lora_params
    from genrec_tpu.models.llm import CausalLM, lora_param_mask
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config
    from transformers.models.qwen2 import Qwen2ForCausalLM
    cfg = Qwen2Config(vocab_size=64, hidden_size=32, intermediate_size=48,
                      num_hidden_layers=1, num_attention_heads=2,
                      num_key_value_heads=2, tie_word_embeddings=True)
    torch.manual_seed(3)
    hf = Qwen2ForCausalLM(cfg)
    params = convert_qwen2_state_dict(hf.state_dict())
    base = CausalLM(vocab_size=64, d_model=32, n_layers=1, n_heads=2,
                    n_kv_heads=2, ff_dim=48)
    lora = CausalLM(vocab_size=64, d_model=32, n_layers=1, n_heads=2,
                    n_kv_heads=2, ff_dim=48, lora_rank=4)
    lp = inject_lora_params(params, 4, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.default_rng(4).integers(0, 64, (2, 7)),
                      jnp.int32)
    out_b = base.apply({"params": params}, ids)
    out_l = lora.apply({"params": lp}, ids)
    np.testing.assert_allclose(np.asarray(out_l.logits),
                               np.asarray(out_b.logits), rtol=1e-5,
                               atol=1e-5)
    mask = lora_param_mask(lp)
    n_adapters = sum(bool(x) for x in jax.tree_util.tree_leaves(mask))
    assert n_adapters == 14  # 7 projections × (a, b) × 1 layer


def test_qwen2_backbone_artifact_end_to_end(tmp_path):
    """Full flow: local HF checkpoint dir → convert_qwen2_checkpoint →
    LCRec(backbone_path=...) with real subword tokenizer, pretrained
    weights, token surgery and constrained generation."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config
    from transformers.models.qwen2 import Qwen2ForCausalLM
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    # tiny BPE tokenizer trained offline
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=200, special_tokens=["<unk>", "<eos>"])
    tok.train_from_iterator(
        ["the user liked item", "recommend the next item",
         "### Instruction: given history predict", "### Response:"],
        trainer)
    vocab = tok.get_vocab_size()
    eos_id = tok.token_to_id("<eos>")

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    tok.save(str(hf_dir / "tokenizer.json"))
    cfg = Qwen2Config(
        vocab_size=vocab, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=1000000.0,
        tie_word_embeddings=True, eos_token_id=eos_id)
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(cfg)
    cfg.save_pretrained(str(hf_dir))
    from safetensors.torch import save_file
    sd = {k: v.contiguous() for k, v in hf.state_dict().items()
          if k != "lm_head.weight"}   # tied: HF clones it
    save_file(sd, str(hf_dir / "model.safetensors"))

    from genrec_tpu.interop import convert_qwen2_checkpoint
    out_dir = tmp_path / "backbone"
    conv_cfg = convert_qwen2_checkpoint(str(hf_dir), str(out_dir))
    assert conv_cfg["model"]["vocab_size"] == vocab
    assert conv_cfg["model"]["rope_theta"] == 1000000.0

    from genrec_tpu.models.lcrec import LCRec, HFTokenizerAdapter
    model = LCRec(backbone_path=str(out_dir), num_codebooks=3,
                  codebook_size=4, max_len=64)
    assert isinstance(model.tokenizer, HFTokenizerAdapter)
    assert len(model.tokenizer) == vocab + 12
    params = model.init_params(jax.random.PRNGKey(0))
    # pretrained rows preserved through the resize
    np.testing.assert_allclose(
        np.asarray(params["wte"][:vocab]),
        hf.model.embed_tokens.weight.detach().numpy(), rtol=1e-6)

    # subword SFT round trip + constrained generate
    tokd = model.tokenize_sft("### Instruction: given history predict "
                              "### Response:", "<C0_1><C1_2><C2_3>")
    assert tokd["input_ids"][-1] == eos_id
    assert len(tokd["input_ids"]) - tokd["prompt_seq_length"] == 4
    gen = model.make_generate_topk(num_beams=3)
    prompt = model.tokenizer.encode("recommend the next item")
    L = 12
    ids = np.zeros((2, L), np.int32)
    mask = np.zeros((2, L), np.int32)
    ids[:, L - len(prompt):] = prompt
    mask[:, L - len(prompt):] = 1
    out = gen(params, jnp.asarray(ids), jnp.asarray(mask))
    sem = np.asarray(out.sem_ids)
    assert sem.shape == (2, 3, 3) and sem.min() >= 0 and sem.max() < 4

    # persistence round-trips the adapter tokenizer
    model.save_pretrained(str(tmp_path / "saved"), params)
    model2, params2 = LCRec.load_pretrained(str(tmp_path / "saved"))
    assert isinstance(model2.tokenizer, HFTokenizerAdapter)
    assert model2.tokenizer.special == model.tokenizer.special
    np.testing.assert_allclose(np.asarray(params2["wte"]),
                               np.asarray(params["wte"]))


def test_qwen2_backbone_lora_starts_identical(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config
    from transformers.models.qwen2 import Qwen2ForCausalLM
    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    cfg = Qwen2Config(vocab_size=64, hidden_size=32, intermediate_size=48,
                      num_hidden_layers=1, num_attention_heads=2,
                      num_key_value_heads=2, tie_word_embeddings=True,
                      eos_token_id=2)
    torch.manual_seed(1)
    hf = Qwen2ForCausalLM(cfg)
    cfg.save_pretrained(str(hf_dir))
    from safetensors.torch import save_file
    save_file({k: v.contiguous() for k, v in hf.state_dict().items()
               if k != "lm_head.weight"},
              str(hf_dir / "model.safetensors"))
    from genrec_tpu.interop import convert_qwen2_checkpoint
    out_dir = tmp_path / "bb"
    convert_qwen2_checkpoint(str(hf_dir), str(out_dir))
    from genrec_tpu.models.lcrec import LCRec
    base = LCRec(backbone_path=str(out_dir), num_codebooks=2,
                 codebook_size=4, max_len=32)
    lora = LCRec(backbone_path=str(out_dir), num_codebooks=2,
                 codebook_size=4, max_len=32, lora_rank=2)
    pb = base.init_params(jax.random.PRNGKey(5))
    pl = lora.init_params(jax.random.PRNGKey(5))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 6)),
                      jnp.int32)
    ob = base.apply(pb, ids)
    ol = lora.apply(pl, ids)
    np.testing.assert_allclose(np.asarray(ol.logits),
                               np.asarray(ob.logits), rtol=1e-5, atol=1e-5)


def test_cobra_forward_matches_reference():
    """Converted reference COBRA weights produce matching losses and
    beam_fusion outputs (r4: the head-to-head exposed the empty-memory
    cross-attn norm; this pins the whole forward)."""
    import torch
    import numpy as np
    import jax.numpy as jnp
    from genrec_tpu.interop import convert_cobra_state_dict
    from genrec_tpu.models.cobra import Cobra, beam_fusion
    import sys
    sys.path.insert(0, "/root/repo/scripts")
    from scripts.reference_parity import install_reference
    install_reference()
    from genrec.models.cobra import Cobra as RefCobra

    torch.manual_seed(0)
    kw = dict(encoder_n_layers=1, encoder_hidden_dim=32,
              encoder_num_heads=2, encoder_vocab_size=120,
              id_vocab_size=16, n_codebooks=3, d_model=32,
              decoder_n_layers=2, decoder_num_heads=2)
    rm = RefCobra(max_len=64, queue_size=8, temperature=0.2,
                  encoder_type="light", **kw).eval()
    model = Cobra(max_len=64, temperature=0.2, decoder_dropout=0.0, **kw)
    params = convert_cobra_state_dict(rm.state_dict())

    rng = np.random.default_rng(0)
    B, T, Lt, C, V = 3, 4, 6, 3, 16
    pad = V * C
    ids = rng.integers(0, V, (B, T * C)).astype(np.int64)
    ids[0, -C:] = pad                       # one row with a padded item
    toks = rng.integers(1, 120, (B, T, Lt)).astype(np.int64)

    with torch.no_grad():
        ref = rm(input_ids=torch.as_tensor(ids),
                 encoder_input_ids=torch.as_tensor(toks))
    out = model.apply({"params": params}, jnp.asarray(ids),
                      jnp.asarray(toks), deterministic=True)
    np.testing.assert_allclose(float(out.loss_sparse),
                               float(ref.loss_sparse), rtol=2e-4)
    np.testing.assert_allclose(float(out.loss_dense),
                               float(ref.loss_dense), rtol=2e-4)

    # beam_fusion end to end on the same weights
    item_sem = rng.integers(0, V, (40, C)).astype(np.int64)
    item_vecs = rng.normal(size=(40, kw["d_model"])).astype(np.float32)
    with torch.no_grad():
        rg = rm.beam_fusion(
            input_ids=torch.as_tensor(ids),
            encoder_input_ids=torch.as_tensor(toks),
            item_dense_vecs=torch.as_tensor(item_vecs),
            item_sem_ids=torch.as_tensor(item_sem),
            n_candidates=5, n_beam=8, alpha=0.5)
    jg = beam_fusion(model, params, jnp.asarray(ids), jnp.asarray(toks),
                     jnp.asarray(item_vecs), jnp.asarray(item_sem),
                     n_candidates=5, n_beam=8, alpha=0.5)
    # exact equality on FULL-LENGTH rows (1, 2). Row 0 has a padded item:
    # there the reference reads its c>0 "last position" at (valid_count-1),
    # a mid-pad slot that causally cannot see the beam's own prefix
    # (cobra.py:620-623) — our generate indexes the true partial-token
    # position instead (see models/cobra.py run()), a deliberate
    # correctness deviation for padded rows.
    assert np.array_equal(np.asarray(jg.item_ids)[1:],
                          rg.item_ids.numpy()[1:])
