"""LCRec (tokenizer, LLM backbone, constrained generation, tasks) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genrec_tpu.models.lcrec import LCRec, WordTokenizer
from genrec_tpu.models.llm import CausalLM, resize_token_embeddings


def test_word_tokenizer_roundtrip_special_tokens():
    tok = WordTokenizer(base_vocab=1000)
    tok.add_special_tokens(["<C0_1>", "<C1_7>"])
    ids = tok.encode("predict next <C0_1><C1_7> done")
    assert tok.special["<C0_1>"] in ids
    assert tok.special["<C1_7>"] in ids
    text = tok.decode(ids)
    assert "<C0_1>" in text and "<C1_7>" in text
    # deterministic across instances
    tok2 = WordTokenizer(base_vocab=1000)
    assert tok2.encode("predict next") == ids[:2]


def test_tokenizer_save_load(tmp_path):
    tok = WordTokenizer(base_vocab=500)
    tok.add_special_tokens(["<C0_0>", "<C0_1>"])
    tok.save(str(tmp_path / "tok.json"))
    tok2 = WordTokenizer.load(str(tmp_path / "tok.json"))
    assert tok2.special == tok.special
    assert len(tok2) == len(tok)


def test_causal_lm_loss_and_label_masking():
    model = CausalLM(vocab_size=50, d_model=32, n_layers=1, n_heads=4,
                     n_kv_heads=2, ff_dim=64, max_len=16)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 50, (2, 8)),
                      jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids)["params"]
    labels = ids.at[:, :4].set(-100)
    out = model.apply({"params": params}, ids, labels=labels)
    assert np.isfinite(float(out.loss))
    # fully-masked labels -> zero loss (0/max(0,1))
    out2 = model.apply({"params": params}, ids,
                       labels=jnp.full_like(ids, -100))
    assert float(out2.loss) == 0.0


def test_causal_lm_causality():
    model = CausalLM(vocab_size=50, d_model=32, n_layers=1, n_heads=4,
                     n_kv_heads=4, ff_dim=64, max_len=16)
    ids = jnp.asarray(np.random.default_rng(1).integers(1, 50, (1, 8)),
                      jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids)["params"]
    l1 = model.apply({"params": params}, ids).logits
    l2 = model.apply({"params": params}, ids.at[0, -1].set(3)).logits
    np.testing.assert_allclose(np.asarray(l1[0, :-1]),
                               np.asarray(l2[0, :-1]), atol=1e-4)


def test_resize_token_embeddings():
    model = CausalLM(vocab_size=50, d_model=16, n_layers=1, n_heads=2,
                     n_kv_heads=2, ff_dim=32)
    ids = jnp.ones((1, 4), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids)["params"]
    new = resize_token_embeddings(params, 60, jax.random.PRNGKey(1))
    assert new["wte"].shape == (60, 16)
    np.testing.assert_allclose(np.asarray(new["wte"][:50]),
                               np.asarray(params["wte"]))


@pytest.fixture(scope="module")
def tiny_lcrec():
    model = LCRec(d_model=32, n_layers=1, n_heads=4, n_kv_heads=2,
                  ff_dim=64, base_vocab=500, max_len=64,
                  num_codebooks=3, codebook_size=8)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_lcrec_constrained_generation(tiny_lcrec):
    model, params = tiny_lcrec
    gen = model.make_generate_topk(num_beams=4)
    prompt = model.tokenizer.encode("history 1. <C0_1><C1_2><C2_3> next:")
    L = 16
    ids = np.zeros((2, L), np.int32)
    mask = np.zeros((2, L), np.int32)
    ids[:, L - len(prompt):] = prompt
    mask[:, L - len(prompt):] = 1
    out = gen(params, jnp.asarray(ids), jnp.asarray(mask))
    assert out.sem_ids.shape == (2, 4, 3)
    sem = np.asarray(out.sem_ids)
    # constrained to the per-level code alphabet
    assert sem.min() >= 0 and sem.max() < 8
    # beams sorted by logp and distinct
    lp = np.asarray(out.log_probas)
    assert (np.diff(lp, axis=1) <= 1e-5).all()
    for b in range(2):
        tups = [tuple(r) for r in sem[b]]
        assert len(set(tups)) == len(tups)


def test_lcrec_sft_tokenize(tiny_lcrec):
    model, _ = tiny_lcrec
    tok = model.tokenize_sft("### Instruction: recommend\n### Response:",
                             "<C0_1><C1_2><C2_3>")
    assert tok["input_ids"][-1] == model.tokenizer.EOS
    p = tok["prompt_seq_length"]
    # response part is exactly the 3 codebook tokens + EOS
    assert len(tok["input_ids"]) - p == 4


def test_lcrec_save_load(tiny_lcrec, tmp_path):
    model, params = tiny_lcrec
    model.save_pretrained(str(tmp_path / "ckpt"), params)
    model2, params2 = LCRec.load_pretrained(str(tmp_path / "ckpt"))
    assert model2.num_codebooks == 3
    assert len(model2.tokenizer) == len(model.tokenizer)
    np.testing.assert_allclose(np.asarray(params2["wte"]),
                               np.asarray(params["wte"]))


def test_extract_sem_ids():
    assert LCRec.extract_sem_ids("<C0_5><C1_2><C2_9>", 3) == [5, 2, 9]
    assert LCRec.extract_sem_ids("junk <C0_5> only", 3) is None


def test_task_generator_tasks():
    from genrec_tpu.data.lcrec import LCRecTaskGenerator
    from genrec_tpu.data.synthetic import synthetic_corpus
    _, corpus = synthetic_corpus(n_items=100, n_users=30, n_clusters=8)
    sem_ids = np.random.default_rng(0).integers(0, 8, (100, 3))
    gen = LCRecTaskGenerator(corpus, sem_ids, max_seq_len=5)
    train = gen.generate("train")
    assert len(train) > 0
    tasks = {s["task"] for s in train}
    assert "seqrec" in tasks and len(tasks) >= 3
    ev = gen.generate("test", max_samples=10)
    assert all(s["task"] == "seqrec" for s in ev)
    # seqrec responses are exactly the target's code string
    s = next(x for x in train if x["task"] == "seqrec")
    assert s["prompt"].endswith("### Response:")
    assert s["response"].startswith("<C0_")


def test_lora_adapters_and_freezing():
    import optax
    from genrec_tpu.models.llm import CausalLM, lora_param_mask
    model = CausalLM(vocab_size=50, d_model=32, n_layers=1, n_heads=4,
                     n_kv_heads=2, ff_dim=64, max_len=16, lora_rank=4)
    ids = jnp.ones((2, 8), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids)["params"]
    mask = lora_param_mask(params)
    leaves = jax.tree_util.tree_leaves(mask)
    assert any(leaves) and not all(leaves)
    # lora_b starts at zero -> output equals a lora-free model's structure
    out = model.apply({"params": params}, ids, labels=ids)
    assert np.isfinite(float(out.loss))

    # frozen base: after optimizer steps only lora params change
    from genrec_tpu.models.llm import lora_label_fn
    tx = optax.multi_transform(
        {"train": optax.adam(1e-2), "freeze": optax.set_to_zero()},
        lora_label_fn)
    state = tx.init(params)

    def lf(p):
        return model.apply({"params": p}, ids, labels=ids).loss

    g = jax.grad(lf)(params)
    updates, _ = tx.update(g, state, params)
    new_params = optax.apply_updates(params, updates)
    base_kernel = params["layer_0"]["q"]["base"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(new_params["layer_0"]["q"]["base"]["kernel"]),
        np.asarray(base_kernel))
    # lora_b starts at 0 so it has nonzero grads (lora_a's grad is 0 on the
    # first step since it multiplies b=0)
    assert not np.allclose(
        np.asarray(new_params["layer_0"]["q"]["lora_b"]),
        np.asarray(params["layer_0"]["q"]["lora_b"]))


def test_lora_label_fn_rejects_lora_free_model():
    from genrec_tpu.models.llm import CausalLM, lora_label_fn
    model = CausalLM(vocab_size=50, d_model=16, n_layers=1, n_heads=2,
                     n_kv_heads=2, ff_dim=32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.ones((1, 4), jnp.int32))["params"]
    with pytest.raises(ValueError, match="no .*lora"):
        lora_label_fn(params)


def test_lcrec_kv_cache_matches_cacheless(tiny_lcrec):
    """The KV-cached beam decode (default) must reproduce the cacheless
    oracle exactly: same beams, same token choices, matching scores
    (VERDICT round-1 task #3 contract)."""
    model, params = tiny_lcrec
    prompt = model.tokenizer.encode("user liked <C0_1><C1_2><C2_3> and "
                                    "<C0_4><C1_5><C2_6> predict next:")
    L = 24
    ids = np.zeros((3, L), np.int32)
    mask = np.zeros((3, L), np.int32)
    for b, cut in enumerate([0, 3, 7]):  # varying left-padding per row
        p = prompt[cut:]
        ids[b, L - len(p):] = p
        mask[b, L - len(p):] = 1
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    gen_c = model.make_generate_topk(num_beams=4, use_cache=True)
    gen_u = model.make_generate_topk(num_beams=4, use_cache=False)
    out_c = gen_c(params, ids, mask)
    out_u = gen_u(params, ids, mask)
    np.testing.assert_array_equal(np.asarray(out_c.sem_ids),
                                  np.asarray(out_u.sem_ids))
    np.testing.assert_allclose(np.asarray(out_c.log_probas),
                               np.asarray(out_u.log_probas),
                               rtol=1e-4, atol=1e-4)


def test_lcrec_kv_cache_matches_cacheless_with_trie(tiny_lcrec):
    model, params = tiny_lcrec
    rng = np.random.default_rng(0)
    valid = np.unique(rng.integers(0, 8, (30, 3)), axis=0)
    prompt = model.tokenizer.encode("history <C0_1><C1_2><C2_3> next:")
    L = 16
    ids = np.zeros((2, L), np.int32)
    mask = np.zeros((2, L), np.int32)
    ids[:, L - len(prompt):] = prompt
    mask[:, L - len(prompt):] = 1
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    gen_c = model.make_generate_topk(num_beams=4, valid_item_ids=valid,
                                     use_cache=True)
    gen_u = model.make_generate_topk(num_beams=4, valid_item_ids=valid,
                                     use_cache=False)
    out_c = gen_c(params, ids, mask)
    out_u = gen_u(params, ids, mask)
    np.testing.assert_array_equal(np.asarray(out_c.sem_ids),
                                  np.asarray(out_u.sem_ids))
    vset = {tuple(r) for r in valid}
    for row in np.asarray(out_c.sem_ids).reshape(-1, 3):
        assert tuple(row) in vset


def test_causallm_fused_softmax_matches_fallback():
    """The fused-softmax TPU path in LlmBlock (exercised via the pallas
    interpreter on CPU) must match the plain XLA softmax path, including
    left padding and GQA."""
    import genrec_tpu.kernels.attention as fattn
    model = CausalLM(vocab_size=64, d_model=32, n_layers=2, n_heads=4,
                     n_kv_heads=2, ff_dim=48)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 64, (3, 10)), jnp.int32)
    mask = np.ones((3, 10), np.int32)
    mask[0, :4] = 0
    mask[2, :7] = 0
    mask = jnp.asarray(mask)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids)["params"]
    out_plain = model.apply({"params": params}, ids, attention_mask=mask)
    fattn.INTERPRET = True
    try:
        out_fused = model.apply({"params": params}, ids,
                                attention_mask=mask)
    finally:
        fattn.INTERPRET = False
    real = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(out_fused.logits)[real],
                               np.asarray(out_plain.logits)[real],
                               rtol=2e-5, atol=2e-5)


def test_generate_item_eval_samples():
    """Per-item eval enumeration for the grounding tasks (reference
    amazon_lcrec.py:393-429: catalog x {title, desc, combined})."""
    from genrec_tpu.data.lcrec import LCRecTaskGenerator
    from genrec_tpu.data.synthetic import synthetic_corpus
    _, corpus = synthetic_corpus(n_items=100, n_users=30, n_clusters=8)
    sem_ids = np.random.default_rng(0).integers(0, 8, (100, 3))
    gen = LCRecTaskGenerator(corpus, sem_ids, max_seq_len=5)
    i2x = gen.generate_item_eval("item2index", max_items=5)
    assert len(i2x) == 15  # 5 items x 3 subtypes
    assert all(s["task"] == "item2index" for s in i2x)
    assert {s["subtype"] for s in i2x} == {"title", "desc", "combined"}
    # the response is the item's code string; targets carry its codes
    assert i2x[0]["response"] == "".join(
        f"<C{c}_{int(v)}>" for c, v in enumerate(sem_ids[0]))
    assert i2x[0]["target_sem_ids"] == sem_ids[0].tolist()
    x2i = gen.generate_item_eval("index2item", max_items=2)
    assert len(x2i) == 6
    # index2item responses are text (title/desc), never code tokens
    assert all("<C0_" not in s["response"] for s in x2i)
    with pytest.raises(ValueError):
        gen.generate_item_eval("seqrec")


def test_make_generate_text_greedy(tiny_lcrec):
    """Free-running greedy decode: step 0 equals the prefill argmax, and
    every row goes silent (pad) after its first EOS."""
    model, params = tiny_lcrec
    gen = model.make_generate_text(max_new_tokens=8)
    prompt = model.tokenizer.encode("describe <C0_1><C1_2><C2_3> please")
    L = 12
    ids = np.zeros((2, L), np.int32)
    mask = np.zeros((2, L), np.int32)
    ids[:, L - len(prompt):] = prompt
    mask[:, L - len(prompt):] = 1
    toks = np.asarray(gen(params, jnp.asarray(ids), jnp.asarray(mask)))
    assert toks.shape == (2, 8)
    # greedy step 0 == argmax of the prefill logits
    last, *_ = model.model.apply({"params": params}, jnp.asarray(ids),
                                 jnp.asarray(mask), L + 8,
                                 method=CausalLM.prefill)
    np.testing.assert_array_equal(toks[:, 0],
                                  np.asarray(jnp.argmax(last, axis=-1)))
    eos, pad = model.tokenizer.eos_token_id, model.tokenizer.pad_token_id
    for r in range(2):
        hits = np.where(toks[r] == eos)[0]
        if hits.size:
            assert (toks[r, hits[0] + 1:] == pad).all()


def test_lcrec_trainer_eval_tasks_e2e(tmp_path):
    """evaluate() scores all three reference task sections
    (trainers/lcrec_trainer.py:131-239): seqrec beam R@K, item2index
    greedy-constrained exact/per-codebook, index2item text match."""
    from genrec_tpu.configlib import gin
    from genrec_tpu.trainers.lcrec_trainer import train
    rng = np.random.default_rng(0)
    sem_ids = rng.integers(0, 16, (2000, 3))
    gin.parse_config("""
        train.epochs = 1
        train.batch_size = 8
        train.max_len = 96
        train.d_model = 32
        train.n_layers = 1
        train.n_heads = 4
        train.n_kv_heads = 2
        train.ff_dim = 64
        train.base_vocab = 1000
        train.num_codebooks = 3
        train.codebook_size = 16
        train.dataset_type = "synthetic"
        train.max_seq_len = 6
        train.num_beams = 4
        train.max_train_samples = 16
        train.max_eval_samples = 8
        train.eval_tasks = ("seqrec", "item2index", "index2item")
        train.eval_max_items_per_task = 4
        train.wandb_logging = False
    """)
    gin.bind_parameter("train.save_dir_root", str(tmp_path))
    gin.bind_parameter("train.sem_ids_table", sem_ids)
    m = train()
    assert "Recall@10" in m
    assert 0.0 <= m["item2index_exact"] <= 1.0
    for c in range(3):
        assert 0.0 <= m[f"item2index_c{c}"] <= 1.0
    assert 0.0 <= m["index2item_match"] <= 1.0
