"""LCRec SFT TRAINING with a genuine subword (BPE) vocabulary.

VERDICT r2 "next round" #8: the hashed WordTokenizer was the only path ever
*trained* through; the HFTokenizerAdapter was exercised for surgery +
generation only (tests/test_interop.py). Here a locally-trained HF
``tokenizers`` BPE flows through the full SFT stack: token surgery →
LCRecTaskGenerator SFT samples → prompt-masked collate → optimizer steps
(loss decreases) → trie-constrained decode, proving LCRec trains and
serves on a realistic subword vocab end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genrec_tpu.data.synthetic import make_catalog, make_interactions


@pytest.fixture(scope="module")
def bpe_tokenizer(tmp_path_factory):
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=300, special_tokens=["<pad>", "<unk>", "<eos>"])
    # train on text resembling the SFT template banks so encode() produces
    # genuine multi-token subword splits
    corpus_text = [
        "Below is an instruction that describes a task.",
        "### Instruction: The user has interacted with the following items.",
        "Predict the index of the next item the user will interact with.",
        "### Response: the item index is",
        "What is the title of the item with the given index?",
        "1. 2. 3. 4. 5. item_12 item_345 user likes beauty products",
    ]
    tok.train_from_iterator(corpus_text, trainer)
    path = tmp_path_factory.mktemp("bpe") / "tokenizer.json"
    tok.save(str(path))
    return str(path), tok.token_to_id("<eos>"), tok.token_to_id("<pad>")


def test_lcrec_sft_trains_on_bpe_vocab(bpe_tokenizer):
    import optax
    from genrec_tpu.data.lcrec import LCRecTaskGenerator
    from genrec_tpu.trainers.lcrec_trainer import sft_collate
    from genrec_tpu.models.lcrec import HFTokenizerAdapter, LCRec

    path, eos_id, pad_id = bpe_tokenizer
    adapter = HFTokenizerAdapter.from_file(path, eos_id, pad_id)
    base_vocab = len(adapter)
    assert base_vocab >= 100

    C, K = 3, 16
    model = LCRec(d_model=48, n_layers=2, n_heads=4, n_kv_heads=2,
                  ff_dim=96, base_vocab=base_vocab, max_len=192,
                  num_codebooks=C, codebook_size=K, tokenizer=adapter)
    # token surgery happened: <Ci_j> ids are contiguous per level, appended
    # after the BPE vocab
    assert len(model.tokenizer) == base_vocab + C * K
    assert model.tokenizer.special["<C0_0>"] == base_vocab
    assert model.tokenizer.special[f"<C{C-1}_{K-1}>"] == \
        base_vocab + C * K - 1

    # a real sentence must BPE-split into multiple subwords (not one hash
    # bucket per word, as the WordTokenizer did)
    ids = model.tokenizer.encode("Predict the index of the next item")
    assert len(ids) >= 5 and all(i < base_vocab for i in ids)

    # SFT data through the real pipeline
    catalog = make_catalog(n_items=60, emb_dim=8, n_clusters=4, seed=0)
    corpus = make_interactions(catalog, n_users=24, min_len=5, max_len=10,
                               seed=1)
    rng = np.random.default_rng(2)
    sem_ids = rng.integers(0, K, (60, C))
    gen = LCRecTaskGenerator(corpus, sem_ids, seed=3)
    samples = gen.generate("train", max_samples=64)
    assert len(samples) == 64
    batch = sft_collate(model, samples[:16], max_len=192)

    params = model.init_params(jax.random.PRNGKey(0))
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, ids, mask, labels):
        def loss_fn(p):
            return model.apply(p, ids, mask, labels).loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
            jnp.asarray(batch["labels"]))
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0] * 0.9, losses

    # constrained decode with the item trie on the trained params: every
    # emitted tuple must be a real catalog item
    decode = model.make_generate_topk(num_beams=4, valid_item_ids=sem_ids)
    prompt = model.tokenizer.encode(samples[0]["prompt"])[-64:]
    L = 64
    pids = np.zeros((2, L), np.int32)
    pmask = np.zeros((2, L), np.int32)
    pids[:, L - len(prompt):] = prompt
    pmask[:, L - len(prompt):] = 1
    out = decode(params, jnp.asarray(pids), jnp.asarray(pmask))
    beams = np.asarray(out.sem_ids)
    assert beams.shape == (2, 4, C)
    cat = {tuple(r) for r in sem_ids.tolist()}
    assert all(tuple(t) in cat for row in beams.tolist() for t in row)
