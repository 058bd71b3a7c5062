"""LCRec: LLM fine-tuning with collaborative semantic-ID tokens.

Parity target: ``/root/reference/genrec/models/lcrec.py`` — wraps a causal-LM
backbone + tokenizer, adds ``codebook_size × num_codebooks`` special tokens
``<Ci_j>`` and resizes embeddings (:48-60), SFT tokenization (prompt ids +
response ids + EOS, with the prompt length recorded for label masking,
:62-112), forward = causal-LM loss (:114-133), ``generate_topk`` = batched
beam search with per-level allowed-token filtering (:164-243), and
HF-`save_pretrained`-style persistence (:135-162).

Backbone substitution: the reference loads Qwen2.5-1.5B from the HF hub; this
environment has no downloads, so the backbone is the in-repo TPU-native
:class:`genrec_tpu.models.llm.CausalLM` plus a deterministic hashed word
tokenizer. The ``<Ci_j>`` tokens occupy a contiguous id range per level, so
the constrained decode is a logits slice per level — the reference's
``prefix_allowed_tokens_fn`` Python callback (trainers/lcrec_trainer.py:
87-128) becomes part of the compiled beam search.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from genrec_tpu.configlib import gin
from .llm import CausalLM, resize_token_embeddings


class WordTokenizer:
    """Deterministic hashed word-level tokenizer with special-token support.

    Layout: [0]=pad, [1]=bos, [2]=eos, [3]=unk, [4, base_vocab) hashed words,
    [base_vocab, base_vocab + n_special) added special tokens (``<Ci_j>``).
    """

    PAD, BOS, EOS, UNK = 0, 1, 2, 3
    _WORD_RE = re.compile(r"<[^<>\s]+>|\w+|[^\w\s]")

    def __init__(self, base_vocab: int = 30000):
        self.base_vocab = base_vocab
        self.special: Dict[str, int] = {}
        self._special_rev: Dict[int, str] = {}
        self._seen: Dict[int, str] = {}
        self.eos_token_id = self.EOS
        self.pad_token_id = self.PAD

    def __len__(self):
        return self.base_vocab + len(self.special)

    def add_special_tokens(self, tokens: List[str]) -> int:
        added = 0
        for t in tokens:
            if t not in self.special:
                tid = self.base_vocab + len(self.special)
                self.special[t] = tid
                self._special_rev[tid] = t
                added += 1
        return added

    def _word_id(self, word: str) -> int:
        from genrec_tpu.data.sequences import hash_user_id
        return 4 + hash_user_id(word.lower(), self.base_vocab - 4)

    def encode(self, text: str, add_eos: bool = False) -> List[int]:
        ids = []
        for tok in self._WORD_RE.findall(text):
            if tok in self.special:
                ids.append(self.special[tok])
            else:
                tid = self._word_id(tok)
                self._seen[tid] = tok
                ids.append(tid)
        if add_eos:
            ids.append(self.EOS)
        return ids

    def decode(self, ids) -> str:
        out = []
        for i in np.asarray(ids).reshape(-1).tolist():
            if i in self._special_rev:
                out.append(self._special_rev[i])
            elif i == self.EOS:
                break
            elif i in (self.PAD, self.BOS):
                continue
            else:
                out.append(self._seen.get(i, "<unk>"))
        return " ".join(out)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"base_vocab": self.base_vocab,
                       "special": self.special}, f)

    @classmethod
    def load(cls, path: str) -> "WordTokenizer":
        with open(path) as f:
            d = json.load(f)
        tok = cls(base_vocab=d["base_vocab"])
        for t in sorted(d["special"], key=d["special"].get):
            tok.add_special_tokens([t])
        return tok


class HFTokenizerAdapter:
    """Wraps a HuggingFace ``tokenizers.Tokenizer`` (tokenizer.json) behind
    the :class:`WordTokenizer` interface LCRec uses — real-subword encoding
    for a converted Qwen2 backbone (reference uses AutoTokenizer,
    ``/root/reference/genrec/models/lcrec.py:17-46``).
    """

    def __init__(self, tok, eos_token_id: int, pad_token_id: int = 0):
        self._tok = tok
        self.EOS = self.eos_token_id = eos_token_id
        self.PAD = self.pad_token_id = pad_token_id or 0
        self.BOS = -1   # Qwen2 uses no BOS
        self.special: Dict[str, int] = {}

    @classmethod
    def from_file(cls, path: str, eos_token_id: int,
                  pad_token_id: int = 0) -> "HFTokenizerAdapter":
        from tokenizers import Tokenizer
        return cls(Tokenizer.from_file(path), eos_token_id, pad_token_id)

    def __len__(self):
        return self._tok.get_vocab_size(with_added_tokens=True)

    def add_special_tokens(self, tokens: List[str]) -> int:
        from tokenizers import AddedToken
        added = self._tok.add_special_tokens(
            [AddedToken(t, special=True) for t in tokens])
        for t in tokens:
            self.special[t] = self._tok.token_to_id(t)
        return added

    def encode(self, text: str, add_eos: bool = False) -> List[int]:
        ids = self._tok.encode(text, add_special_tokens=False).ids
        if add_eos:
            ids.append(self.EOS)
        return ids

    def decode(self, ids) -> str:
        ids = [int(i) for i in np.asarray(ids).reshape(-1)]
        if self.EOS in ids:
            ids = ids[:ids.index(self.EOS)]
        return self._tok.decode(ids, skip_special_tokens=False)

    def save(self, path: str) -> None:
        self._tok.save(path)
        with open(path + ".meta", "w") as f:
            json.dump({"eos_token_id": self.EOS,
                       "pad_token_id": self.PAD,
                       "special": self.special}, f)

    @classmethod
    def load(cls, path: str) -> "HFTokenizerAdapter":
        with open(path + ".meta") as f:
            meta = json.load(f)
        inst = cls.from_file(path, meta["eos_token_id"],
                             meta["pad_token_id"])
        inst.special = {k: int(v) for k, v in meta["special"].items()}
        return inst


class LCRecGenerationOutput(NamedTuple):
    sem_ids: jnp.ndarray    # (B, K, C)
    log_probas: jnp.ndarray  # (B, K)


SEM_ID_PATTERN = re.compile(r"<C(\d+)_(\d+)>")


@gin.configurable
class LCRec:
    """Causal-LM + tokenizer wrapper with codebook-token surgery."""

    def __init__(self, d_model: int = 512, n_layers: int = 8,
                 n_heads: int = 8, n_kv_heads: int = 4, ff_dim: int = 1408,
                 base_vocab: int = 30000, max_len: int = 512,
                 num_codebooks: int = 0, codebook_size: int = 0,
                 lora_rank: int = 0, lora_alpha: float = 16.0,
                 remat: bool = False, backbone_path: str = "",
                 rope_theta: float = 10000.0, tie_embeddings: bool = True,
                 tokenizer=None, dtype=jnp.float32):
        """``backbone_path``: a converted-Qwen2 artifact directory
        (``interop.convert_qwen2_checkpoint``). When set, architecture dims
        come from the artifact (the d_model/... args are ignored), the
        tokenizer is the backbone's own subword tokenizer when shipped, and
        :meth:`init_params` loads + embedding-resizes the pretrained
        weights instead of random init — the reference's
        ``from_pretrained`` + token-surgery flow (lcrec.py:17-60)."""
        self._backbone_path = backbone_path
        self._backbone_cfg = None
        if backbone_path:
            from genrec_tpu.interop import QWEN2_BACKBONE_FORMAT
            with open(os.path.join(backbone_path, "config.json")) as f:
                bcfg = json.load(f)
            if bcfg.get("format") != QWEN2_BACKBONE_FORMAT:
                raise ValueError(f"not a qwen2 backbone artifact: "
                                 f"{backbone_path} ({bcfg.get('format')})")
            self._backbone_cfg = bcfg
            mk = bcfg["model"]
            d_model, n_layers = mk["d_model"], mk["n_layers"]
            n_heads, n_kv_heads = mk["n_heads"], mk["n_kv_heads"]
            ff_dim, base_vocab = mk["ff_dim"], mk["vocab_size"]
            rope_theta = mk.get("rope_theta", 10000.0)
            tie_embeddings = mk.get("tie_embeddings", True)
            tok_file = os.path.join(backbone_path, "tokenizer.json")
            if os.path.exists(tok_file):
                self.tokenizer = HFTokenizerAdapter.from_file(
                    tok_file, bcfg["eos_token_id"],
                    bcfg.get("pad_token_id") or 0)
            else:
                self.tokenizer = WordTokenizer(base_vocab=base_vocab)
        elif tokenizer is not None:
            # bring-your-own subword tokenizer (e.g. HFTokenizerAdapter on a
            # locally trained BPE) without a full backbone artifact
            self.tokenizer = tokenizer
            base_vocab = len(tokenizer)
        else:
            self.tokenizer = WordTokenizer(base_vocab=base_vocab)
        self.num_codebooks = num_codebooks
        self.codebook_size = codebook_size
        if num_codebooks and codebook_size:
            self.add_codebook_tokens(num_codebooks, codebook_size)
        self.model = CausalLM(
            vocab_size=len(self.tokenizer), d_model=d_model,
            n_layers=n_layers, n_heads=n_heads, n_kv_heads=n_kv_heads,
            ff_dim=ff_dim, max_len=max_len, rope_theta=rope_theta,
            tie_embeddings=tie_embeddings, lora_rank=lora_rank,
            lora_alpha=lora_alpha, remat=remat, dtype=dtype)
        self._config = dict(d_model=d_model, n_layers=n_layers,
                            n_heads=n_heads, n_kv_heads=n_kv_heads,
                            ff_dim=ff_dim, base_vocab=base_vocab,
                            max_len=max_len, num_codebooks=num_codebooks,
                            codebook_size=codebook_size,
                            lora_rank=lora_rank, lora_alpha=lora_alpha,
                            remat=remat, backbone_path=backbone_path,
                            rope_theta=rope_theta,
                            tie_embeddings=tie_embeddings)

    def add_codebook_tokens(self, num_codebooks: int,
                            codebook_size: int) -> None:
        """Register ``<Ci_j>`` tokens; ids are contiguous per level."""
        self.num_codebooks = num_codebooks
        self.codebook_size = codebook_size
        self.tokenizer.add_special_tokens(
            [f"<C{i}_{j}>" for i in range(num_codebooks)
             for j in range(codebook_size)])

    def level_token_range(self, level: int) -> tuple[int, int]:
        start = self.tokenizer.special[f"<C{level}_0>"]
        return start, start + self.codebook_size

    def init_params(self, rng: jax.Array):
        """Random init, or — with a backbone — load the converted Qwen2
        weights, grow the embedding table to cover the ``<Ci_j>`` tokens
        and (for ``lora_rank>0``) nest the projections under zero-init
        LoRA adapters, so the wrapped model starts numerically identical
        to the pretrained one."""
        if self._backbone_path:
            import orbax.checkpoint as ocp
            ckptr = ocp.StandardCheckpointer()
            params = ckptr.restore(os.path.join(
                os.path.abspath(self._backbone_path), "params"))
            rng, r1 = jax.random.split(rng)
            params = resize_token_embeddings(params, len(self.tokenizer), r1)
            if self.model.lora_rank > 0:
                from genrec_tpu.interop import inject_lora_params
                rng, r2 = jax.random.split(rng)
                params = inject_lora_params(params, self.model.lora_rank, r2)
            return params
        dummy = jnp.ones((1, 8), jnp.int32)
        return self.model.init({"params": rng}, dummy)["params"]

    def sem_ids_to_text(self, codes) -> str:
        return "".join(f"<C{i}_{int(c)}>" for i, c in enumerate(codes))

    def tokenize_sft(self, prompt: str, response: str = "") -> dict:
        prompt_ids = self.tokenizer.encode(prompt)
        response_ids = self.tokenizer.encode(response)
        input_ids = prompt_ids + response_ids + [self.tokenizer.EOS]
        return {"input_ids": input_ids,
                "prompt_seq_length": len(prompt_ids)}

    def apply(self, params, input_ids, attention_mask=None, labels=None):
        return self.model.apply({"params": params}, input_ids,
                                attention_mask=attention_mask, labels=labels)

    # -- constrained generation -------------------------------------------
    def make_generate_topk(self, num_beams: int = 10,
                           valid_item_ids=None, use_cache: bool = True):
        """jit-compiled constrained beam decode of C codebook tokens.

        The reference re-runs one HF forward per beam per step with a host
        callback filtering logits (lcrec.py:164-243) and relies on HF
        ``use_cache=True`` (trainers/lcrec_trainer.py:146); here each
        level's constraint is a static slice of the vocab, the whole search
        is one compiled program, and with ``use_cache`` (default) the prompt
        is prefilled ONCE into per-layer KV caches — each level then costs a
        single-token forward plus a beam-parent cache gather, instead of
        re-running the full growing prefix per level.

        ``valid_item_ids``: optional (N, C) catalog code table. When given,
        generation is additionally trie-constrained to *existing item
        tuples* (stronger than the reference's per-level-positional
        constraint — an extension, off by default for parity).

        ``use_cache=False`` keeps the cacheless re-forward path: it is the
        oracle the cached path is tested bitwise-against
        (tests/test_lcrec.py) and a fallback for debugging.
        """
        C, K = self.num_codebooks, num_beams
        ranges = [self.level_token_range(c) for c in range(C)]
        model = self.model
        if valid_item_ids is not None:
            from genrec_tpu.decoding.trie import ROOT, build_trie_tables
            trie = build_trie_tables(valid_item_ids, self.codebook_size)
            trie_children = jnp.asarray(trie.children)
            trie_legal = jnp.asarray(trie.legal)
        else:
            trie_children = trie_legal = None

        def _select_level(c, last, beam_logps, nodes, beam_tokens, B):
            """Shared per-level beam update from (B*K, V) last-token logits.

            Returns (beam_tokens, beam_logps, nodes, parent, tok)."""
            lo, hi = ranges[c]
            level_logits = last[:, lo:hi]
            if trie_legal is not None:
                legal = trie_legal[nodes.reshape(-1)]      # (B*K, Kc)
                level_logits = jnp.where(legal, level_logits, -1e32)
            logp = jax.nn.log_softmax(level_logits, axis=-1)
            logp = logp.reshape(B, K, -1)
            if c == 0:
                # all beams identical: expand from beam 0 only
                scores, tok = jax.lax.top_k(logp[:, 0, :], K)   # (B, K)
                parent = jnp.zeros((B, K), jnp.int32)
            else:
                total = beam_logps[:, :, None] + logp
                flat = total.reshape(B, -1)
                scores, idx = jax.lax.top_k(flat, K)
                parent = idx // self.codebook_size
                tok = idx % self.codebook_size
            batch_ix = jnp.arange(B)[:, None]
            beam_tokens = beam_tokens[batch_ix, parent]
            beam_tokens = beam_tokens.at[:, :, c].set(tok)
            if trie_children is not None:
                nodes = trie_children[nodes[batch_ix, parent], tok]
            return beam_tokens, scores, nodes, parent, tok

        from genrec_tpu.decoding.trie import ROOT

        @jax.jit
        def generate_cached(params, input_ids, attention_mask):
            # r5 split-cache layout: the prompt KV stays at batch B (never
            # expanded to B·K, never re-homed); only the ≤C decoded
            # tokens' K/V are beam-managed, in level-major (B, KV, C·K,
            # Dh) slots. The r4 layout repeated the full prompt cache per
            # beam and copied it per level (~6 GB of pure HBM copies per
            # serving batch at the bench shape); beams now ride the query
            # axis instead (CausalLM.decode_step_beams).
            B, L = input_ids.shape
            last, pcache, pmask, next_pos = model.apply(
                {"params": params}, input_ids, attention_mask, L,
                method=CausalLM.prefill)

            KV = model.n_kv_heads
            Dh = model.d_model // model.n_heads
            zeros = jnp.zeros((B, KV, C * K, Dh), model.dtype)
            dec_cache = [(zeros, zeros) for _ in range(model.n_layers)]

            beam_tokens = jnp.zeros((B, K, C), jnp.int32)
            beam_logps = jnp.zeros((B, K), jnp.float32)
            nodes = jnp.full((B, K), ROOT, jnp.int32)
            last_bk = jnp.repeat(last, K, axis=0)          # (B*K, V)

            sl = jnp.arange(C * K)
            for c in range(C):
                beam_tokens, beam_logps, nodes, parent, tok = _select_level(
                    c, last_bk, beam_logps, nodes, beam_tokens, B)
                if c > 0:
                    # re-home only the decoded-token slots: slot c'·K+j
                    # takes its parent's c'·K+parent[b, j]
                    idx = (sl // K) * K + parent[:, sl % K]    # (B, C*K)
                    gat = lambda t: jnp.take_along_axis(
                        t, idx[:, None, :, None], axis=2)
                    dec_cache = [(gat(k), gat(v)) for k, v in dec_cache]
                tok_full = tok + ranges[c][0]                  # (B, K)
                logits, dec_cache = model.apply(
                    {"params": params}, tok_full,
                    next_pos[:, None] + c, pcache, pmask, dec_cache,
                    c, K, method=CausalLM.decode_step_beams)
                last_bk = logits.reshape(B * K, -1)
            return LCRecGenerationOutput(sem_ids=beam_tokens,
                                         log_probas=beam_logps)

        @jax.jit
        def generate_uncached(params, input_ids, attention_mask):
            B, L = input_ids.shape
            ids = jnp.repeat(input_ids, K, axis=0)       # (B*K, L)
            mask = jnp.repeat(attention_mask, K, axis=0)
            beam_tokens = jnp.zeros((B, K, C), jnp.int32)
            beam_logps = jnp.zeros((B, K), jnp.float32)
            nodes = jnp.full((B, K), ROOT, jnp.int32)

            for c in range(C):
                out = model.apply({"params": params}, ids,
                                  attention_mask=mask)
                last = out.logits[:, -1, :]               # (B*K, V)
                beam_tokens, beam_logps, nodes, parent, tok = _select_level(
                    c, last, beam_logps, nodes, beam_tokens, B)
                batch_ix = jnp.arange(B)[:, None]
                # append chosen tokens to every beam's (parent's) sequence
                ids = ids.reshape(B, K, -1)[batch_ix, parent].reshape(
                    B * K, -1)
                new_tok = (tok + ranges[c][0]).reshape(B * K, 1)
                ids = jnp.concatenate([ids, new_tok], axis=1)
                mask = jnp.concatenate(
                    [mask.reshape(B, K, -1)[batch_ix, parent].reshape(
                        B * K, -1),
                     jnp.ones((B * K, 1), mask.dtype)], axis=1)
            return LCRecGenerationOutput(sem_ids=beam_tokens,
                                         log_probas=beam_logps)

        return generate_cached if use_cache else generate_uncached

    # -- unconstrained text generation ------------------------------------
    def make_generate_text(self, max_new_tokens: int = 50):
        """jit-compiled greedy free-running decode (the reference's
        index2item eval path: ``generate(..., max_new=50, do_sample=False,
        constrained=False)``,
        ``/root/reference/genrec/trainers/lcrec_trainer.py:215-223``).

        Returns ``generate(params, input_ids, attention_mask) -> (B,
        max_new_tokens) int32`` token ids; rows stop emitting after EOS
        (padded with ``pad_token_id``). One prefill + a ``lax.scan`` of
        single-token decode steps over the shared KV cache — the whole
        decode is one compiled program (vs the reference's per-step HF
        ``generate`` host loop)."""
        model = self.model
        eos = int(self.tokenizer.eos_token_id)
        pad = int(self.tokenizer.pad_token_id)

        @jax.jit
        def generate(params, input_ids, attention_mask):
            B, L = input_ids.shape
            last, cache, cache_mask, next_pos = model.apply(
                {"params": params}, input_ids, attention_mask,
                L + max_new_tokens, method=CausalLM.prefill)

            def body(carry, t):
                last, cache, cache_mask, done = carry
                tok = jnp.argmax(last, axis=-1).astype(jnp.int32)   # (B,)
                tok = jnp.where(done, pad, tok)
                done = done | (tok == eos)
                last, cache, cache_mask = model.apply(
                    {"params": params}, tok[:, None], next_pos + t,
                    cache, cache_mask, L + t,
                    method=CausalLM.decode_step)
                return (last, cache, cache_mask, done), tok

            _, toks = jax.lax.scan(
                body,
                (last, cache, cache_mask, jnp.zeros((B,), bool)),
                jnp.arange(max_new_tokens))
            return toks.T                                  # (B, max_new)

        return generate

    # -- persistence -------------------------------------------------------
    def save_pretrained(self, save_dir: str, params) -> None:
        import orbax.checkpoint as ocp
        os.makedirs(save_dir, exist_ok=True)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(os.path.abspath(save_dir), "params"),
                   jax.tree_util.tree_map(np.asarray, params), force=True)
        ckptr.wait_until_finished()
        self.tokenizer.save(os.path.join(save_dir, "tokenizer.json"))
        with open(os.path.join(save_dir, "config.json"), "w") as f:
            json.dump(self._config, f, indent=2)

    @classmethod
    def load_pretrained(cls, save_dir: str):
        import orbax.checkpoint as ocp
        with open(os.path.join(save_dir, "config.json")) as f:
            cfg = json.load(f)
        # the saved config already carries the backbone's dims/rope/tying
        # and the tokenizer is loaded below — don't require the original
        # backbone artifact to still exist
        cfg = dict(cfg)
        cfg["backbone_path"] = ""
        inst = cls(**cfg)
        tok_path = os.path.join(save_dir, "tokenizer.json")
        if os.path.exists(tok_path + ".meta"):   # HF-subword backbone
            inst.tokenizer = HFTokenizerAdapter.load(tok_path)
        else:
            inst.tokenizer = WordTokenizer.load(tok_path)
        ckptr = ocp.StandardCheckpointer()
        params = ckptr.restore(
            os.path.join(os.path.abspath(save_dir), "params"))
        return inst, params

    @staticmethod
    def extract_sem_ids(text: str, num_codebooks: int) -> Optional[List[int]]:
        matches = SEM_ID_PATTERN.findall(text)
        if len(matches) < num_codebooks:
            return None
        return [int(matches[i][1]) for i in range(num_codebooks)]
