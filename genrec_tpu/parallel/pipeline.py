"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference has no pipeline parallelism (SURVEY §2.5: HF-Accelerate DDP
only); its LCRec backbone (Qwen2.5-1.5B, full fine-tuning —
``/root/reference/config/lcrec/amazon/lcrec.gin:12-48``) is exactly the
model that outgrows one chip. This module adds the TPU-native PP tier:

- Transformer blocks are **stacked** (one leading layer axis per leaf) and
  sharded ``P("pipe")`` — each pipeline stage holds ``n_layers / pipe``
  contiguous layers in its own HBM, so parameter memory scales 1/pipe.
- Execution is a ``shard_map`` GPipe schedule: the global batch splits into
  microbatches; each tick every stage applies its local layers to its
  in-flight microbatch and ``ppermute``-shifts the activation to the next
  stage over ICI. ``n_micro + pipe - 1`` ticks drain the pipe; bubble
  fraction = (pipe-1)/(n_micro+pipe-1).
- Embedding / final norm / loss stay outside the pipelined region
  (data-parallel over the ``data`` axis, replicated over ``pipe``) — they
  are a tiny fraction of LLM FLOPs and this keeps the schedule generic.
- Backward is plain ``jax.grad`` through the schedule: XLA transposes the
  ``ppermute`` into the reverse shift and the ``lax.scan`` into the
  standard GPipe backward wave; activation stashing is the scan's
  residuals (compose with ``nn.remat`` blocks to trade FLOPs for HBM).

Composes with the data axis (DP×PP meshes) — batch and per-sample context
shard over ``data``; every pipe group sees its data shard replicated.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

PIPE_AXIS = "pipe"


def make_pipeline_mesh(data: Optional[int] = None, pipe: int = 1,
                       devices: Optional[Sequence[jax.Device]] = None
                       ) -> Mesh:
    """(data, pipe) mesh. The pipe axis should map to an ICI ring — XLA's
    ppermute then uses neighbour links; keep pipe within a slice."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % pipe != 0:
            raise ValueError(f"{n} devices not divisible by pipe={pipe}")
        data = n // pipe
    if data * pipe != n:
        raise ValueError(f"mesh {data}x{pipe} != {n} devices")
    arr = np.asarray(devices).reshape(data, pipe)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


# -- parameter layout -------------------------------------------------------

def to_pipeline_params(params: Any, n_layers: int,
                       prefix: str = "layer_") -> dict:
    """Split a per-layer-named param tree into the pipelined layout
    ``{"layers": stacked, "rest": other}`` where every ``layers`` leaf has a
    leading ``n_layers`` axis (shardable ``P("pipe")``)."""
    params = dict(params)
    layer_trees = []
    for i in range(n_layers):
        key = f"{prefix}{i}"
        if key not in params:
            raise ValueError(f"missing {key} in params")
        layer_trees.append(params.pop(key))
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *layer_trees)
    return {"layers": stacked, "rest": params}


def from_pipeline_params(pipe_params: dict, prefix: str = "layer_") -> dict:
    """Inverse of :func:`to_pipeline_params` (for checkpoint interchange)."""
    stacked, rest = pipe_params["layers"], pipe_params["rest"]
    n_layers = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    out = dict(rest)
    for i in range(n_layers):
        out[f"{prefix}{i}"] = jax.tree_util.tree_map(
            lambda x, i=i: x[i], stacked)
    return out


def pipeline_param_shardings(mesh: Mesh, pipe_params: dict) -> dict:
    """``layers`` leaves sharded on the layer axis over ``pipe``; ``rest``
    replicated (embedding/head tables can additionally be FSDP-sharded over
    ``data`` by composing with ``fsdp_shardings`` on the rest subtree)."""
    layers = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P(PIPE_AXIS)), pipe_params["layers"])
    rest = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), pipe_params["rest"])
    return {"layers": layers, "rest": rest}


# -- the schedule -----------------------------------------------------------

def pipeline_blocks(block_fn: Callable, stacked_params: Any, x: jnp.ndarray,
                    per_sample: tuple, shared: tuple, mesh: Mesh,
                    n_micro: int) -> jnp.ndarray:
    """Run ``x`` through all stacked layers under the GPipe schedule.

    ``block_fn(layer_params, h, *per_sample_micro, *shared) -> h`` applies
    ONE layer. ``per_sample`` arrays have a leading batch axis and are
    microbatched alongside ``x``; ``shared`` is broadcast to every call.
    Batch (and per_sample) shard over ``data``; ``stacked_params`` leaves
    shard their leading layer axis over ``pipe``.
    """
    n_stages = mesh.shape[PIPE_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    if x.shape[0] % (n_micro * n_data):
        raise ValueError(
            f"batch {x.shape[0]} not divisible by n_micro*data "
            f"({n_micro}x{n_data})")

    local = functools.partial(_gpipe_local, block_fn, n_stages, n_micro)
    p_layers = jax.tree_util.tree_map(lambda _: P(PIPE_AXIS), stacked_params)
    p_batch = jax.tree_util.tree_map(lambda _: P(DATA_AXIS), per_sample)
    p_shared = jax.tree_util.tree_map(lambda _: P(), shared)
    return shard_map(
        local, mesh=mesh,
        in_specs=(p_layers, P(DATA_AXIS), p_batch, p_shared),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )(stacked_params, x, per_sample, shared)


def _gpipe_local(block_fn, n_stages, n_micro, stacked_local, x, per_sample,
                 shared):
    """Per-device body: ``stacked_local`` leaves are (L_local, ...); the
    device is pipeline stage ``axis_index("pipe")`` for its data shard."""
    stage = jax.lax.axis_index(PIPE_AXIS)
    B = x.shape[0]
    mb = B // n_micro
    xm = x.reshape(n_micro, mb, *x.shape[1:])
    psm = jax.tree_util.tree_map(
        lambda a: a.reshape(n_micro, mb, *a.shape[1:]), per_sample)

    def apply_local(h, ctx):
        def body(h, layer_p):
            return block_fn(layer_p, h, *ctx, *shared), None
        h, _ = jax.lax.scan(body, h, stacked_local)
        return h

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    state = jnp.zeros(xm.shape[1:], x.dtype)
    outs = jnp.zeros(xm.shape, x.dtype)

    def tick(carry, t):
        state, outs = carry
        # stage 0 ingests microbatch t (bubbles clamp to a real index; their
        # results are masked out below, and zero inputs are numerically
        # benign — RMSNorm eps, causal bias keeps softmax rows finite)
        feed = jax.lax.dynamic_index_in_dim(
            xm, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
        state = jnp.where(stage == 0, feed, state)
        # the microbatch at this stage this tick
        m_idx = jnp.clip(t - stage, 0, n_micro - 1)
        ctx = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, m_idx, 0,
                                                   keepdims=False), psm)
        y = apply_local(state, ctx)
        # last stage emits microbatch t-(n_stages-1)
        out_idx = t - (n_stages - 1)
        valid = (out_idx >= 0) & (stage == n_stages - 1)
        w = jnp.clip(out_idx, 0, n_micro - 1)
        prev = jax.lax.dynamic_index_in_dim(outs, w, 0, keepdims=False)
        outs = jax.lax.dynamic_update_index_in_dim(
            outs, jnp.where(valid, y, prev), w, 0)
        state = jax.lax.ppermute(y, PIPE_AXIS, perm)
        return (state, outs), None

    (state, outs), _ = jax.lax.scan(
        tick, (state, outs), jnp.arange(n_micro + n_stages - 1))
    # replicate the last stage's outputs across the pipe axis
    outs = jax.lax.psum(
        jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)),
        PIPE_AXIS)
    return outs.reshape(B, *x.shape[1:])


# -- CausalLM integration ---------------------------------------------------

class PipelinedLM:
    """GPipe executor for :class:`~genrec_tpu.models.llm.CausalLM`.

    Parameters live in the pipelined layout (see :func:`to_pipeline_params`);
    :meth:`loss` matches ``model.apply(...).loss`` exactly (same fused
    chunked CE) while the block stack runs pipelined over ``pipe``. The
    reference's equivalent capability is device_map-style HF sharding it
    never wires (SURVEY §2.5: PP "No").
    """

    def __init__(self, model, mesh: Mesh, n_micro: int):
        from genrec_tpu.models.llm import LlmBlock
        n_stages = mesh.shape[PIPE_AXIS]
        if model.n_layers % n_stages:
            raise ValueError(
                f"n_layers={model.n_layers} not divisible by the pipe axis "
                f"({n_stages} stages)")
        self.model = model
        self.mesh = mesh
        self.n_micro = n_micro
        self._block = LlmBlock(model.d_model, model.n_heads,
                               model.n_kv_heads, model.ff_dim,
                               lora_rank=model.lora_rank,
                               lora_alpha=model.lora_alpha,
                               rope_theta=model.rope_theta,
                               dtype=model.dtype)
        self._remat = model.remat

    def init_params(self, rng: jax.Array, example_ids: jnp.ndarray) -> dict:
        params = self.model.init({"params": rng}, example_ids)["params"]
        return to_pipeline_params(params, self.model.n_layers)

    def _hidden(self, pipe_params: dict, input_ids: jnp.ndarray,
                attention_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        m = self.model
        rest = pipe_params["rest"]
        B, L = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, L), jnp.int32)
        x = jnp.take(rest["wte"], input_ids, axis=0).astype(m.dtype)
        positions = jnp.maximum(jnp.cumsum(attention_mask, axis=1) - 1, 0)
        causal = jnp.triu(jnp.full((L, L), -1e9, jnp.float32), k=1)
        kpad = jnp.where(attention_mask == 0, -1e9, 0.0).astype(jnp.float32)
        bias = causal[None, None] + kpad[:, None, None, :]

        block = self._block

        def block_fn(layer_p, h, positions, bias):
            return block.apply({"params": layer_p}, h, positions, bias)[0]

        if self._remat:
            # recompute each layer in the backward wave instead of stashing
            # its internals per tick — the GPipe schedule already stashes
            # one activation per in-flight microbatch per stage
            block_fn = jax.checkpoint(block_fn)

        x = pipeline_blocks(block_fn, pipe_params["layers"], x,
                            (positions, bias), (), self.mesh, self.n_micro)
        from genrec_tpu.nn.normalize import RMSNorm
        return RMSNorm(m.d_model).apply(
            {"params": rest["final_norm"]}, x)

    def loss(self, pipe_params: dict, input_ids: jnp.ndarray,
             attention_mask: Optional[jnp.ndarray],
             labels: jnp.ndarray) -> jnp.ndarray:
        """Fused chunked linear+CE over the pipelined hidden states —
        identical semantics to ``CausalLM.__call__`` with labels."""
        from genrec_tpu.models.llm import causal_lm_fused_ce
        rest = pipe_params["rest"]
        x = self._hidden(pipe_params, input_ids, attention_mask)
        return causal_lm_fused_ce(
            self.model, x, labels, rest["wte"],
            None if self.model.tie_embeddings
            else rest["lm_head"]["kernel"])
