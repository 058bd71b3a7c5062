"""Generic training engine: one jit-compiled SPMD step, many models.

Replaces the reference's per-trainer copies of the Accelerate loop
(``accelerator.backward`` / ``clip_grad_norm_`` / ``opt.step`` /
``sched.step`` — e.g. ``/root/reference/genrec/trainers/rqvae_trainer.py:
214-281``) with a single compiled update: forward, grads, clip, optimizer and
the (implicit, XLA-fused) cross-device gradient psum all live in one XLA
program. Mixed precision is a model-level dtype choice (bf16 activations,
fp32 params/optimizer), not an autocast context.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Tuple

import jax
import numpy as np
import optax

from genrec_tpu.parallel.mesh import replicated_sharding, shard_batch
from .train_state import TrainState, apply_updates

LossFn = Callable[..., Tuple[jax.Array, Dict[str, jax.Array]]]


def make_train_step(loss_fn: LossFn, tx: optax.GradientTransformation,
                    mesh, donate: bool = True, sharded_params: bool = False):
    """Build ``step(state, batch, rng) -> (state, metrics)`` jit-compiled over
    ``mesh``. ``loss_fn(params, batch, rng)`` returns (scalar loss, metrics).

    With ``sharded_params`` (model-axis table sharding) output shardings are
    propagated from the input placement instead of forced replication.
    """
    rep = replicated_sharding(mesh)

    def step(state: TrainState, batch, rng):
        def compute(params):
            return loss_fn(params, batch, rng)
        (loss, metrics), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        new_state = apply_updates(state, grads, tx)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    kwargs = {} if sharded_params else {"out_shardings": (rep, rep)}
    return jax.jit(step, donate_argnums=(0,) if donate else (), **kwargs)


def make_fused_train_step(loss_fn: LossFn,
                          tx: optax.GradientTransformation, mesh,
                          donate: bool = True):
    """Scan-fused multi-step: ``fused(state, batches, rng)`` runs one
    optimizer step per leading-axis slice of ``batches`` inside a single
    XLA program (``lax.scan``), returning the final state and the LAST
    step's metrics.

    This is the dispatch-amortisation path for small models: the RQ-VAE
    step is ~60 µs of compute inside a ~7.5 ms dispatch on the remote
    TPU, so fusing S steps per dispatch approaches an S× speedup. The
    per-step semantics (one grad + clip + adamw update per batch slice,
    LR schedule keyed off ``state.step``) are identical to S sequential
    ``make_train_step`` calls given the same per-step rngs.
    """
    rep = replicated_sharding(mesh)

    def fused(state: TrainState, batches, rng):
        n_inner = jax.tree_util.tree_leaves(batches)[0].shape[0]
        rngs = jax.random.split(rng, n_inner)

        def body(state, inp):
            batch, step_rng = inp

            def compute(params):
                return loss_fn(params, batch, step_rng)
            (loss, metrics), grads = jax.value_and_grad(
                compute, has_aux=True)(state.params)
            new_state = apply_updates(state, grads, tx)
            metrics = dict(metrics)
            metrics["loss"] = loss
            metrics["grad_norm"] = optax.global_norm(grads)
            return new_state, metrics

        state, metrics = jax.lax.scan(body, state, (batches, rngs))
        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return state, last

    return jax.jit(fused, donate_argnums=(0,) if donate else (),
                   out_shardings=(rep, rep))


def _leaf_key(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                    for p in path)


def split_params(params, trainable_mask):
    """(trainable {path: leaf}, full-tree params) per a bool-pytree mask."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    mask = jax.tree_util.tree_leaves(trainable_mask)
    assert len(flat) == len(mask), "mask/param tree mismatch"
    return {_leaf_key(path): leaf
            for (path, leaf), m in zip(flat, mask) if m}


def merge_params(params, trainable: dict):
    """Full tree with trainable leaves (by path key) substituted in."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = [trainable.get(_leaf_key(path), leaf) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_split_train_step(loss_fn: LossFn, tx: optax.GradientTransformation,
                          mesh, donate: bool = True):
    """``step(state, frozen, batch, rng)``: grads/optimizer exist only for
    the trainable subset (``state.params`` is a path-keyed dict) — unlike
    an ``optax.multi_transform`` freeze, the full-tree fp32 grad pytree
    never materialises, which is what makes LoRA on a billion-param
    backbone fit one chip (cf. scripts/qwen_scale_bench.py)."""

    def step(state: TrainState, frozen, batch, rng):
        def compute(trainable):
            return loss_fn(merge_params(frozen, trainable), batch, rng)
        (loss, metrics), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        new_state = apply_updates(state, grads, tx)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(metric_fn: Callable, mesh):
    """jit a pure eval fn ``(params, batch) -> metric sums`` (psum-ready)."""
    rep = replicated_sharding(mesh)
    return jax.jit(metric_fn, out_shardings=rep)


class StepTimer:
    """Wall-clock examples/sec meter (skips the first, compile-laden step)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = None
        self._steps = 0
        self._examples = 0

    def tick(self, batch_examples: int):
        if self._t0 is None:  # first tick starts the clock (post-compile)
            self._t0 = time.perf_counter()
            return
        self._steps += 1
        self._examples += batch_examples

    @property
    def examples_per_sec(self) -> float:
        if self._t0 is None or self._steps == 0:
            return 0.0
        return self._examples / (time.perf_counter() - self._t0)

    @property
    def steps_per_sec(self) -> float:
        if self._t0 is None or self._steps == 0:
            return 0.0
        return self._steps / (time.perf_counter() - self._t0)


def device_metrics_to_host(metrics: Dict[str, jax.Array]) -> Dict[str, float]:
    return {k: float(np.asarray(v)) for k, v in metrics.items()}


def fused_epoch_steps(engine: "Engine", loader, steps_per_dispatch: int,
                      max_steps: int = 0, intervals=()):
    """Drive one epoch of ``loader`` through scan-fused dispatches.

    Yields ``(n_steps, metrics)`` per dispatch, where ``metrics`` is the
    last inner step's. Chunks never cross a multiple of any interval in
    ``intervals`` (log/eval/save cadences), so ``engine.step % interval``
    checks behave exactly as with the 1-step loop. Hardware motivation:
    the SASRec-scale step measured 2.3× faster fused
    (scripts/idseq_fuse_probe.py) — per-dispatch host overhead dominates
    ms-scale steps on the remote TPU.
    """
    S = max(int(steps_per_dispatch), 1)
    if engine._shard_batch_fn is not None:
        S = 1   # custom batch placements (e.g. ring-attention SP) need the
                # per-step path; the stack sharding would misplace them
    ivs = [i for i in intervals if i and i > 0]

    def room() -> int:
        s = int(engine.step)
        n = S
        for i in ivs:
            n = min(n, (s // i + 1) * i - s)
        if max_steps:
            n = min(n, max_steps - count)
        return max(n, 1)

    count = 0
    buf = []
    it = iter(loader)
    exhausted = False
    while not exhausted:
        if max_steps and count >= max_steps:
            break
        want = room()
        while len(buf) < want:
            try:
                buf.append(next(it))
            except StopIteration:
                exhausted = True
                break
        if not buf:
            break
        n = len(buf)
        if n == 1:
            metrics = engine.run_step(buf[0])
        else:
            stack = jax.tree_util.tree_map(
                lambda *xs: None if xs[0] is None else np.stack(xs),
                *buf, is_leaf=lambda x: x is None)
            metrics = engine.run_steps(stack)
        buf = []
        count += n
        yield n, metrics


class Engine:
    """Thin orchestration wrapper shared by all trainers."""

    def __init__(self, mesh, loss_fn: LossFn,
                 tx: optax.GradientTransformation, params,
                 rng: Optional[jax.Array] = None,
                 shard_params=False, trainable_mask=None,
                 shard_batch_fn: Optional[Callable] = None):
        """``shard_params``: False = replicate everything; True/"tables" =
        row-shard vocabulary tables over the model axis; "fsdp" = ZeRO-3
        placement of every large param over the data axis (full-FT LLMs);
        or an explicit pytree of ``NamedSharding``s matching ``params``
        (e.g. ``pipeline_param_shardings`` for a GPipe layer layout).

        ``trainable_mask``: bool pytree matching ``params`` — when given,
        only the masked leaves get grads/optimizer state (the rest is a
        frozen side input); use :attr:`full_params` wherever the merged
        tree is needed (eval, generation, persistence).

        ``shard_batch_fn``: overrides the default leading-axis/data-axis
        batch placement (e.g. (batch, sequence) sharding for the
        ring-attention sequence-parallel path).
        """
        self.mesh = mesh
        self.tx = tx
        self.frozen = None
        self._shard_batch_fn = shard_batch_fn
        if shard_params is not False and shard_params is not None:
            from genrec_tpu.parallel.sharding import (apply_shardings,
                                                      fsdp_shardings,
                                                      param_shardings)
            if shard_params == "fsdp":
                placements = fsdp_shardings(mesh, params)
            elif shard_params is True or shard_params == "tables":
                placements = param_shardings(mesh, params)
            else:  # explicit pytree of shardings
                placements = shard_params
            params = apply_shardings(params, placements)
            if trainable_mask is not None:
                # sharded frozen base + (small, replicated-by-the-min-size-
                # rule) trainable subset: multi-chip LoRA on big backbones
                self.frozen = params
                trainable = split_params(params, trainable_mask)
                if not trainable:
                    raise ValueError("trainable_mask selects no parameters")
                params = trainable
            state = TrainState.create(params, tx)
            # tx.init outputs inherit param shardings (mu/nu are computed
            # from the already-placed params), but fresh scalars (step,
            # optimizer counts) land on one device — replicate them so the
            # jitted step sees a single consistent device set.
            rep = replicated_sharding(mesh)

            def place(x):
                if isinstance(x, jax.Array) and len(x.devices()) != mesh.size:
                    return jax.device_put(x, rep)
                return x

            self.state = jax.tree_util.tree_map(place, state)
        elif trainable_mask is not None:
            rep = replicated_sharding(mesh)
            self.frozen = jax.device_put(params, rep)
            trainable = split_params(self.frozen, trainable_mask)
            if not trainable:
                raise ValueError("trainable_mask selects no parameters")
            self.state = jax.device_put(TrainState.create(trainable, tx),
                                        rep)
        else:
            self.state = jax.device_put(TrainState.create(params, tx),
                                        replicated_sharding(mesh))
        if self.frozen is not None:
            self.train_step = make_split_train_step(loss_fn, tx, mesh)
        else:
            self.train_step = make_train_step(loss_fn, tx, mesh,
                                              sharded_params=shard_params)
        self._loss_fn = loss_fn
        self._fused_step = None      # built lazily by run_steps
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.timer = StepTimer()

    def run_step(self, batch) -> Dict[str, jax.Array]:
        self.rng, step_rng = jax.random.split(self.rng)
        if self._shard_batch_fn is not None:
            device_batch = self._shard_batch_fn(batch)
        else:
            device_batch = shard_batch(batch, self.mesh)
        if self.frozen is not None:
            self.state, metrics = self.train_step(self.state, self.frozen,
                                                  device_batch, step_rng)
        else:
            self.state, metrics = self.train_step(self.state, device_batch,
                                                  step_rng)
        return metrics

    def run_steps(self, batch_stack) -> Dict[str, jax.Array]:
        """Run one optimizer step per leading-axis slice of ``batch_stack``
        in a single dispatch (see :func:`make_fused_train_step`); returns
        the last step's metrics. ``engine.step`` advances by the stack
        length. Distinct stack lengths compile once each — callers should
        stick to one or two chunk sizes."""
        if self.frozen is not None:
            raise NotImplementedError(
                "run_steps does not support trainable/frozen splits")
        if self._fused_step is None:
            self._fused_step = make_fused_train_step(
                self._loss_fn, self.tx, self.mesh)
        self.rng, step_rng = jax.random.split(self.rng)
        from genrec_tpu.parallel.mesh import batch_stack_sharding
        device_stack = jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x),
                                     batch_stack_sharding(self.mesh)),
            batch_stack)
        self.state, metrics = self._fused_step(self.state, device_stack,
                                               step_rng)
        return metrics

    @property
    def full_params(self):
        """The complete parameter tree (merging frozen + trainable when a
        ``trainable_mask`` split is active)."""
        if self.frozen is None:
            return self.state.params
        return merge_params(self.frozen, self.state.params)

    @property
    def step(self) -> int:
        return int(np.asarray(self.state.step))

    def save(self, ckpt_manager, config: Optional[dict] = None) -> None:
        """Checkpoint the FULL train state (params + optimizer + step) —
        the reference's ``{epoch, model, optimizer, scheduler}`` contract
        (rqvae_trainer.py:313-324).

        The live (possibly model-sharded) ``jax.Array`` state is handed to
        orbax directly: each host serialises only its local shards and all
        processes participate in the (collective) write — no full-state
        gather on every host.
        """
        ckpt_manager.save(self.step, self.state, config=config)

    def restore(self, ckpt_manager) -> bool:
        """Resume from the latest checkpoint if one exists.

        Restores every leaf to the *placement the engine was built with*
        (replicated, or row-sharded when ``shard_params=True``) by passing
        sharding-annotated abstract arrays as the orbax template, so a
        sharded engine resumes sharded instead of silently replicating.
        """
        if ckpt_manager.latest_step() is None:
            return False

        def as_abstract(x):
            if isinstance(x, jax.Array):
                return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                            sharding=x.sharding)
            return np.asarray(x)

        template = jax.tree_util.tree_map(as_abstract, self.state)
        self.state = ckpt_manager.restore(template)
        return True
