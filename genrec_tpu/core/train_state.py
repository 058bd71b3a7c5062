"""Train state + optimizer/schedule factories.

Replaces the reference runtime's AdamW/Adam + HF LR schedules
(``/root/reference/genrec/trainers/tiger_trainer.py:216-227`` cosine-warmup,
``rqvae_trainer.py:160-171`` linear-warmup, ``modules/scheduler.py:8-27``
inverse-sqrt) with optax equivalents, and Accelerate's grad-clip/accumulate
with optax transforms — all fused into the single jit-compiled update.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import optax

from genrec_tpu.configlib import gin


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        import jax.numpy as jnp
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))


def apply_updates(state: TrainState, grads,
                  tx: optax.GradientTransformation) -> TrainState:
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(step=state.step + 1, params=new_params,
                      opt_state=new_opt)


@gin.configurable
def make_schedule(name: str = "cosine_warmup", learning_rate: float = 1e-3,
                  num_warmup_steps: int = 0, total_steps: int = 10000,
                  min_ratio: float = 0.0) -> optax.Schedule:
    if name in ("constant", None):
        return optax.constant_schedule(learning_rate)
    if name == "linear_warmup":
        # HF get_linear_schedule_with_warmup: warmup then linear decay to 0
        return optax.join_schedules([
            optax.linear_schedule(0.0, learning_rate,
                                  max(num_warmup_steps, 1)),
            optax.linear_schedule(learning_rate,
                                  learning_rate * min_ratio,
                                  max(total_steps - num_warmup_steps, 1)),
        ], [max(num_warmup_steps, 1)])
    if name == "cosine_warmup":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=learning_rate,
            warmup_steps=max(num_warmup_steps, 1),
            decay_steps=max(total_steps, num_warmup_steps + 1),
            end_value=learning_rate * min_ratio)
    if name == "inverse_sqrt":
        # reference modules/scheduler.py:8-27
        warm = max(num_warmup_steps, 1)
        def sched(step):
            import jax.numpy as jnp
            step = jnp.maximum(step, 1)
            warmup = learning_rate * step / warm
            decay = learning_rate * jnp.sqrt(warm / step)
            return jnp.where(step < warm, warmup, decay)
        return sched
    raise ValueError(f"Unknown schedule: {name!r}")


@gin.configurable
def make_optimizer(schedule: optax.Schedule,
                   optimizer: str = "adamw",
                   weight_decay: float = 0.0,
                   b1: float = 0.9, b2: float = 0.999,
                   grad_clip_norm: Optional[float] = 1.0,
                   gradient_accumulate_every: int = 1,
                   ) -> optax.GradientTransformation:
    if optimizer == "adamw":
        tx = optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay)
    elif optimizer == "adam":
        tx = optax.adam(schedule, b1=b1, b2=b2)
    else:
        raise ValueError(f"Unknown optimizer: {optimizer!r}")
    chain = []
    if grad_clip_norm:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(tx)
    tx = optax.chain(*chain)
    if gradient_accumulate_every > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=gradient_accumulate_every)
    return tx
