"""Orbax checkpointing with the reference's cross-component contract.

Parity target: the reference's dict checkpoints
``{epoch|iter, model, model_config, optimizer, scheduler}``
(``/root/reference/genrec/trainers/rqvae_trainer.py:313-324``) and the RQ-VAE
artifact that *datasets* load to tokenize items (``data/amazon.py:296-313``) —
codebooks must be bit-stable across the RQ-VAE → TIGER/LCRec/COBRA pipeline.

Layout: ``<dir>/<step>/state`` (orbax PyTree of params/opt_state/step) plus a
``config.json`` next to it. ``save_rqvae_artifact`` writes the versioned
semantic-ID artifact (params + config + precomputed ``sem_ids`` table).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

RQVAE_ARTIFACT_VERSION = 1


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


class CheckpointManager:
    """Step-indexed checkpoints of a train-state pytree + config sidecar."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = _abs(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any,
             config: Optional[Dict] = None) -> None:
        if step in (self._mgr.all_steps() or []):
            # orbax silently SKIPS a save whose step already exists; two
            # runs pointed at the same save_dir would then keep the first
            # run's weights while logging the second run's metrics (bit us
            # in the r5 HSTU eval probe). Overwrite explicitly.
            self._mgr.delete(step)
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if config is not None and jax.process_index() == 0:
            with open(os.path.join(self.directory, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any,
                step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def load_config(self) -> Optional[Dict]:
        path = os.path.join(self.directory, "config.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)


# ---------------------------------------------------------------------------
# RQ-VAE artifact: the contract between RQ-VAE training and every downstream
# sequence dataset (TIGER/LCRec/COBRA).
# ---------------------------------------------------------------------------

def save_rqvae_artifact(directory: str, params: Any, config: Dict,
                        sem_ids: Optional[np.ndarray] = None) -> None:
    """Write a versioned RQ-VAE artifact.

    ``sem_ids``: optional precomputed (num_items, C) code table so downstream
    datasets need not re-run the encoder (the reference re-encodes all items
    at every dataset construction, amazon.py:296-313 — precomputing is both
    faster and removes the bit-stability risk).
    """
    directory = _abs(directory)
    os.makedirs(directory, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(directory, "params"),
               jax.tree_util.tree_map(np.asarray, params), force=True)
    ckptr.wait_until_finished()
    meta = {"version": RQVAE_ARTIFACT_VERSION, "config": config}
    with open(os.path.join(directory, "rqvae.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)
    if sem_ids is not None:
        np.save(os.path.join(directory, "sem_ids.npy"),
                np.asarray(sem_ids, dtype=np.int32))


def load_rqvae_artifact(directory: str,
                        params_template: Optional[Any] = None):
    """Return ``(params, config, sem_ids-or-None)``."""
    directory = _abs(directory)
    with open(os.path.join(directory, "rqvae.json")) as f:
        meta = json.load(f)
    if meta.get("version") != RQVAE_ARTIFACT_VERSION:
        raise ValueError(f"Unsupported RQ-VAE artifact version: {meta}")
    ckptr = ocp.StandardCheckpointer()
    if params_template is not None:
        params = ckptr.restore(os.path.join(directory, "params"),
                               args=ocp.args.StandardRestore(params_template))
    else:
        params = ckptr.restore(os.path.join(directory, "params"))
    sem_ids_path = os.path.join(directory, "sem_ids.npy")
    sem_ids = np.load(sem_ids_path) if os.path.exists(sem_ids_path) else None
    return params, meta["config"], sem_ids
