"""Checkpointing with the reference's logical layout
(lib/trainer.py:162-175): {epoch, state_dict, optimizer, scheduler,
config, best_val, best_val_epoch, best_val_metric}, one file per save,
`checkpoint` each epoch + `best_val_checkpoint`. Serialized with flax
msgpack instead of torch pickle; extension kept `.pth` so run dirs look
identical to the reference's.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, *, epoch: int, params, batch_stats,
                    opt_state, config: Dict, best_val: float,
                    best_val_epoch: int, best_val_metric: str,
                    extra: Dict | None = None):
    state = {
        "epoch": epoch,
        "state_dict": {"params": jax.device_get(params),
                       "batch_stats": jax.device_get(batch_stats)},
        "optimizer": jax.device_get(opt_state),
        "scheduler": {"last_epoch": epoch},
        "config": {k: v for k, v in dict(config).items()
                   if isinstance(v, (int, float, str, bool, type(None)))},
        "best_val": float(best_val),
        "best_val_epoch": (int(best_val_epoch)
                           if np.isfinite(best_val_epoch) else -(2 ** 31)),
        "best_val_metric": best_val_metric,
    }
    if extra:
        state.update(extra)
    # to_state_dict converts namedtuples (optax states) into plain dicts
    # that msgpack can encode; restore_into maps them back.
    blob = serialization.msgpack_serialize(
        serialization.to_state_dict(
            jax.tree_util.tree_map(_to_serializable, state)))
    with open(path, "wb") as f:
        f.write(blob)


def _to_serializable(x):
    if isinstance(x, (np.ndarray, np.generic)):
        return np.asarray(x)
    return x


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_into(template, restored):
    """Shape a restored raw tree into the structure of `template`
    (msgpack restores dicts/lists; this rebuilds tuples/namedtuples like
    optax states)."""
    return serialization.from_state_dict(template, restored)


def dump_config_json(out_dir: str, config: Dict):
    os.makedirs(out_dir, exist_ok=True)
    clean = {k: v for k, v in dict(config).items()
             if isinstance(v, (int, float, str, bool, type(None), list))}
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(clean, f, indent=4, sort_keys=False)
