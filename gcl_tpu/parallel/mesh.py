"""Device mesh + data-parallel training over ICI.

The reference is strictly single-process single-GPU (SURVEY.md §2.8); this
module is new TPU-first design: a 1-D 'data' mesh, batch sharded by
sample, gradients reduced with psum over ICI, parameters/optimizer state
replicated. Each device runs the complete per-shard pipeline (voxelize ->
kernel maps -> U-Net -> loss) locally via shard_map — the irregular
sort/search geometry work never crosses chips; only gradients (and
averaged BN statistics) ride the interconnect.

Semantics vs single chip: hardest-negative pools and group subsampling are
per-shard (each device mines negatives within its own samples); BatchNorm
uses per-device statistics with the running averages psum-averaged —
standard data-parallel practice.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..train.steps import TrainState, make_optimizer  # noqa: F401


def make_mesh(num_devices: int = 0, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data"):
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def host_to_global(mesh: Mesh, *arrays, axis_name: str = "data"):
    """Assemble each host's local batch slice into a global device array
    sharded by sample over the mesh.

    Multi-host: every process passes its own contiguous slice of the
    global batch (the loader's shard_id/num_shards slicing,
    data/loader.py) and jax.make_array_from_process_local_data glues
    them into one addressable-from-everywhere global array — a
    shard_map'd step over a multi-host mesh cannot consume plain
    process-local numpy arrays. Single-process: a device_put with the
    same sharding (also saves the jit-time default-device transfer).
    """
    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return tuple(jax.device_put(jnp.asarray(a), sh) for a in arrays)
    return tuple(
        jax.make_array_from_process_local_data(sh, np.asarray(a))
        for a in arrays)


def make_global_grad_fn(grad_fn: Callable, mesh: Mesh,
                        axis_name: str = "data") -> Callable:
    """Lift a per-shard grad_fn into a global batch-sharded one.

    grad_fn(params, batch_stats, rng, *batch) -> (grads, stats, metrics)
    runs on each device's batch shard under shard_map with a per-device
    RNG fold; gradients / BN stats / metrics come back pmean'd over the
    mesh, so the result has the same contract as a single-chip grad_fn
    and composes with make_train_step_from_grad and AccumStepper.
    """

    def sharded_grads(params, batch_stats, rng, *batch):
        # distinct RNG per device (fold in the device index)
        idx = jax.lax.axis_index(axis_name)
        rng = jax.random.fold_in(rng, idx)
        grads, new_stats, metrics = grad_fn(params, batch_stats, rng,
                                            *batch)
        grads = jax.lax.pmean(grads, axis_name)
        new_stats = jax.lax.pmean(new_stats, axis_name)
        metrics = jax.lax.pmean(metrics, axis_name)
        return grads, new_stats, metrics

    def global_grads(params, batch_stats, rng, *batch):
        f = jax.shard_map(
            sharded_grads, mesh=mesh,
            in_specs=(P(), P(), P()) + tuple(P(axis_name) for _ in batch),
            out_specs=(P(), P(), P()),
            check_vma=False)
        return f(params, batch_stats, rng, *batch)

    return global_grads


def make_parallel_train_step(grad_fn: Callable, step_cfg, mesh: Mesh,
                             axis_name: str = "data"
                             ) -> Tuple[Callable, Callable]:
    """Wrap a per-shard grad_fn into a pmean'd data-parallel step.

    grad_fn(params, batch_stats, rng, *batch) -> (grads, stats, metrics)
    where every array in *batch has a leading per-sample axis divisible by
    the mesh size. Returns (tx, step_fn(state, lr, *batch)).
    """
    from ..train.steps import make_train_step_from_grad

    tx = make_optimizer(step_cfg)
    return tx, make_train_step_from_grad(
        tx, make_global_grad_fn(grad_fn, mesh, axis_name))
