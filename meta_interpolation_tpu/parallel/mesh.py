"""Device mesh + episode (task) parallelism.

The reference has *no* multi-device execution (SURVEY.md §2.5 — only
commented-out DataParallel remnants at meta_learning_system.py:174-183,
298-302). This module is the TPU-native scale-out design:

  * a 2-D logical mesh ``(task, spatial)``: the task axis shards the episode
    batch (pure data parallelism over scenes — each device runs whole inner
    loops locally, XLA inserts one psum for the outer gradient, riding ICI);
    the spatial axis shards frame rows for HD eval (parallel/spatial.py).
  * inputs are placed with ``jax.device_put`` under a NamedSharding; jit's
    computation-follows-data propagates the sharding through the episode, so
    no code changes are needed in the meta engine.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TASK_AXIS = "task"
SPATIAL_AXIS = "spatial"


def make_mesh(mesh_shape: Optional[str] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build the (task, spatial) mesh.

    ``mesh_shape``: "8" → 8-way task parallel; "4x2" → 4-way task × 2-way
    spatial. Default: all devices on the task axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if mesh_shape:
        dims = tuple(int(x) for x in mesh_shape.lower().split("x"))
        if len(dims) == 1:
            dims = (dims[0], 1)
    else:
        dims = (n, 1)
    if dims[0] * dims[1] != n:
        raise ValueError(f"mesh {dims} != {n} devices")
    dev_array = np.asarray(devices).reshape(dims)
    return Mesh(dev_array, (TASK_AXIS, SPATIAL_AXIS))


def task_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (tasks) of a (B, T, H, W, C) batch over the task axis."""
    return NamedSharding(mesh, P(TASK_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def validate_train_batch(mesh: Optional[Mesh], batch_size: int) -> None:
    """Reject undividable *configured* training batches up front.

    The replicated fallback in :func:`shard_task_batch` is meant for the
    tail partial batch of an eval epoch; if ``--batch_size`` itself does
    not divide the task axis, EVERY training iteration would silently run
    replicated (all devices computing the full batch, zero speedup), so
    that misconfiguration is an error at construction time."""
    if mesh is None:
        return
    axis = mesh.shape[TASK_AXIS]
    if axis > 1 and batch_size % axis:
        raise ValueError(
            f"--batch_size {batch_size} is not divisible by the mesh task "
            f"axis ({axis}); every training batch would fall back to "
            f"replicated placement. Use a batch size that is a multiple "
            f"of {axis} or shrink the task axis (--mesh_shape).")


def shard_task_batch(mesh: Mesh, frames):
    """Place a (B, T, H, W, C) batch sharded over tasks.

    When B is not divisible by the task-axis size — the final partial batch
    of a real dataset (TaskLoader drop_last=False at eval) — the batch is
    placed *replicated* instead: every device runs the full small batch and
    the results are exact, just without task parallelism for that one
    iteration. Training never hits this fallback: loaders drop the partial
    tail batch when a mesh is active (data/loader.py) and an undividable
    configured batch size is rejected by :func:`validate_train_batch`."""
    b = np.shape(frames)[0]
    if b % mesh.shape[TASK_AXIS]:
        return jax.device_put(frames, replicated(mesh))
    return jax.device_put(frames, task_sharding(mesh))


def shard_task_spatial_batch(mesh: Mesh, frames):
    """Place a (B, T, H, W, C) batch sharded over (task, spatial): tasks on
    axis 0, frame rows on axis 2. GSPMD partitions the whole episode from
    this input sharding alone — conv halo exchanges, channel-attention
    reductions and loss psums are inserted by XLA, so the spatially-sharded
    eval is *exact* (no tiling seams, unlike the reference's
    experiment_builder.py:103-128 halving)."""
    h = frames.shape[2]
    sp = mesh.shape[SPATIAL_AXIS]
    if sp == 1 or h % sp:
        return shard_task_batch(mesh, frames)
    if np.shape(frames)[0] % mesh.shape[TASK_AXIS]:
        # same replicated-tasks fallback as shard_task_batch (partial eval
        # batches — e.g. val_batch_size=1 on a 4x2 mesh), keeping the rows
        # sharded over the spatial axis
        return jax.device_put(
            frames, NamedSharding(mesh, P(None, None, SPATIAL_AXIS)))
    return jax.device_put(
        frames, NamedSharding(mesh, P(TASK_AXIS, None, SPATIAL_AXIS)))


def replicate_params(mesh: Mesh, params):
    """Replicate the meta-params across the mesh (they are identical on all
    devices; XLA all-reduces the outer grads automatically)."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), params)


def shard_task_batch_multihost(mesh: Mesh, local_frames,
                               global_batch: Optional[int] = None):
    """Multi-host batch placement over DCN (SURVEY.md §2.5).

    Each host's data loader produces only its *local* slice of the global
    task batch (``global_batch // jax.process_count()`` tasks); this
    assembles the global sharded array without any cross-host gather —
    each host's shards are backed by its local data, and the episode's
    outer-grad psum is the only cross-host (DCN/ICI) communication.
    Single-process (local == global) it reduces to :func:`shard_task_batch`.
    """
    if jax.process_count() == 1:
        return shard_task_batch(mesh, local_frames)
    gb = (global_batch if global_batch is not None
          else local_frames.shape[0] * jax.process_count())
    if gb % mesh.shape[TASK_AXIS]:
        raise ValueError(
            f"multi-host global batch {gb} must divide the task axis "
            f"({mesh.shape[TASK_AXIS]}); size per-host batches accordingly "
            f"(no replicated fallback is possible across hosts)")
    global_shape = (gb,) + tuple(local_frames.shape[1:])
    return jax.make_array_from_process_local_data(
        task_sharding(mesh), np.asarray(local_frames), global_shape)
