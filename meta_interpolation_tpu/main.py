"""CLI entry point (reference ``/root/reference/main.py:1-11``).

    python -m meta_interpolation_tpu.main --model cain --loss 1*L1 \
        --mode train --metasgd --optimizer Adam ...
"""
from __future__ import annotations

import jax

from .config import get_args
from .core.experiment import ExperimentBuilder
from .data import MetaLearningSystemDataLoader
from .meta.system import SceneAdaptiveInterpolation


def main(argv=None):
    cfg = get_args(argv)
    from .core.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    print(f"devices: {jax.devices()}")

    mesh = None
    n_dev = len(jax.devices())
    if cfg.spatial_shards > 1 and n_dev == 1:
        # a sharding request that cannot be honored must not silently run
        # the full-frame unsharded graph (the OOM it was meant to avoid)
        raise ValueError(
            f"--spatial_shards {cfg.spatial_shards} requested but only one "
            f"device is visible; spatial sharding needs a multi-chip mesh")
    if n_dev > 1 and (cfg.episode_parallel or cfg.spatial_shards > 1):
        from .parallel import mesh as mesh_lib
        shape = cfg.mesh_shape
        devices = None
        if cfg.spatial_shards > 1 and not shape:
            if not cfg.episode_parallel:
                # honor --episode_parallel false: spatial-only mesh on the
                # first spatial_shards devices, the rest stay idle
                shape = f"1x{cfg.spatial_shards}"
                devices = jax.devices()[:cfg.spatial_shards]
                print(f"[mesh] episode_parallel off: using "
                      f"{cfg.spatial_shards}/{n_dev} devices spatially")
            else:
                if n_dev % cfg.spatial_shards:
                    raise ValueError(
                        f"--spatial_shards {cfg.spatial_shards} must divide "
                        f"the device count ({n_dev})")
                shape = (f"{n_dev // cfg.spatial_shards}"
                         f"x{cfg.spatial_shards}")
        mesh = mesh_lib.make_mesh(shape, devices=devices)
        from .parallel.mesh import SPATIAL_AXIS
        if cfg.spatial_shards > 1 and mesh.shape[SPATIAL_AXIS] == 1:
            raise ValueError(
                f"--spatial_shards {cfg.spatial_shards} but --mesh_shape "
                f"{shape} has a spatial axis of 1; use NxM with "
                f"M == spatial_shards")
        print(f"mesh: {mesh}")

    system = SceneAdaptiveInterpolation(cfg, mesh=mesh)
    if cfg.pretrained_model:
        from .core import checkpoint as ckpt_lib
        print(f"Loading pretrained model: {cfg.pretrained_model}")
        net, loaded_mask = ckpt_lib.import_pth(
            cfg.pretrained_model, system.meta_params["net"],
            return_mask=True,
            convtranspose_pred=system.model_def.convtranspose_pred)
        system.meta_params["net"] = net
        if cfg.fix_loaded:
            system.freeze_loaded(loaded_mask)
            print("[fix_loaded] frozen the loaded parameters")

    task_size = 1
    if mesh is not None:
        from .parallel.mesh import TASK_AXIS
        task_size = mesh.shape[TASK_AXIS]
    data = MetaLearningSystemDataLoader(cfg, mesh_task_size=task_size)
    builder = ExperimentBuilder(cfg, data, system)
    return builder.run_experiment()


if __name__ == "__main__":
    main()
