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
    if len(jax.devices()) > 1 and (cfg.episode_parallel
                                   or cfg.spatial_shards > 1):
        from .parallel import mesh as mesh_lib
        shape = cfg.mesh_shape
        if cfg.spatial_shards > 1 and not shape:
            n_dev = len(jax.devices())
            if n_dev % cfg.spatial_shards:
                raise ValueError(
                    f"--spatial_shards {cfg.spatial_shards} must divide "
                    f"the device count ({n_dev})")
            shape = (f"{n_dev // cfg.spatial_shards}"
                     f"x{cfg.spatial_shards}")
        mesh = mesh_lib.make_mesh(shape)
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
