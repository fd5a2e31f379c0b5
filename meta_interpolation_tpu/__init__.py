"""meta_interpolation_tpu — TPU-native scene-adaptive video frame interpolation.

A ground-up JAX / XLA / Pallas re-design of the capabilities of
myungsub/meta-interpolation (SAVFI, CVPR 2020): five VFI backbones (CAIN,
SepConv, RRIN, SuperSloMo, VoxelFlow) plus the DAIN tier, wrapped in a
MAML / MAML++ / Meta-SGD / L2F scene-adaptation engine.

Design stance (vs. the PyTorch reference at /root/reference):
  * models are pure functions ``apply(params, frame0, frame1)`` over flax
    pytrees — the reference's 1,199-line ``params=`` threading machinery
    (reference model_utils.py:272-1053) is unnecessary in JAX.
  * the inner loop is ``jax.lax.scan`` over functional optimizer updates with
    ``jax.grad`` inside (grad-of-grad for second order), jit-compiled once per
    episode (reference meta_learning_system.py:346-472 python loops).
  * task parallelism is ``jax.vmap``; device parallelism is ``shard_map`` over a
    ``jax.sharding.Mesh`` with ``psum`` outer-gradient reduction (the reference
    has no distributed path at all — SURVEY.md §2.5).
  * the reference's CUDA ops (sepconv, warps, correlation, flow projection)
    are Pallas kernels / XLA-native formulations with custom VJPs.
"""

__version__ = "0.1.0"
