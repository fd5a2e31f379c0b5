"""Hot ops — TPU-native (XLA gather / Pallas) replacements for the
reference's CUDA extensions (SURVEY.md §2.4).

  * warp.py                — bilinear grid sampling / backward warping
                             (replaces torch F.grid_sample use in RRIN /
                             SuperSloMo / VoxelFlow / PWCNet)
  * sepconv.py             — 51-tap adaptive separable convolution
                             (replaces sepconv/sepconv_op cupy kernels and
                             DAIN's separableconv_cuda)
  * correlation.py         — PWCNet cost volume
                             (replaces correlation_cuda)
  * flow_projection.py     — scatter-average flow projection, optionally
                             depth-weighted (replaces flowprojection_cuda,
                             depthflowprojection_cuda)
  * filter_interpolation.py— warp + local 4×4 adaptive filter
                             (replaces filterinterpolation_cuda)

All ops are differentiable (XLA autodiff through gather/scatter, or custom
VJPs where a hand-written backward is faster).
"""
