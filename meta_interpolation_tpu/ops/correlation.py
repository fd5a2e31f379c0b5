"""Cost-volume correlation (PWCNet).

Reference: ``/root/reference/dain/PWCNet/correlation_package_pytorch1_0/
correlation_cuda_kernel.cu:76-143`` with the PWCNet instantiation
``Correlation(pad_size=4, kernel_size=1, max_displacement=4, stride1=1,
stride2=1)`` (PWCNet.py:71):

    out[tc](y, x) = (1/C) Σ_c f1(c, y, x) · f2(c, y+tj, x+ti)

for displacements tj, ti ∈ [−4, 4] (tc = (tj+4)*9 + (ti+4); 81 channels),
zero padding outside.

TPU formulation: 81 shifted elementwise multiplies + channel reductions —
XLA fuses the shift (pad+slice) into the multiply; the channel reduction
vectorizes on the VPU lanes. No custom kernel needed: the op is
memory-bound and XLA's fusion already reaches roofline here.
"""
from __future__ import annotations

import jax.numpy as jnp


def correlation(f1: jnp.ndarray, f2: jnp.ndarray,
                max_displacement: int = 4) -> jnp.ndarray:
    """NHWC feature maps → (N, H, W, (2d+1)²) cost volume."""
    n, h, w, c = f1.shape
    d = max_displacement
    f2p = jnp.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    outs = []
    for tj in range(-d, d + 1):
        for ti in range(-d, d + 1):
            shifted = f2p[:, d + tj:d + tj + h, d + ti:d + ti + w, :]
            outs.append(jnp.mean(f1 * shifted, axis=-1))
    return jnp.stack(outs, axis=-1)
