"""DAIN — Depth-Aware Video Frame Interpolation.

Reference subtree: ``/root/reference/dain/``. Components:
  * hourglass.py — MegaDepth HourGlass depth net (spec-driven; the reference
    model is a 761-line machine-generated torch graph, captured here as a
    JSON op tree extracted from its module structure)
  * s2df.py      — S2DF_3dense context feature net
  * pwcnet.py    — PWC-DC optical flow net (+ ops/correlation.py cost volume)
  * mononet.py   — MonoNet5 filter-kernel encoder-decoder
  * rectify.py   — MultipleBasicBlock_4 residual rectifier (the only
    meta-learned part — reference meta_learning_system.py:96-101)
  * model.py     — the composed DAIN forward (reference dain/networks/DAIN.py)
"""
