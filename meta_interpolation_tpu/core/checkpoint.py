"""Checkpoint / resume + torch ``.pth`` → pytree conversion.

Reference behavior (``/root/reference/utils.py:34-118``,
``experiment_builder.py:308-314``): save per epoch to
``checkpoint/<exp>/checkpoint.pth`` with ``{'epoch','arch','state_dict',
'best_PSNR'}``; copy to ``model_best.pth`` when PSNR improves; loads are
key/shape-mismatch tolerant (``lossy_load_state_dict``, utils.py:89-107).

Here the native format stores numpy-converted pytrees (pickle) —
``checkpoint.pkl`` / ``model_best.pkl`` — and :func:`torch_state_dict_to_pytree`
imports the released torch weights: our param trees intentionally mirror the
torch module names, so conversion is name-split + layout transpose
(OIHW→HWIO convs, (out,in)→(in,out) linears, BN running stats).
"""
from __future__ import annotations

import os
import pickle
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PyTree = Any


# ---------------------------------------------------------------------------
# native save / load
# ---------------------------------------------------------------------------

def _to_numpy(tree: PyTree) -> PyTree:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(state: Dict[str, Any], directory: str,
                    is_best: bool = False, filename: str = "checkpoint.pkl"):
    """Save {'epoch', 'arch', 'state_dict', 'best_PSNR'}-style state."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, filename)
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(state), f)
    if is_best:
        shutil.copyfile(path, os.path.join(directory, "model_best.pkl"))


def load_checkpoint(directory: str, filename: str = "checkpoint.pkl"
                    ) -> Optional[Dict[str, Any]]:
    path = os.path.join(directory, filename)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)


def lossy_merge(target: PyTree, loaded: PyTree, verbose: bool = True,
                return_mask: bool = False) -> PyTree:
    """Merge ``loaded`` into ``target``, skipping missing keys and shape
    mismatches (reference lossy_load_state_dict, utils.py:89-107).

    ``return_mask``: also return a bool pytree marking which leaves were
    actually loaded — consumed by ``--fix_loaded`` (reference utils.py:79-84
    freezes the loaded parts)."""
    t_paths, treedef = jax.tree_util.tree_flatten_with_path(target)
    flat_l = {jax.tree_util.keystr(kp): v for kp, v in
              jax.tree_util.tree_flatten_with_path(loaded)[0]}
    leaves = []
    loaded_flags = []
    skipped = []
    for kp, v in t_paths:
        k = jax.tree_util.keystr(kp)
        lv = flat_l.get(k)
        ok = lv is not None and tuple(np.shape(lv)) == tuple(np.shape(v))
        loaded_flags.append(ok)
        if ok:
            leaves.append(jnp.asarray(lv))
        else:
            leaves.append(v)
            if lv is not None:
                skipped.append(k)
    if verbose and skipped:
        print(f"[checkpoint] skipped {len(skipped)} mismatched keys: "
              f"{skipped[:5]}{'...' if len(skipped) > 5 else ''}")
    merged = jax.tree_util.tree_unflatten(treedef, leaves)
    if return_mask:
        return merged, jax.tree_util.tree_unflatten(treedef, loaded_flags)
    return merged


# ---------------------------------------------------------------------------
# torch .pth import
# ---------------------------------------------------------------------------

def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint to {name: numpy} without needing CUDA."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k.replace("module.", ""): v.detach().numpy()
            for k, v in obj.items() if hasattr(v, "detach")}


def _convert_leaf(name_parts, value: np.ndarray,
                  convtranspose_pred=None) -> Tuple[str, np.ndarray]:
    """Map a torch parameter leaf to (our_key, converted_array).

    ``convtranspose_pred(name_parts) -> bool`` marks ConvTranspose2d
    weights, whose torch layout is (in, out, kh, kw) — NOT Conv2d's
    (out, in, kh, kw) — so they need transpose (2,3,0,1) to land HWIO.
    Shape inspection cannot distinguish the two (square kernels convert
    silently transposed), hence the explicit name predicate
    (ModelDef.convtranspose_pred; DAIN's PWC deconv/upfeat layers)."""
    leaf = name_parts[-1]
    if leaf == "weight":
        if value.ndim == 4:  # conv OIHW → HWIO
            if convtranspose_pred is not None and convtranspose_pred(
                    name_parts):
                return "kernel", value.transpose(2, 3, 0, 1)
            return "kernel", value.transpose(2, 3, 1, 0)
        if value.ndim == 2:  # linear (out,in) → (in,out)
            return "kernel", value.transpose(1, 0)
        return "scale", value  # norm-layer weight
    if leaf in ("bias",):
        return "bias", value
    if leaf == "running_mean":
        return "mean", value
    if leaf == "running_var":
        return "var", value
    if leaf == "num_batches_tracked":
        return "", value  # dropped
    return leaf, value


def torch_state_dict_to_pytree(state_dict: Dict[str, np.ndarray],
                               transpose_convs: bool = True,
                               convtranspose_pred=None) -> PyTree:
    """Build a nested-dict pytree from flat torch names.

    ``encoder.interpolate.headConv.weight`` →
    ``tree['encoder']['interpolate']['headConv']['kernel']`` (HWIO).
    ``convtranspose_pred``: see :func:`_convert_leaf`.
    """
    tree: Dict[str, Any] = {}
    for name, value in state_dict.items():
        parts = name.split(".")
        key, conv = _convert_leaf(parts, np.asarray(value),
                                  convtranspose_pred=convtranspose_pred)
        if key == "":
            continue
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[key] = jnp.asarray(conv)
    return tree


def import_pth(path: str, target_params: PyTree,
               return_mask: bool = False,
               convtranspose_pred=None) -> PyTree:
    """Import released torch weights into a params tree of ours: convert then
    lossy-merge (tolerating extra / missing / mismatched keys the same way
    the reference does for its released .pth files). ``return_mask`` also
    returns the loaded-leaf mask for ``--fix_loaded``.
    ``convtranspose_pred``: ModelDef.convtranspose_pred — marks torch
    ConvTranspose2d weights (see :func:`_convert_leaf`)."""
    sd = load_torch_file(path)
    converted = torch_state_dict_to_pytree(
        sd, convtranspose_pred=convtranspose_pred)
    return lossy_merge(target_params, converted, return_mask=return_mask)
