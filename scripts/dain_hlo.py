"""Dump optimized HLO for the monolithic DAIN apply and summarize the
expensive ops: gathers, copies/transposes, custom-calls and their layouts.

Run: python scripts/dain_hlo.py [batch]
"""
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meta_interpolation_tpu.core import compile_cache  # noqa: E402

compile_cache.enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from meta_interpolation_tpu.models.dain import model  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
H, W = 256, 448
DT = jnp.bfloat16

params = jax.tree.map(
    lambda x: x.astype(DT) if x.dtype == jnp.float32 else x,
    model.init(jax.random.PRNGKey(0)))
rs = np.random.RandomState(0)
x0 = jnp.asarray(rs.rand(B, H, W, 3), DT)
x2 = jnp.asarray(rs.rand(B, H, W, 3), DT)

mono = jax.jit(lambda a, b: model.apply(params, a, b, proj_range=8))
txt = mono.lower(x0, x2).compile().as_text()
out = "/tmp/dain_mono.hlo"
with open(out, "w") as f:
    f.write(txt)
print(f"wrote {out}: {len(txt.splitlines())} lines")

cnt = {}
for line in txt.splitlines():
    m = re.search(r"= (\S+?)\s+(gather|copy|transpose|custom-call|"
                  r"dynamic-slice|dynamic-update-slice|scatter)\(", line)
    if not m:
        m2 = re.search(r"\b(fusion)\(", line)
        if m2:
            kind = re.search(r'kind=(\w+)', line)
            k = f"fusion:{kind.group(1) if kind else '?'}"
            cnt[k] = cnt.get(k, 0) + 1
        continue
    op = m.group(2)
    cnt[op] = cnt.get(op, 0) + 1
for k in sorted(cnt):
    print(f"  {k:28s} {cnt[k]}")

# non-default layouts: a {d,...} minor order that is not descending
print("\nnon-default layouts (sample):")
seen = 0
for line in txt.splitlines():
    for m in re.finditer(r"\{(\d(?:,\d)+)(:[^}]*)?\}", line):
        dims = m.group(1).split(",")
        if dims != sorted(dims, reverse=True):
            print("  " + line.strip()[:220])
            seen += 1
            break
    if seen >= 25:
        break
print(f"(total lines with non-default layout shown: {seen})")
