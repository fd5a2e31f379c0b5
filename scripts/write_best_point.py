"""Write checkpoint/serving_best_point.json — the measured best serving
operating point that `bench.py --serving` (and the bare headline) runs by
default.

Usage: python scripts/write_best_point.py <graph_token> <pareto_log>
         <quality_log>

<graph_token>: the picked point (pick_bw_point.py output minus the
cain_serving_ prefix, e.g. bw2).
<pareto_log>:  serving_pareto.py output containing the point's measured
fps row (``pad8 fuse[bwJ]   1234.5 | ...``).
<quality_log>: serving_quality.py --ckpts_only output containing the
point's native-checkpoint delta row
(``bwJ-NATIVE ckpt serving-mode PSNR minus exact-ckpt exact-mode PSNR:
+X.XXX dB``).

Refuses to write when either measurement is missing — the best-point file
feeds the headline JSON's quality qualifier, which must describe a real
measurement (VERDICT r4 item 4).
"""
import json
import os
import re
import sys


def main():
    graph, pareto_log, quality_log = sys.argv[1:4]
    fps = None
    with open(pareto_log) as f:
        for line in f:
            m = re.search(rf"fuse\[{re.escape(graph)}\]\s+([0-9.]+)", line)
            if m:
                fps = float(m.group(1))
    delta = None
    with open(quality_log) as f:
        for line in f:
            m = re.search(
                rf"{re.escape(graph)}-NATIVE ckpt serving-mode PSNR minus "
                rf"exact-ckpt exact-mode PSNR: ([+-][0-9.]+) dB", line)
            if m:
                delta = float(m.group(1))
    if fps is None or delta is None:
        raise SystemExit(
            f"refusing to write best point: fps={fps} (from {pareto_log}) "
            f"delta={delta} (from {quality_log}) — both must be measured")
    out = {
        "graph": graph,
        "fps": fps,
        "quality_delta_db_vs_exact": delta,
        "note": (f"native {graph} ckpt under its own graph, n=64 "
                 f"adapted-query PSNR vs the exact-trained anchor's "
                 f"exact-mode PSNR (scripts/measure_r5.sh)"),
    }
    os.makedirs("checkpoint", exist_ok=True)
    path = "checkpoint/serving_best_point.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{path}: {out}")


if __name__ == "__main__":
    main()
