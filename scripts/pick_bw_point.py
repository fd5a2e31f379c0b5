"""Pick the boundary-fuse operating point to native-train (r4e).

Parses a serving_pareto.py log, looks at the bw* rows (RCAB-granular
boundary fuse, cain.boundary_fuse), and prints the train_synth_ckpt
preset name of the selected point:

  among bw points with measured fps >= threshold (default 1002 — a
  run-to-run-noise buffer above the 1000-fps north-star line), the one
  with the highest PSNR; if none qualifies, the highest-fps bw point.

Usage: python scripts/pick_bw_point.py /tmp/pareto_bw_r4e.log [--min_fps F]
"""
import re
import sys


def main():
    path = sys.argv[1]
    min_fps = 1002.0
    if "--min_fps" in sys.argv:
        min_fps = float(sys.argv[sys.argv.index("--min_fps") + 1])
    rows = []
    pat = re.compile(
        r"fuse\[(bw[0-9x]+)\]\s+([0-9.]+|nan)\s*\|\s*([0-9.]+)")
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                fps = float(m.group(2))  # nan parses as float('nan')
                rows.append((m.group(1), fps, float(m.group(3))))
    if not rows:
        raise SystemExit("no bw rows found in " + path)
    if all(r[1] != r[1] for r in rows):  # nan != nan
        # a --psnr_only pareto log has no fps cells: any 'highest-fps'
        # fallback over them would silently pick an arbitrary row
        raise SystemExit(
            f"all {len(rows)} bw rows in {path} have fps=nan (psnr-only "
            f"log?) — the pick needs fps-measured rows")
    qual = [r for r in rows if r[1] >= min_fps]
    pick = (max(qual, key=lambda r: r[2]) if qual
            else max((r for r in rows if r[1] == r[1]),
                     key=lambda r: r[1]))
    sys.stderr.write(f"bw rows: {rows}\npicked: {pick}\n")
    print(f"cain_serving_{pick[0]}")


if __name__ == "__main__":
    main()
