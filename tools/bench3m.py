#!/usr/bin/env python
"""3M-Gaussian benchmark (BASELINE config 5 single-chip leg): the fwd+bwd
train step at 3M Gaussians / 1080p must fit one chip's HBM and sustain
throughput; the multi-chip leg (row-sharded Gaussians with all-gathered
culling) is exercised by dryrun_multichip / tests/test_parallel.

Round 3: measures the trained-statistics scene (like bench.py) at the
swept 1M operating point (dup=3, K=128, bf16 routing). The operating
point is extrapolated from the 1M sweep (tools/trained_sweep.py): at 3M
the same screen area is split over 3x the Gaussians, so per-tile depth
complexity before termination is no higher than at 1M; run with
`--validate` to add the exact (dup=8, K=512, f32) reference row and
measure the deviation directly.

Appends a row to RESULTS.md."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _sweep_common import run_configs  # noqa: E402


def main():
    rows = []
    if "--validate" in sys.argv:
        rows.append(("dup= 8 K= 512 bf16=0",
                     dict(tile_h=16, tile_w=16, max_per_tile=512,
                          dup_factor=8, backend="pallas",
                          route_bf16=False)))
    target_label = "dup= 3 K= 128 bf16=1"
    rows.append((target_label,
                 dict(tile_h=16, tile_w=16, max_per_tile=128, dup_factor=3,
                      backend="pallas", route_bf16=True)))
    results = run_configs(rows, iters=5, n=3_000_000, trained=True)
    target = next(r for r in results if r["label"] == target_label)
    if target["ms"] is None:
        raise SystemExit(f"target config {target_label!r} FAILED — no "
                         f"headline number recorded")
    ms, mps = target["ms"], target["mps"]
    line = (f"| rasterizer bench 3M Gaussians 1080p trained-stats scene "
            f"(single chip) | {ms:.0f} ms/step | {mps:.2f} MP/s fwd+bwd "
            f"| - | - |")
    print(line, flush=True)
    res = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "RESULTS.md")
    with open(res, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
