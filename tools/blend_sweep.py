#!/usr/bin/env python
"""Sweep the Pallas blend grid knobs (tb tiles/program, cs entries/step)
at the current bench operating point (K=384, dup=6, bf16 routing).

Larger tb amortizes grid overhead but coarsens the early-out granularity
(a block skips a chunk only when EVERY tile in it is done); larger cs
deepens the double-buffered entry block but rounds the per-tile work up to
a coarser multiple. tb changes are bitwise-identical to (8, 64); cs changes
alter the FP association order of the Hillis-Steele prefix product/sum (one
128-deep tree vs two chained 64-deep trees), so ulp-level (~1e-7) deviations
are expected there — not exact zeros.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _sweep_common import run_configs  # noqa: E402


def main():
    # tb*cs*P*4B is the per-temporary VMEM stack unit of the blend kernels
    # (~10 live [tb, cs, P] f32 temps in the backward); tb*cs > 1024 at
    # P=256 exceeds the 16M scoped-vmem limit (measured: (16,128) OOMs at
    # 27.9M). Feasible sweep: products <= 1024.
    import sys as _sys

    k = 128 if "--trained" in _sys.argv else 384
    dup = 2 if "--trained" in _sys.argv else 6
    configs = []
    for tb, cs in [(8, 64), (16, 64), (4, 64), (8, 128), (4, 128),
                   (16, 32), (8, 32)]:
        if tb * cs > 1024 or cs > k:
            continue
        ta = dict(tile_h=16, tile_w=16, max_per_tile=k, dup_factor=dup,
                  backend="pallas", route_bf16=True, blend_tb=tb,
                  blend_cs=cs)
        configs.append((f"tb={tb:2d} cs={cs:4d}", ta))
    run_configs(configs, trained="--trained" in _sys.argv)


if __name__ == "__main__":
    main()
