#!/usr/bin/env python
"""(dup, K) operating-point sweep on the TRAINED-statistics bench scene
(bimodal opacity — see _sweep_common.bench_scene). Reference row is the
exact wide point (dup=8, K=512, f32 routing) unless configs are given on
the CLI as dup:K:bf16 triples (first row = reference). Adoption rule as
ever: image deviation < 1e-3 (~1/4 of an 8-bit LSB), relative means-grad
deviation < 1e-2."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _sweep_common import run_configs  # noqa: E402


def main():
    if len(sys.argv) > 1:
        configs = [tuple(int(v) for v in a.split(":"))
                   for a in sys.argv[1:]]
    else:
        configs = [
            (8, 512, 0),
            (4, 256, 1),
            (4, 192, 1),
            (4, 160, 1),
            (3, 192, 1),
            (4, 128, 1),
        ]
    rows = []
    for dup, K, bf16 in configs:
        ta = dict(tile_h=16, tile_w=16, max_per_tile=K, dup_factor=dup,
                  backend="pallas", route_bf16=bool(bf16))
        rows.append((f"dup={dup:2d} K={K:4d} bf16={int(bf16)}", ta))
    run_configs(rows, trained=True)


if __name__ == "__main__":
    main()
