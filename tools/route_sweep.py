#!/usr/bin/env python
"""Validate route_bf16 + tighter K/dup operating points on device.

Measures fwd+bwd ms and image/means-grad deviation of each candidate
config against the round-2 bench operating point (K=512, dup=8, fp32
route sort). Adoption rule (ROADMAP lever 1/2): take the fastest config
whose max image deviation stays < 1e-3 (~1/4 8-bit LSB) and relative
means-grad deviation < 1e-2.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _sweep_common import run_configs  # noqa: E402


def main():
    configs = [
        (8, 512, False),   # round-2 bench operating point (reference)
        (8, 512, True),
        (6, 512, True),
        (8, 384, True),
        (6, 384, True),
        (4, 512, True),    # tools/bench3m.py's 3M operating point
    ]
    rows = []
    for dup, K, bf16 in configs:
        ta = dict(tile_h=16, tile_w=16, max_per_tile=K, dup_factor=dup,
                  backend="pallas", route_bf16=bf16)
        rows.append((f"dup={dup:2d} K={K:4d} bf16={int(bf16)}", ta))
    run_configs(rows)


if __name__ == "__main__":
    main()
