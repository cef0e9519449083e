"""Sweep fused-frontend tile geometry under the sustained (outer-repeat)
methodology from bench.py — the round-1 sweep that chose out_tile=128 /
sub_tiles=2 ran under the latency-dominated single-scan methodology and
may have picked the wrong point.

    python tools/sweep_frontend.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import _bench_scan  # noqa: E402
from sdr_tpu.models.receiver import Receiver  # noqa: E402


def main() -> int:
    # (out_tile, sub_tiles, blocks_per_step): IF samples per step is
    # 640*bps and must divide by out_tile (bps=50 -> 32000; bps=64 -> 40960)
    configs = [
        (128, 2, 50),   # current default
        (256, 2, 50),
        (256, 4, 50),
        (512, 4, 64),
        (512, 8, 64),
        (1024, 8, 64),
    ]
    for ot, st, bps in configs:
        rx = Receiver(0, fused_frontend="bf16", fe_out_tile=ot,
                      fe_sub_tiles=st)
        t0 = time.perf_counter()
        try:
            msps = _bench_scan(rx, 128, bps, 10)
        except Exception as e:  # Mosaic may reject some geometries
            print(f"out_tile={ot:5d} sub={st}:  FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)
            continue
        print(f"out_tile={ot:5d} sub={st}: {msps:9.1f} IQ MS/s "
              f"({time.perf_counter() - t0:.0f}s incl compile)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
