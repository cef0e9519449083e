"""Benchmark sweep harness: sustained receiver throughput for any config.

    python tools/bench_sweep.py --chain mono --channels 128 --bps 50
    python tools/bench_sweep.py --chain stereo_rds --fast --channels 64

Uses the honest sustained-throughput methodology (see bench.py / BASELINE.md):
`lax.scan` over device-resident blocks in one program, synchronized by a
scalar-reduction fetch.  On this dev box's tunnel-attached TPU, expect the
first run of any new (chain, channels, bps, steps) combination to spend
minutes in remote compilation; repeats hit the service-side cache.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sustained_msps(rx, n_ch: int, bps: int, n_steps: int, reps: int = 3
                   ) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    bs = rx.block_size_u8(bps)
    blocks = jax.device_put(np.random.default_rng(0).integers(
        0, 256, size=(n_steps, n_ch, bs), dtype=np.uint8))
    state0 = rx.init_state((n_ch,))

    @jax.jit
    def run_all(state, blocks):
        def body(st, blk):
            st2, out = rx.step(st, blk)
            return st2, sum(jnp.sum(v) for v in out.values())
        st, sums = jax.lax.scan(body, state, blocks)
        return jnp.sum(sums)

    t0 = time.perf_counter()
    total = float(run_all(state0, blocks))
    print(f"  compile+first run: {time.perf_counter() - t0:.1f} s "
          f"(checksum {total:.3g})", file=sys.stderr)
    t0 = time.perf_counter()
    for _ in range(reps):
        total = float(run_all(state0, blocks))
    dt = (time.perf_counter() - t0) / reps
    return n_ch * (bs // 2) * n_steps / dt / 1e6


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", default="mono",
                    choices=["mono", "stereo", "stereo_rds", "rds"])
    ap.add_argument("--mode", type=int, default=0)
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--bps", type=int, default=50,
                    help="reference blocks fused per step")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--fast", action="store_true",
                    help="fused bf16 front-end + chunked PLL")
    ap.add_argument("--fused", choices=["off", "f32", "bf16"], default=None)
    ap.add_argument("--pll", choices=["scan", "chunked", "pallas", "pallas_chunked"],
                    default=None)
    ap.add_argument("--fe-out-tile", type=int, default=None,
                    help="fused front-end banded-matmul output tile")
    ap.add_argument("--fe-sub-tiles", type=int, default=None,
                    help="split each front-end tile into N sub-matmuls")
    ap.add_argument("--pll-chunk", type=int, default=None,
                    help="chunked-PLL vectorization length")
    ap.add_argument("--filter-engine", choices=["direct", "fft"],
                    default="direct")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from sdr_tpu.models.receiver import Receiver

    kw = {}
    if args.fast:
        kw.update(fused_frontend="bf16", pll_impl="chunked")
    if args.fused:
        kw["fused_frontend"] = False if args.fused == "off" else args.fused
    if args.pll:
        kw["pll_impl"] = args.pll
    if args.fe_out_tile:
        kw["fe_out_tile"] = args.fe_out_tile
    if args.fe_sub_tiles:
        kw["fe_sub_tiles"] = args.fe_sub_tiles
    if args.pll_chunk:
        kw["pll_chunk"] = args.pll_chunk
    rx = Receiver(args.mode,
                  stereo=args.chain in ("stereo", "stereo_rds"),
                  rds=args.chain in ("rds", "stereo_rds"),
                  filter_engine=args.filter_engine, **kw)
    print(f"device: {jax.devices()[0].device_kind}; chain={args.chain} "
          f"mode={args.mode} C={args.channels} bps={args.bps} {kw}",
          file=sys.stderr)
    msps = sustained_msps(rx, args.channels, args.bps, args.steps, args.reps)
    print(f"{msps:.1f} IQ MS/s/chip ({msps / 2.4:.0f}x the 2.4 MS/s "
          f"real-time contract)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
