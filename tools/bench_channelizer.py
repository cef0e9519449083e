"""Wideband channelizer throughput: wideband MS/s per chip, per engine.

    python tools/bench_channelizer.py --stations 16 64 --engines mfb mix

Same methodology as bench.py: lax.scan over device-resident wideband
blocks in one program, synchronized by a scalar-reduction fetch (the
tunnel-attached dev backend's block_until_ready is a no-op).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(engine: str, k: int, n_wide: int, n_steps: int, reps: int = 3,
          dtype: str = "f32"):
    import jax
    import jax.numpy as jnp
    from sdr_tpu.ops.channelizer import WidebandChannelizer

    fs_wide, fs_out = 9.6e6, 2.4e6
    freqs = list(np.linspace(-4.0e6, 4.0e6, k))
    chan = WidebandChannelizer(fs_wide, fs_out, freqs, engine=engine,
                               compute_dtype=dtype)
    rng = np.random.default_rng(0)
    iw = jax.device_put(rng.standard_normal(
        (n_steps, n_wide)).astype(np.float32))
    qw = jax.device_put(rng.standard_normal(
        (n_steps, n_wide)).astype(np.float32))
    state0 = chan.init_state()

    @jax.jit
    def run_all(state, iw, qw):
        def body(st, blk):
            (i_o, q_o), st2 = chan(blk[0], blk[1], st)
            return st2, jnp.sum(i_o) + jnp.sum(q_o)
        st, sums = jax.lax.scan(body, state, (iw, qw))
        return jnp.sum(sums)

    total = float(run_all(state0, iw, qw))  # warm + sync
    t0 = time.perf_counter()
    for _ in range(reps):
        total = float(run_all(state0, iw, qw))
    dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(total)
    return n_wide * n_steps / dt / 1e6


def main() -> int:
    import jax
    ap = argparse.ArgumentParser()
    ap.add_argument("--stations", type=int, nargs="+", default=[16, 64])
    ap.add_argument("--engines", nargs="+", default=["mfb", "mix"])
    ap.add_argument("--dtypes", nargs="+", default=["f32"])
    ap.add_argument("--n-wide", type=int, default=1 << 20)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    for k in args.stations:
        for eng in args.engines:
            for dt in args.dtypes:
                msps = bench(eng, k, args.n_wide, args.steps, dtype=dt)
                rt = msps / 9.6  # x realtime at the 9.6 MS/s capture rate
                print(f"{eng:4s}/{dt:4s} K={k:3d}: {msps:9.1f} wideband "
                      f"MS/s ({rt:7.1f}x realtime)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
