"""Wideband channelizer throughput: wideband MS/s per chip, per engine.

    python tools/bench_channelizer.py --stations 16 64 --engines mfb \
        --dtypes f32 bf16 --u8

Same methodology as bench.py: lax.scan over device-resident wideband
blocks in one program, re-scanned REPEATS times with state flowing
through (no CSE), so ONE scalar-reduction D2H sync amortizes over
REPEATS*n_steps steps — this dev box's block_until_ready is a no-op and
the sync fetch costs ~27 ms of tunnel latency (the round-2 channelizer
numbers in BASELINE.md were measured WITHOUT this amortization and
understate the engine; VERDICT r3 next-round item 2).

--u8 additionally times `call_interleaved` on raw u8 IQ (fleet-scale
ingest semantics, reference src/iofunc.cpp:62-69: bytes travel, the
(x-128)/128 decode happens on-device inside the tile loop).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPEATS = 16


def _timed(run_all, *args, reps: int = 3):
    total = float(run_all(*args))  # compile + warm
    assert np.isfinite(total)
    dts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        total = float(run_all(*args))
        dts.append(time.perf_counter() - t0)
    vals = sorted(dts)
    return vals[len(vals) // 2], (vals[0], vals[-1])


def bench(engine: str, k: int, n_wide: int, n_steps: int, reps: int = 3,
          dtype: str = "f32", u8: bool = False, out_dtype: str = "f32"):
    import jax
    import jax.numpy as jnp
    from sdr_tpu.ops.channelizer import WidebandChannelizer

    fs_wide, fs_out = 9.6e6, 2.4e6
    freqs = list(np.linspace(-4.0e6, 4.0e6, k))
    chan = WidebandChannelizer(fs_wide, fs_out, freqs, engine=engine,
                               compute_dtype=dtype,
                               ingest="u8" if u8 else "f32",
                               out_dtype=out_dtype)
    rng = np.random.default_rng(0)
    state0 = chan.init_state()

    if u8 == "cols":
        # pre-phased (2D, N/D) u8 layout (host deinterleaves during ingest
        # framing): the pallas engine's zero-device-prep path
        xbt = jax.device_put(rng.integers(
            0, 256, size=(2 * chan.decim, n_wide // chan.decim),
            dtype=np.uint8))

        @jax.jit
        def run_all(state, xbt):
            def body(carry, _):
                st, acc = carry
                (i_o, q_o), st2 = chan._pl.call_cols(xbt, st)
                return (st2, acc + i_o[0, 0] + q_o[0, 0]), None

            (st, acc), _ = jax.lax.scan(
                body, (state, jnp.float32(0.0)), None,
                length=REPEATS * n_steps)
            return acc

        dt, (lo, hi) = _timed(run_all, state0, xbt, reps=reps)
    elif u8:
        # ONE device-resident block re-fed every step with state flowing
        # through (no CSE) — scanning a stacked (n_steps, ...) input made
        # XLA dynamic-slice-copy the raw bytes every step, an artifact of
        # the bench packing that live feeds never pay (same fix as
        # bench.py round 4; measured 106 us/step here)
        wide = jax.device_put(rng.integers(
            0, 256, size=(2 * n_wide,), dtype=np.uint8))

        @jax.jit
        def run_all(state, wide):
            def body(carry, _):
                st, acc = carry
                (i_o, q_o), st2 = chan.call_interleaved(wide, st)
                return (st2, acc + i_o[0, 0] + q_o[0, 0]), None

            (st, acc), _ = jax.lax.scan(
                body, (state, jnp.float32(0.0)), None,
                length=REPEATS * n_steps)
            return acc

        dt, (lo, hi) = _timed(run_all, state0, wide, reps=reps)
    else:
        iw = jax.device_put(rng.standard_normal(
            (n_steps, n_wide)).astype(np.float32))
        qw = jax.device_put(rng.standard_normal(
            (n_steps, n_wide)).astype(np.float32))

        @jax.jit
        def run_all(state, iw, qw):
            def body(st, blk):
                (i_o, q_o), st2 = chan(blk[0], blk[1], st)
                return st2, jnp.sum(i_o) + jnp.sum(q_o)

            def outer(carry, _):
                st, acc = carry
                st, sums = jax.lax.scan(body, st, (iw, qw))
                return (st, acc + jnp.sum(sums)), None

            (st, acc), _ = jax.lax.scan(outer, (state, jnp.float32(0.0)),
                                        None, length=REPEATS)
            return acc

        dt, (lo, hi) = _timed(run_all, state0, iw, qw, reps=reps)
    work = n_wide * n_steps * REPEATS / 1e6
    return work / dt, (work / hi, work / lo)


def main() -> int:
    import jax
    ap = argparse.ArgumentParser()
    ap.add_argument("--stations", type=int, nargs="+", default=[16, 64])
    ap.add_argument("--engines", nargs="+", default=["mfb", "mix"])
    ap.add_argument("--dtypes", nargs="+", default=["f32"])
    ap.add_argument("--u8", action="store_true",
                    help="also time u8-interleaved ingest (mfb only)")
    ap.add_argument("--out-dtype", default="f32", choices=["f32", "bf16"],
                    help="pallas engine output materialization dtype")
    ap.add_argument("--n-wide", type=int, default=1 << 20)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    for k in args.stations:
        for eng in args.engines:
            for dt in args.dtypes:
                ingests = [False] + ([True] if args.u8
                                     and eng in ("mfb", "pallas") else [])
                if args.u8 and eng == "pallas":
                    ingests.append("cols")
                for u8 in ingests:
                    msps, (lo, hi) = bench(eng, k, args.n_wide, args.steps,
                                           dtype=dt, u8=u8,
                                           out_dtype=args.out_dtype)
                    rt = msps / 9.6  # x realtime at the 9.6 MS/s capture
                    sfx = {False: "", True: "-u8", "cols": "-u8c"}[u8]
                    tag = f"{eng}{sfx:4s}/{dt:4s}"
                    print(f"{tag} K={k:3d}: {msps:9.1f} wideband MS/s "
                          f"({lo:.0f}..{hi:.0f}; {rt:7.1f}x realtime)",
                          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
