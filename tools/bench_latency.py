"""End-to-end block latency vs --blocks-per-step on the TPU.

The reference is a bounded-latency live pipeline: 2.67 ms RF blocks
(src/project.cpp:364) through a capacity-3 queue — at most ~8 ms of
pipeline lag (src/project.cpp:17).  The framework trades latency for
throughput with --blocks-per-step; this tool measures what each setting
actually costs per step so a live deployment can pick its point
(VERDICT r3 next-round item 5).

Two numbers per configuration:
  * compute ms/step — device-resident scanned-step time (amortized-sync
    methodology, same as bench.py): the latency the TPU itself adds.
  * dispatch ms/step — wall time of ONE un-amortized step including
    host->device feed and output fetch.  On THIS dev box that includes a
    ~27 ms tunnel round trip and a ~35 MB/s relay: quoted for honesty but
    labeled tunnel-bound; a production TPU host feeds over local PCIe
    (~us dispatch, GB/s DMA), where compute + block time bounds latency.

Usage: python tools/bench_latency.py [--stereo] [--n-ch 1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPEATS = 16


def compute_ms_per_step(rx, n_ch, bps, n_steps=8, reps=3) -> float:
    """Device-compute time per step via the amortized-sync scan."""
    import jax
    import jax.numpy as jnp

    bs = rx.block_size_u8(bps)
    rng = np.random.default_rng(0)
    blocks = jax.device_put(rng.integers(0, 256, size=(n_steps, n_ch, bs),
                                         dtype=np.uint8))
    state0 = rx.init_state((n_ch,))

    @jax.jit
    def run_all(state, blocks):
        def body(st, blk):
            st2, out = rx.step(st, blk)
            return st2, sum(jnp.sum(v) for v in out.values())

        def outer(carry, _):
            st, acc = carry
            st, sums = jax.lax.scan(body, st, blocks)
            return (st, acc + jnp.sum(sums)), None

        (st, acc), _ = jax.lax.scan(outer, (state, jnp.float32(0.0)),
                                    None, length=REPEATS)
        return acc

    float(run_all(state0, blocks))  # compile + warm
    dts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run_all(state0, blocks))
        dts.append(time.perf_counter() - t0)
    return sorted(dts)[len(dts) // 2] / REPEATS / n_steps * 1e3


def dispatch_ms_per_step(rx, n_ch, bps, reps=5) -> float:
    """One full un-amortized step: host feed -> step -> output fetch."""
    import jax

    bs = rx.block_size_u8(bps)
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=(n_ch, bs), dtype=np.uint8)
    state = rx.init_state((n_ch,))
    step = jax.jit(rx.step)
    state2, out = step(state, jax.numpy.asarray(raw))  # compile
    np.asarray(out["mono"])
    dts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _, out = step(state, jax.numpy.asarray(raw))
        np.asarray(out["mono"])  # force D2H of the audio
        dts.append(time.perf_counter() - t0)
    return sorted(dts)[len(dts) // 2] * 1e3


def main() -> int:
    import jax
    from sdr_tpu.models.receiver import Receiver

    ap = argparse.ArgumentParser()
    ap.add_argument("--stereo", action="store_true")
    ap.add_argument("--n-ch", type=int, default=1)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    # round-5 production fast profile (the CLI --fast engine set)
    kw = (dict(stereo=True, rds=True, fused_frontend="int8", pll_impl="ff",
               conv_dtype="bf16", fused_ifbank="bf16", conv_engine="tiled")
          if args.stereo else dict(fused_frontend="int8",
                                   conv_engine="tiled", conv_dtype="bf16"))
    rx = Receiver(0, **kw)

    print(f"{'bps':>4} {'block RF ms':>12} {'compute ms/step':>16} "
          f"{'dispatch ms/step':>17}  latency bound (prod host)",
          file=sys.stderr)
    for bps in (1, 2, 5, 25):
        c = compute_ms_per_step(rx, args.n_ch, bps)
        d = dispatch_ms_per_step(rx, args.n_ch, bps)
        # ACTUAL step block (engine alignment may enlarge it beyond
        # 2.667*bps — e.g. the fused IF-bank's 512-IF tiles)
        rf = rx.block_size_u8(bps) / 2 / rx.cfg.rf_fs * 1e3
        # double-buffered: latency <= block accumulation + compute
        print(f"{bps:>4} {rf:>12.2f} {c:>16.3f} {d:>17.1f}  "
              f"~{rf + c:.2f} ms", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
