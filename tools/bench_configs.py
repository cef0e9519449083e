"""Quick full-chain config shootout on real TPU (stereo+RDS engines).

Times Receiver.step at the production shape for a list of engine configs
with the same amortized-sync methodology as bench.py; prints GS/s per
config to stderr.  Used to pick bench.py's headline stereo engine set.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPEATS = 16


def bench(rx, n_ch=128, bps=50, n_steps=8, reps=3) -> float:
    import jax
    import jax.numpy as jnp

    bs = rx.block_size_u8(bps)
    rng = np.random.default_rng(0)
    # ONE device-resident block fed to every step (the carried state still
    # evolves, so no CSE).  Scanning over an (n_steps, ...) stack made XLA
    # materialize a dynamic-slice COPY of the raw bytes every step — 12%
    # of the stereo step in the round-4 profile — an artifact of the bench
    # packing, not of the receiver: live deployments feed each block
    # directly (fresh H2D buffer), and offline Receiver.run reads each
    # block slice exactly once.
    block = jax.device_put(rng.integers(
        0, 256, size=(n_ch, bs), dtype=np.uint8))
    state0 = rx.init_state((n_ch,))

    @jax.jit
    def run_all(state, block):
        def body(st, _):
            st2, out = rx.step(st, block)
            return st2, sum(jnp.sum(v) for v in out.values())

        def outer(carry, _):
            st, acc = carry
            st, sums = jax.lax.scan(body, st, None, length=n_steps)
            return (st, acc + jnp.sum(sums)), None

        (st, acc), _ = jax.lax.scan(outer, (state, jnp.float32(0.0)),
                                    None, length=REPEATS)
        return acc

    total = float(run_all(state0, block))
    assert np.isfinite(total), "non-finite chain output"
    dts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        total = float(run_all(state0, block))
        dts.append(time.perf_counter() - t0)
    # median of reps (same statistic as bench.py — an optimistic best-of
    # here risked repeating the round-2 "51.8 did not reproduce" drift),
    # plus min..max spread for the printout
    work = n_ch * (bs // 2) * n_steps * REPEATS / 1e9
    vals = sorted(work / dt for dt in dts)
    return vals[len(vals) // 2], (vals[0], vals[-1])


def main() -> int:
    import jax
    from sdr_tpu.models.receiver import Receiver

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    configs = [
        ("ff+bf16conv+ifbank-bf16 (r3 headline)",
         dict(fused_frontend="bf16", pll_impl="ff", conv_dtype="bf16",
              fused_ifbank="bf16")),
        ("r3 headline + tiled convs",
         dict(fused_frontend="bf16", pll_impl="ff", conv_dtype="bf16",
              fused_ifbank="bf16", conv_engine="tiled")),
        ("tiled convs, f32",
         dict(fused_frontend="bf16", pll_impl="ff",
              fused_ifbank="bf16", conv_engine="tiled")),
        ("tiled convs, no ifbank",
         dict(fused_frontend="bf16", pll_impl="ff", conv_dtype="bf16",
              conv_engine="tiled")),
    ]
    for name, kw in configs:
        try:
            gs, (lo, hi) = bench(Receiver(0, stereo=True, rds=True, **kw))
            print(f"  {name:32s} {gs:6.2f} GS/s ({lo:.2f}..{hi:.2f})",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — shootout must survive a bad cfg
            print(f"  {name:32s} FAILED: {e!r}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
