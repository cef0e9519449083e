"""Throughput benchmark: mono FM chain IQ Msamples/s per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's implicit performance contract is sustaining
real-time ingest of 2.4 MS/s IQ on a Raspberry Pi 4 (BASELINE.md) — so
vs_baseline = (IQ MS/s per chip) / 2.4, i.e. how many simultaneous
real-time mode-0 stations one chip sustains.

Method: batch of independent channels, jitted step with donated state,
device-resident input (compute throughput; H2D-inclusive number goes to
stderr).  Secondary metrics (stereo chain, single-channel) print to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _bench_chain(rx, n_ch: int, blocks_per_step: int, n_steps: int,
                 *, include_transfer: bool = False) -> float:
    """Return aggregate IQ Msamples/s."""
    import jax

    bs = rx.block_size_u8(blocks_per_step)
    rng = np.random.default_rng(0)
    host_block = rng.integers(0, 256, size=(n_ch, bs), dtype=np.uint8)
    state = rx.init_state((n_ch,))
    step = jax.jit(rx.step, donate_argnums=0)

    dev_block = jax.device_put(host_block)
    # warmup / compile
    state, out = step(state, dev_block)
    jax.block_until_ready((state, out))

    t0 = time.perf_counter()
    for _ in range(n_steps):
        if include_transfer:
            dev_block = jax.device_put(host_block)
        state, out = step(state, dev_block)
    jax.block_until_ready((state, out))
    dt = time.perf_counter() - t0
    iq_pairs = n_ch * (bs // 2) * n_steps
    return iq_pairs / dt / 1e6


def main() -> int:
    import jax
    from sdr_tpu.models.receiver import Receiver

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    # headline: mono chain, 32 channels, 25 reference blocks (~0.13 s RF)
    # per jit step — measured sweet spot on TPU v5e (larger fused blocks
    # blow up tunnel-side compile time for no throughput gain)
    rx_mono = Receiver(0)
    n_ch, bps, steps = 32, 25, 20
    msps = _bench_chain(rx_mono, n_ch, bps, steps)
    print(f"mono  {n_ch}ch compute: {msps:9.1f} IQ MS/s/chip", file=sys.stderr)

    msps_xfer = _bench_chain(rx_mono, n_ch, bps, max(steps // 2, 2),
                             include_transfer=True)
    print(f"mono  {n_ch}ch w/ H2D:  {msps_xfer:9.1f} IQ MS/s/chip",
          file=sys.stderr)

    rx_st = Receiver(0, stereo=True)
    msps_st = _bench_chain(rx_st, n_ch, bps, 4)
    print(f"stereo {n_ch}ch compute: {msps_st:8.1f} IQ MS/s/chip",
          file=sys.stderr)

    print(json.dumps({
        "metric": "mono_fm_iq_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / 2.4, 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
