"""Time-axis sequence parallelism for the mono chain: halo-exchange
overlap-save over a device mesh.

SURVEY §5.7: the reference scales the unbounded sample stream by block
streaming with carried tails — the ancestor of overlap-save.  The mono chain
(channelize -> discriminator -> audio resample) has *no unbounded
recurrence*: every audio sample depends on a bounded window of past raw
samples (FIR tails + the discriminator's one-sample lookback).  So the time
axis shards exactly: device d processes its contiguous chunk plus a left
halo received from device d-1 via `ppermute`, runs the chain statelessly,
and drops the warm-up outputs.  Bit-identical to the sequential scan
(verified in tests/test_parallel.py) with one neighbor exchange per step —
the ICI-riding pattern the SNIPPETS right-permute kernel demonstrates.

The stereo chain carries a true sequential recurrence (the pilot PLL), but
the recurrence is *self-forgetting*: a type-2 PLL locked to the pilot tone
converges to a state determined by the input signal, not by its initial
conditions (lock-in for bw=0.01 at 240 kHz IF is ~1-2 ms ~= 300-500 IF
samples).  `timesharded_stereo` therefore extends each device's left halo
by a PLL warm-up region: every device runs the full stereo chain from a
cold state over (warm-up + chunk), locks during the warm-up, and drops the
warm-up outputs.  No inter-device PLL state handoff — devices run fully in
parallel — at the cost of `warmup_if` redundant IF samples per device.
Equivalence to the serial scan is behavioral (stereo separation / stream
SNR within tolerance, tests/test_parallel.py), not bit-exact: the dropped
transient differs.  RDS could shard the same way (its carrier PLL
bw=0.003 needs a ~4x longer warm-up); the host-side frame sync consumes
the concatenated soft stream unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from sdr_tpu.config import ModeConfig
from sdr_tpu.models.receiver import Receiver


def halo_if(cfg: ModeConfig, if_align: int = 1) -> int:
    """Left-context depth of the mono chain in IF samples.

    audio FIR needs ceil((audio_taps-1)/U) IF samples back, +1 for the
    discriminator's previous sample, + ceil((rf_taps-1)/rf_decim) IF slots
    whose raw windows reach past the halo start; rounded up to a multiple of
    audio_decim (polyphase output-grid phase alignment) and of `if_align`
    (e.g. the fused front-end's 128-sample output tile).
    """
    ctx = (-(-(cfg.audio_taps - 1) // cfg.audio_interp) + 1
           + -(-(cfg.rf_taps - 1) // cfg.rf_decim))
    unit = int(np.lcm(cfg.audio_decim, if_align))
    return -(-ctx // unit) * unit


def halo_pairs(cfg: ModeConfig, if_align: int = 1) -> int:
    """Left-context depth in raw IQ pairs."""
    return halo_if(cfg, if_align) * cfg.rf_decim


def _if_align(rx: Receiver) -> int:
    return rx._fused_fe.out_tile if rx.fused_frontend else 1


def timesharded_mono(rx: Receiver, iq_u8, mesh: Mesh, *, axis: str = "time"):
    """Mono-decode a single station's u8 stream with time sharded over mesh.

    iq_u8: (n,) u8, n divisible by (devices * 2*rf_decim*audio_decim).
    Returns the audio stream, identical to rx.run(iq_u8)['mono'].
    """
    cfg = rx.cfg
    n_dev = mesh.shape[axis]
    n = iq_u8.shape[-1]
    chunk_u8 = n // n_dev
    ia = _if_align(rx)
    align = 2 * cfg.rf_decim * int(np.lcm(cfg.audio_decim, ia))
    assert chunk_u8 % align == 0, (
        f"per-device chunk {chunk_u8} not aligned to {align}")
    halo_u8 = 2 * halo_pairs(cfg, ia)
    warm_audio = halo_if(cfg, ia) * cfg.audio_interp // cfg.audio_decim

    iq = jax.device_put(np.asarray(iq_u8),
                        NamedSharding(mesh, P(axis)))

    @partial(shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
             check_vma=False)
    def run_shard(local):
        local = local.reshape(-1)  # (chunk_u8,)
        tail = local[-halo_u8:]
        # right-shift: device d's tail becomes device d+1's left halo.
        halo = jax.lax.ppermute(tail, axis,
                                perm=[(i, i + 1) for i in range(n_dev - 1)])
        # device 0 receives no halo; u8 value 128 decodes to 0.0, matching
        # the sequential run's zero-filled initial filter tails (ppermute's
        # zero fill would decode to -1.0).
        idx = jax.lax.axis_index(axis)
        halo = jnp.where(idx == 0, jnp.uint8(128), halo)
        extended = jnp.concatenate([halo, local])
        state = rx.init_state()
        _, out = rx.step(state, extended)
        audio = out["mono"][warm_audio:]
        return audio

    return jax.jit(run_shard)(iq)


def stereo_warmup_if(rx: Receiver, warmup_if: int = 4096) -> int:
    """Left-halo depth (IF samples) for the time-sharded stereo chain:
    FIR/discriminator context + BPF group delay + mono delay line + PLL
    lock-in, rounded so (a) the polyphase output grid and fused-front-end
    tile stay aligned and (b) the pilot NCO's free-run phase over the
    zero-filled device-0 halo is a whole number of cycles (keeps device 0
    near-identical to the serial cold start)."""
    cfg = rx.cfg
    ia = _if_align(rx)
    ctx = (halo_if(cfg, 1) + cfg.bp_taps
           + cfg.mono_delay * cfg.audio_decim // cfg.audio_interp + warmup_if)
    unit = int(np.lcm(int(np.lcm(cfg.audio_decim, ia)),
                      int(cfg.if_fs) // int(np.gcd(int(cfg.pilot_freq),
                                                   int(cfg.if_fs)))))
    return -(-ctx // unit) * unit


def timesharded_stereo(rx: Receiver, iq_u8, mesh: Mesh, *,
                       axis: str = "time", warmup_if: int = 4096):
    """Stereo-decode a single station's u8 stream with time sharded over
    the mesh — extends timesharded_mono past its PLL limit via warm-up
    halos (see module docstring).

    iq_u8: (n,) u8, n divisible by devices * the per-device alignment.
    Returns (left, right), behaviorally equivalent to
    rx.run(iq_u8)['left'/'right'] (stereo separation / SNR within
    tolerance after the initial serial lock-in transient).
    """
    cfg = rx.cfg
    assert rx.stereo and not rx.rds, "stereo time-sharding (RDS: see doc)"
    n_dev = mesh.shape[axis]
    n = iq_u8.shape[-1]
    chunk_u8 = n // n_dev
    ia = _if_align(rx)
    align = 2 * cfg.rf_decim * int(np.lcm(cfg.audio_decim, ia))
    assert chunk_u8 % align == 0, (
        f"per-device chunk {chunk_u8} not aligned to {align}")
    warm_if = stereo_warmup_if(rx, warmup_if)
    halo_u8 = 2 * cfg.rf_decim * warm_if
    assert chunk_u8 >= halo_u8, (
        f"chunk {chunk_u8} u8 shorter than the warm-up halo {halo_u8}")
    warm_audio = warm_if * cfg.audio_interp // cfg.audio_decim

    iq = jax.device_put(np.asarray(iq_u8), NamedSharding(mesh, P(axis)))

    @partial(shard_map, mesh=mesh, in_specs=P(axis),
             out_specs=(P(axis), P(axis)), check_vma=False)
    def run_shard(local):
        local = local.reshape(-1)
        tail = local[-halo_u8:]
        halo = jax.lax.ppermute(tail, axis,
                                perm=[(i, i + 1) for i in range(n_dev - 1)])
        idx = jax.lax.axis_index(axis)
        halo = jnp.where(idx == 0, jnp.uint8(128), halo)
        extended = jnp.concatenate([halo, local])
        state = rx.init_state()
        _, out = rx.step(state, extended)
        return out["left"][warm_audio:], out["right"][warm_audio:]

    return jax.jit(run_shard)(iq)
