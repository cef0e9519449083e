"""Wideband channelizer: one wide IQ capture -> N FM station basebands.

Beyond-reference capability: the reference consumes one tuned 2.4 MS/s
station; a production TPU deployment captures a whole band segment at a
wideband rate and derives every station from it.  BASELINE's "64+
simultaneous FM channels" then needs only ONE front-end stream per antenna.

TPU-first design: for K stations the digital downconversion is one batched
complex rotate — x (N,) broadcast against per-station oscillator phasors
(K, N) — followed by the framework's own polyphase decimating filter on the
real/imag rails (K-way batch dim), landing each station at the receiver's
RF rate (e.g. 2.4 MS/s) as float I/Q that feeds `Receiver.step_iq`.  The
oscillator phase carries across blocks per station, so block streaming is
exact.

All rates integer; fs_wide must be an integer multiple of fs_out.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sdr_tpu.ops.firdes import lowpass
from sdr_tpu.ops.resample import PolyphaseResampler


class WidebandChannelizer:
    """Mix + LPF + decimate K stations out of one wideband complex stream.

    Args:
      fs_wide: wideband sample rate (e.g. 9.6e6).
      fs_out: per-station output rate (e.g. 2.4e6, the mode-0 RF rate).
      station_freqs: center-frequency offsets (Hz, relative to the wideband
        capture center) for each station.
      cutoff: anti-alias LPF cutoff (default 100 kHz, the FM channel).
      taps: LPF taps at the wideband rate.
    """

    def __init__(self, fs_wide: float, fs_out: float,
                 station_freqs: list[float], *, cutoff: float = 100e3,
                 taps: int = 101):
        decim = fs_wide / fs_out
        assert abs(decim - round(decim)) < 1e-9, (
            f"fs_wide/fs_out = {decim} must be integral")
        self.decim = int(round(decim))
        self.fs_wide = float(fs_wide)
        self.fs_out = float(fs_out)
        self.freqs = np.asarray(station_freqs, np.float64)
        self.k = len(station_freqs)
        coeff = lowpass(fs_wide, cutoff, taps, 1)
        self._lpf_i = PolyphaseResampler(coeff, 1, self.decim)
        self._lpf_q = PolyphaseResampler(coeff, 1, self.decim)
        # per-station phase increment per wideband sample (float64 host-side;
        # the per-block ramp is reduced mod 2*pi in f64 before casting, so
        # long blocks don't hit f32's ~0.008 rad resolution at 1e5 rad)
        self._dphi = (-2.0 * np.pi * self.freqs / fs_wide) % (2.0 * np.pi)
        self._ramp_cache: dict[int, jax.Array] = {}

    def _ramp(self, n: int) -> jax.Array:
        if n not in self._ramp_cache:
            t = np.arange(1, n + 1, dtype=np.float64)
            ramp = (self._dphi[:, None] * t[None, :]) % (2.0 * np.pi)
            self._ramp_cache[n] = jnp.asarray(ramp, jnp.float32)
        return self._ramp_cache[n]

    def init_state(self):
        return {
            "phase": jnp.zeros((self.k,), jnp.float32),
            "i_tail": self._lpf_i.init_state((self.k,)),
            "q_tail": self._lpf_q.init_state((self.k,)),
        }

    def __call__(self, i_wide: jax.Array, q_wide: jax.Array, state):
        """Channelize one wideband block (N,) -> per-station I/Q (K, N/D).

        Returns ((i_out, q_out), new_state).
        """
        return _channelize(self._ramp(i_wide.shape[-1]), self._lpf_i._rhs,
                           self._lpf_q._rhs, self.decim,
                           self._lpf_i.state_len, self._lpf_i.L,
                           i_wide, q_wide, state)


@partial(jax.jit, static_argnums=(3, 4, 5))
def _channelize(ramp, rhs_i, rhs_q, decim, state_len, L, i_wide, q_wide,
                state):
    # batched oscillator: theta[k, t] = phase_k + (dphi_k * (t+1) mod 2pi)
    theta = jnp.mod(state["phase"][:, None] + ramp,
                    jnp.float32(2.0 * np.pi))
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    x_i = i_wide[None, :]
    x_q = q_wide[None, :]
    # complex multiply (x_i + j x_q) * (cos + j sin)  [sin already signed
    # via the negative dphi]
    mix_i = x_i * cos_t - x_q * sin_t
    mix_q = x_i * sin_t + x_q * cos_t
    from sdr_tpu.ops.resample import _resample_apply
    i_out, i_tail = _resample_apply(rhs_i, 1, decim, state_len, L, mix_i,
                                    state["i_tail"])
    q_out, q_tail = _resample_apply(rhs_q, 1, decim, state_len, L, mix_q,
                                    state["q_tail"])
    new_state = {"phase": theta[:, -1], "i_tail": i_tail, "q_tail": q_tail}
    return (i_out, q_out), new_state


def synthesize_wideband(station_captures_iq: list[np.ndarray],
                        station_freqs: list[float], fs_station: float,
                        fs_wide: float) -> tuple[np.ndarray, np.ndarray]:
    """TX-side helper: place per-station complex basebands (I+jQ float
    arrays at fs_station) at offsets in one wideband stream (for tests)."""
    import scipy.signal as sps
    from fractions import Fraction
    up = Fraction(int(fs_wide), int(fs_station))
    outs = []
    for x, f in zip(station_captures_iq, station_freqs):
        xw = sps.resample_poly(x, up.numerator, up.denominator)
        t = np.arange(len(xw)) / fs_wide
        outs.append(xw * np.exp(2j * np.pi * f * t))
    wide = np.sum(outs, axis=0)
    return wide.real.astype(np.float32), wide.imag.astype(np.float32)
