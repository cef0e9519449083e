"""Unit tests for filter design, demodulators, PLL and pointwise ops
against scalar oracles with the reference's exact semantics."""

import numpy as np
import pytest
import scipy.signal as sps

import jax
import jax.numpy as jnp

from sdr_tpu.ops import firdes
from sdr_tpu.ops.demod import fm_arctan, fm_discriminator
from sdr_tpu.ops.pll import PLLState, pll, pll_init, pll_reference
from sdr_tpu.ops.pointwise import delay_line, lr_matrix, mixer
from sdr_tpu.io.gen import generate_sin


# ---------------------------------------------------------------- filter design
def _lpf_oracle(fs, fc, num_taps, gain):
    """Reference src/filter.cpp:14-37, scalar."""
    norm_fc = fc / (fs / 2)
    h = np.zeros(num_taps)
    for i in range(num_taps):
        if i == (num_taps - 1) * 0.5:
            h[i] = norm_fc
        else:
            den = np.pi * norm_fc * (i - (num_taps - 1) * 0.5)
            h[i] = norm_fc * np.sin(den) / den
        h[i] *= np.sin(i * np.pi / num_taps) ** 2
        h[i] *= gain
    return h


def _bpf_oracle(fs, fb, fe, num_taps):
    """Reference src/filter.cpp:39-64, scalar."""
    nc = (fe + fb) / fs
    npass = 2 * (fe - fb) / fs
    h = np.zeros(num_taps)
    for i in range(num_taps):
        if i == (num_taps - 1) // 2:
            h[i] = npass
        else:
            den = np.pi * (npass * 0.5) * (i - (num_taps - 1) * 0.5)
            h[i] = npass * np.sin(den) / den
        h[i] *= np.cos(i * np.pi * nc)
        h[i] *= np.sin(i * np.pi / num_taps) ** 2
    return h


@pytest.mark.parametrize("fs,fc,taps,gain", [
    (2.4e6, 100e3, 51, 1), (240e3, 16e3, 51, 1),
    (240e3 * 147, 16e3, 51 * 147, 147), (1.152e6, 100e3, 51, 1)])
def test_lowpass_matches_reference(fs, fc, taps, gain):
    np.testing.assert_allclose(firdes.lowpass(fs, fc, taps, gain),
                               _lpf_oracle(fs, fc, taps, gain),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("fs,fb,fe", [
    (240e3, 22e3, 54e3), (240e3, 18.5e3, 19.5e3),
    (240e3, 54e3, 60e3), (240e3, 113.5e3, 114.5e3)])
def test_bandpass_matches_reference(fs, fb, fe):
    np.testing.assert_allclose(firdes.bandpass(fs, fb, fe, 51),
                               _bpf_oracle(fs, fb, fe, 51),
                               rtol=1e-5, atol=1e-7)


def test_lowpass_dc_gain():
    """Windowed-sinc LPF passes DC with ~unit gain (x interp when compensated)."""
    h = firdes.lowpass(240e3, 16e3, 51, 1)
    assert abs(h.sum() - 1.0) < 0.05
    h147 = firdes.lowpass(240e3 * 147, 16e3, 51 * 147, 147)
    assert abs(h147.sum() - 147.0 * (1 / 147) * 147) < 147 * 0.05


def test_rrc_symmetric_unit_peak():
    h = firdes.root_raised_cosine(38000, 151, 2375)
    np.testing.assert_allclose(h, h[::-1], rtol=1e-6)
    assert np.argmax(h) == 75


# ------------------------------------------------------------------- demod
def _demod_oracle(i_ds, q_ds, prev_i, prev_q):
    """Reference src/filter.cpp:106-133, scalar."""
    out = np.zeros(len(i_ds))
    for k in range(len(i_ds)):
        ci, cq = i_ds[k], q_ds[k]
        den = ci * ci + cq * cq
        if den != 0:
            out[k] = (ci * (cq - prev_q) - cq * (ci - prev_i)) / den
        prev_i, prev_q = ci, cq
    return out, prev_i, prev_q


def test_discriminator_matches_reference(rng):
    i = rng.standard_normal(500).astype(np.float32)
    q = rng.standard_normal(500).astype(np.float32)
    i[100], q[100] = 0.0, 0.0  # exercise the divide-by-zero guard
    d1, pi1, pq1 = fm_discriminator(jnp.asarray(i), jnp.asarray(q),
                                    jnp.float32(0.1), jnp.float32(-0.2))
    d2, pi2, pq2 = _demod_oracle(i, q, 0.1, -0.2)
    np.testing.assert_allclose(np.asarray(d1), d2, rtol=1e-4, atol=1e-5)
    assert np.isclose(float(pi1), pi2) and np.isclose(float(pq1), pq2)


def test_discriminator_block_split(rng):
    i = rng.standard_normal(600).astype(np.float32)
    q = rng.standard_normal(600).astype(np.float32)
    z = jnp.float32(0.0)
    full, _, _ = fm_discriminator(jnp.asarray(i), jnp.asarray(q), z, z)
    a, pi, pq = fm_discriminator(jnp.asarray(i[:300]), jnp.asarray(q[:300]), z, z)
    b, _, _ = fm_discriminator(jnp.asarray(i[300:]), jnp.asarray(q[300:]), pi, pq)
    np.testing.assert_allclose(np.asarray(full),
                               np.concatenate([np.asarray(a), np.asarray(b)]),
                               rtol=1e-6)


def test_discriminator_recovers_tone():
    """FM-modulate a tone, discriminate, get the tone back (frequency check)."""
    fs = 240e3
    n = 4096
    t = np.arange(n) / fs
    msg = np.sin(2 * np.pi * 3000 * t)
    kf = 50e3
    phase = 2 * np.pi * kf * np.cumsum(msg) / fs
    i, q = np.cos(phase).astype(np.float32), np.sin(phase).astype(np.float32)
    d, _, _ = fm_discriminator(jnp.asarray(i), jnp.asarray(q),
                               jnp.float32(1.0), jnp.float32(0.0))
    d = np.asarray(d)[64:]  # drop transient
    spec = np.abs(np.fft.rfft(d * np.hanning(len(d))))
    peak = np.argmax(spec[1:]) + 1
    f_peak = peak * fs / len(d)
    assert abs(f_peak - 3000) < 100


def test_arctan_demod_equivalent_on_smooth_signal():
    fs = 240e3
    n = 2048
    t = np.arange(n) / fs
    # small deviation: the discriminator is the first-order approximation of
    # the phase difference, so they agree only for small per-sample steps
    phase = 2 * np.pi * 8e3 * np.cumsum(np.sin(2 * np.pi * 1000 * t)) / fs
    i, q = np.cos(phase).astype(np.float32), np.sin(phase).astype(np.float32)
    d1, _, _ = fm_discriminator(jnp.asarray(i), jnp.asarray(q),
                                jnp.float32(1.0), jnp.float32(0.0))
    d2, _ = fm_arctan(jnp.asarray(i), jnp.asarray(q), jnp.float32(0.0))
    # the two demodulators agree to first order on smooth phase
    np.testing.assert_allclose(np.asarray(d1)[10:], np.asarray(d2)[10:],
                               atol=0.02)


# --------------------------------------------------------------------- PLL
def test_pll_exact_mode_matches_oracle():
    fs = 240e3
    pilot = generate_sin(fs, 19e3, 2000, amplitude=0.5)
    st = pll_init()
    out, _ = pll(jnp.asarray(pilot), st, freq=19e3, fs=fs, nco_scale=2.0,
                 wrap_phase=False, lag_correction=False)
    ref, _ = pll_reference(pilot, 19e3, fs, 2.0, 0.0, 0.01,
                           (0.0, 0.0, 1.0, 0.0, 0.0))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3)


def test_pll_wrap_matches_exact_short_stream():
    fs = 240e3
    pilot = generate_sin(fs, 19010.0, 4000, amplitude=0.3)  # slight offset
    o1, _ = pll(jnp.asarray(pilot), pll_init(), freq=19e3, fs=fs,
                nco_scale=2.0, wrap_phase=False)
    o2, _ = pll(jnp.asarray(pilot), pll_init(), freq=19e3, fs=fs,
                nco_scale=2.0, wrap_phase=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-2)


def test_pll_locks_to_pilot():
    """After convergence the NCO at scale 2 tracks 38 kHz coherent with a
    19 kHz pilot: product of NCO with ideal 38 kHz carrier has positive mean."""
    fs = 240e3
    n = 24000
    t = np.arange(n) / fs
    # the loop's phase detector (src/filter.cpp:159-161) locks trigArg to the
    # input's phase *as a cosine*: cos pilot -> NCO cos(2*theta) in phase
    pilot = np.cos(2 * np.pi * 19e3 * t + 0.7).astype(np.float32)
    out, _ = pll(jnp.asarray(pilot), pll_init(), freq=19e3, fs=fs,
                 nco_scale=2.0)
    ref38 = np.cos(2 * np.pi * 38e3 * t + 1.4)
    corr = np.mean(np.asarray(out)[-8000:] * ref38[-8000:])
    assert corr > 0.4  # coherent lock (0.5 = perfect, 0 = unlocked)


def test_pll_block_split_invariance():
    fs = 240e3
    pilot = generate_sin(fs, 19e3, 3000, amplitude=0.5)
    full, _ = pll(jnp.asarray(pilot), pll_init(), freq=19e3, fs=fs,
                  nco_scale=2.0)
    a, st = pll(jnp.asarray(pilot[:1500]), pll_init(), freq=19e3, fs=fs,
                nco_scale=2.0)
    b, _ = pll(jnp.asarray(pilot[1500:]), st, freq=19e3, fs=fs, nco_scale=2.0)
    np.testing.assert_allclose(np.asarray(full),
                               np.concatenate([np.asarray(a), np.asarray(b)]),
                               atol=1e-3)


def test_pll_batched():
    fs = 240e3
    x = np.stack([generate_sin(fs, 19e3, 1000),
                  generate_sin(fs, 19e3, 1000, phase=1.0)])
    out, st = pll(jnp.asarray(x), pll_init((2,)), freq=19e3, fs=fs,
                  nco_scale=2.0)
    o0, _ = pll(jnp.asarray(x[0]), pll_init(), freq=19e3, fs=fs, nco_scale=2.0)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(o0), atol=1e-5)


# ---------------------------------------------------------------- pointwise
def test_mixer_and_lr(rng):
    a = rng.standard_normal(100).astype(np.float32)
    b = rng.standard_normal(100).astype(np.float32)
    np.testing.assert_allclose(np.asarray(mixer(jnp.asarray(a), jnp.asarray(b))),
                               2 * a * b, rtol=1e-6)
    l, r = lr_matrix(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(l), (a + b) / 2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r), (a - b) / 2, rtol=1e-6)


def test_delay_line(rng):
    x = rng.standard_normal(64).astype(np.float32)
    st = np.zeros(5, np.float32)
    y1, st1 = delay_line(jnp.asarray(x), jnp.asarray(st))
    expected = np.concatenate([st, x[:-5]])
    np.testing.assert_array_equal(np.asarray(y1), expected)
    np.testing.assert_array_equal(np.asarray(st1), x[-5:])


def test_pll_chunked_tracks_exact():
    """The chunk-vectorized engine matches the exact engine closely in lock
    (frozen-feedback approximation, ops/pll.py pll_chunked)."""
    from sdr_tpu.ops.pll import pll_chunked
    fs = 240e3
    pilot = generate_sin(fs, 19e3, 48000, amplitude=0.3, phase=0.4)
    o1, _ = pll(jnp.asarray(pilot), pll_init(), freq=19e3, fs=fs,
                nco_scale=2.0)
    # frozen-feedback ripple grows with chunk; 32 keeps full end-to-end
    # stereo separation (see test_stereo_*) at ~9 deg peak NCO ripple
    for chunk, bound in ((16, 0.1), (32, 0.2)):
        o2, _ = pll_chunked(jnp.asarray(pilot), pll_init(), freq=19e3, fs=fs,
                            nco_scale=2.0, chunk=chunk)
        d = np.abs(np.asarray(o1) - np.asarray(o2))
        assert d[10000:].max() < bound, (
            f"chunk={chunk} post-lock divergence {d[10000:].max():.3f}")


def test_pll_chunked_block_continuity():
    from sdr_tpu.ops.pll import pll_chunked
    fs = 240e3
    pilot = generate_sin(fs, 19e3, 6400, amplitude=0.4)
    full, _ = pll_chunked(jnp.asarray(pilot), pll_init(), freq=19e3, fs=fs,
                          nco_scale=2.0)
    a, st = pll_chunked(jnp.asarray(pilot[:3200]), pll_init(), freq=19e3,
                        fs=fs, nco_scale=2.0)
    b, _ = pll_chunked(jnp.asarray(pilot[3200:]), st, freq=19e3, fs=fs,
                       nco_scale=2.0)
    np.testing.assert_allclose(np.asarray(full),
                               np.concatenate([np.asarray(a), np.asarray(b)]),
                               atol=1e-3)


def test_first_order_iir_matches_scipy(rng):
    """associative-scan IIR == scipy lfilter, including block streaming."""
    from sdr_tpu.ops.iir import deemphasis_alpha, first_order_iir
    alpha = deemphasis_alpha(48000.0, 75.0)
    x = rng.standard_normal(1000).astype(np.float32)
    ref = sps.lfilter([alpha], [1.0, -(1.0 - alpha)], x)
    y1, carry = first_order_iir(jnp.asarray(x[:500]), jnp.float32(0.0),
                                alpha=alpha)
    y2, _ = first_order_iir(jnp.asarray(x[500:]), carry, alpha=alpha)
    got = np.concatenate([np.asarray(y1), np.asarray(y2)])
    np.testing.assert_allclose(got, ref, atol=1e-4)


class TestPllFeedforward:
    """Feedforward carrier recovery (ops/pll.py pll_feedforward) — the
    fully vectorized production engine: zero sequential scan, instant
    lock, phase noise strictly better than the reference loop's."""

    def test_locks_instantly_and_tracks_offset(self):
        from sdr_tpu.ops.pll import pll_feedforward
        fs = 240e3
        n = 24576
        t = np.arange(n) / fs
        # 20 Hz frequency offset + nonzero phase
        pilot = (0.5 * np.cos(2 * np.pi * 19020.0 * t + 0.7)
                 ).astype(np.float32)
        out, _ = pll_feedforward(jnp.asarray(pilot), pll_init(),
                                 freq=19e3, fs=fs, nco_scale=2.0)
        ideal = np.cos(2 * (2 * np.pi * 19020.0 * t + 0.7))
        # instant lock: even INCLUDING the first samples the error is small
        rms_all = np.sqrt(np.mean((np.asarray(out) - ideal) ** 2))
        assert rms_all < 0.05, rms_all
        # and strictly better than the sequential loop in steady state
        ref, _ = pll(jnp.asarray(pilot), pll_init(), freq=19e3, fs=fs,
                     nco_scale=2.0)
        rms_ff = np.sqrt(np.mean((np.asarray(out)[8000:] - ideal[8000:])**2))
        rms_scan = np.sqrt(np.mean((np.asarray(ref)[8000:] - ideal[8000:])**2))
        assert rms_ff < rms_scan, (rms_ff, rms_scan)

    def test_split_invariance_on_window_grid(self):
        from sdr_tpu.ops.pll import pll_feedforward
        fs = 240e3
        n = 24576
        pilot = np.asarray(generate_sin(fs, 19e3, n, amplitude=0.5))
        full, _ = pll_feedforward(jnp.asarray(pilot), pll_init(),
                                  freq=19e3, fs=fs, nco_scale=2.0)
        a, st = pll_feedforward(jnp.asarray(pilot[:12288]), pll_init(),
                                freq=19e3, fs=fs, nco_scale=2.0)
        b, _ = pll_feedforward(jnp.asarray(pilot[12288:]), st,
                               freq=19e3, fs=fs, nco_scale=2.0)
        np.testing.assert_allclose(
            np.concatenate([np.asarray(a), np.asarray(b)]),
            np.asarray(full), atol=1e-4)

    def test_half_scale_rds_carrier(self):
        """nco_scale=0.5 (114 kHz -> 57 kHz): phase carried mod 4*pi keeps
        the half-rate NCO consistent across blocks, up to the squaring
        loop's inherent 180-degree ambiguity."""
        from sdr_tpu.ops.pll import pll_feedforward
        fs = 240e3
        n = 24576
        t = np.arange(n) / fs
        carrier = (0.3 * np.cos(2 * np.pi * 114005.0 * t + 1.1)
                   ).astype(np.float32)
        outs, st = [], pll_init()
        for i in range(0, n, 12288):
            o, st = pll_feedforward(jnp.asarray(carrier[i:i + 12288]), st,
                                    freq=114e3, fs=fs, nco_scale=0.5)
            outs.append(np.asarray(o))
        out = np.concatenate(outs)
        ideal = np.cos(0.5 * (2 * np.pi * 114005.0 * t + 1.1))
        err = min(np.mean((out[2000:] - ideal[2000:]) ** 2),
                  np.mean((out[2000:] + ideal[2000:]) ** 2))
        assert np.sqrt(err) < 0.05, np.sqrt(err)

    def test_batched(self):
        from sdr_tpu.ops.pll import pll_feedforward
        fs = 240e3
        x = np.stack([np.asarray(generate_sin(fs, 19e3, 4096, amplitude=0.4)),
                      np.asarray(generate_sin(fs, 19e3, 4096, amplitude=0.4,
                                              phase=1.2))])
        out, st = pll_feedforward(jnp.asarray(x), pll_init((2,)),
                                  freq=19e3, fs=fs, nco_scale=2.0)
        assert out.shape == (2, 4096) and st.phase_acc.shape == (2,)
        one, _ = pll_feedforward(jnp.asarray(x[1]), pll_init(),
                                 freq=19e3, fs=fs, nco_scale=2.0)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(one),
                                   atol=1e-5)

    def test_multi_matches_two_single_calls(self):
        """pll_feedforward_multi (the fused dual-carrier program the
        stereo+RDS receiver uses) is bit-identical to two single-engine
        calls when both run under the same jit."""
        from functools import partial
        from sdr_tpu.ops.pll import pll_feedforward, pll_feedforward_multi
        rng = np.random.default_rng(7)
        x1 = jnp.asarray(rng.standard_normal((3, 2560)), jnp.float32)
        x2 = jnp.asarray(rng.standard_normal((3, 2560)), jnp.float32)
        p1 = (19e3, 240e3, 2.0, 0.1)
        p2 = (114e3, 240e3, 0.5, 0.0)
        n1, s1 = pll_feedforward(x1, pll_init((3,)), freq=p1[0], fs=p1[1],
                                 nco_scale=p1[2], phase_adjust=p1[3])
        n2, s2 = pll_feedforward(x2, pll_init((3,)), freq=p2[0], fs=p2[1],
                                 nco_scale=p2[2], phase_adjust=p2[3])
        fused = jax.jit(partial(pll_feedforward_multi, params=(p1, p2)))
        (m1, m2), (t1, t2) = fused((x1, x2),
                                   (pll_init((3,)), pll_init((3,))))
        np.testing.assert_allclose(np.asarray(m1), np.asarray(n1), atol=2e-6)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(n2), atol=2e-6)
        for a, b in zip(jax.tree.leaves((s1, s2)), jax.tree.leaves((t1, t2))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)
