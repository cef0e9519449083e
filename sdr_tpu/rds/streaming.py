"""Streaming RDS decoder: O(1)-memory incremental decode of per-block soft.

The offline path (`decode_rds_soft`) accumulates the whole capture's
RRC-filtered waveform and decodes once — fine for files, wrong for the
reference's live model `rtl_sdr | ./project` (src/project.cpp:392-393)
where the stream is unbounded and PI/PS/RT should appear as groups arrive
(spec p.18).  `StreamingRdsDecoder.push(soft_block)` carries every decoder
state across blocks:

  * CDR sampling phase — leftover (< SPS) samples carry over so the
    (nsym, SPS) symbol grid stays aligned to the absolute sample index;
    per-phase |amplitude| scores accumulate in an EMA so the chosen phase
    can track slow symbol-clock drift across a long capture (the offline
    single global argmax cannot).
  * biphase pairing parity — adjacent-difference scores accumulate until
    `parity_min_symbols` symbols are seen, then the parity locks and the
    buffered symbols decode retroactively; after lock at most one unpaired
    symbol carries over.
  * differential decode — the previous bit carries over.
  * frame sync — a bounded bit window (search pointer onward) carries
    over, with the same locked-tracking/brute-force-re-search state machine
    as rds/framing.py `_track`, including optional burst correction at
    locked positions; 57 kHz polarity is resolved once from whichever
    inversion syncs first and then pinned.

Memory is O(SPS + parity_min_symbols + 104 bits) regardless of stream
length.  On a stationary clean signal the decoded groups equal the offline
decode exactly (tested in tests/test_rds_streaming.py).
"""

from __future__ import annotations

import numpy as np

from sdr_tpu.rds.app import StationInfo, update_info
from sdr_tpu.rds.framing import Group, _make_group, correct_group


class StreamingRdsDecoder:
    """Incremental RDS decode; feed per-block RRC soft output, read groups.

    Args:
      sps: samples per symbol of the soft waveform (cfg.rds_sps).
      phase_ema: EMA coefficient for the per-phase CDR score (weight of the
        new block); small = stable phase, large = faster drift tracking.
      parity_min_symbols: symbols to observe before locking the biphase
        pairing parity (>= one group's worth is robust).
      correct_bursts: enable span-<=5 burst correction at locked positions.
    """

    def __init__(self, sps: int, *, phase_ema: float = 0.05,
                 parity_min_symbols: int = 104,
                 correct_bursts: bool = True):
        self.sps = int(sps)
        self.phase_ema = float(phase_ema)
        self.parity_min_symbols = int(parity_min_symbols)
        self.correct_bursts = bool(correct_bursts)

        # --- CDR state
        self._soft_carry = np.zeros(0, dtype=np.float64)
        self._phase_scores = np.zeros(self.sps, dtype=np.float64)
        self._blocks_seen = 0
        self.phase: int | None = None

        # --- pairing state
        self._sym_buf = np.zeros(0, dtype=np.float64)  # unpaired symbols
        self._sym_abs = 0            # absolute index of _sym_buf[0]
        self._score_even = 0.0       # running adjacent-diff scores
        self._score_odd = 0.0
        self._last_sym: float | None = None  # symbol before _sym_buf (scores)
        self.parity: int | None = None

        # --- differential state
        self._prev_bit = 0

        # --- frame sync state (absolute bit indexing)
        self._bits = np.zeros(0, dtype=np.uint8)
        self._bit_base = 0           # absolute index of _bits[0]
        self._p = 0                  # absolute search pointer
        self._locked_at = -1         # absolute position of last synced group
        self.polarity: int | None = None

        # --- results
        self.info = StationInfo()
        self.groups: list[Group] = []
        self.bits_corrected = 0

    # ------------------------------------------------------------------ CDR
    def _recover_symbols(self, soft: np.ndarray) -> np.ndarray:
        buf = np.concatenate([self._soft_carry, np.asarray(soft, np.float64)])
        nsym = len(buf) // self.sps
        self._soft_carry = buf[nsym * self.sps:]
        if nsym == 0:
            return np.zeros(0, dtype=np.float64)
        grid = buf[: nsym * self.sps].reshape(nsym, self.sps)
        score = np.mean(np.abs(grid), axis=0)
        if self._blocks_seen == 0:
            self._phase_scores = score
        else:
            a = self.phase_ema
            self._phase_scores = (1 - a) * self._phase_scores + a * score
        self._blocks_seen += 1
        self.phase = int(np.argmax(self._phase_scores))
        return grid[:, self.phase]

    # -------------------------------------------------------------- pairing
    def _pair_symbols(self, symbols: np.ndarray) -> np.ndarray:
        """Symbols -> differential-encoded bits, carrying pairing state."""
        if len(symbols) == 0:
            return np.zeros(0, dtype=np.uint8)
        # update pairing-parity scores from adjacent differences: the pair
        # (i-1, i) contributes to the parity of its START index i-1
        prevs = (np.concatenate([[self._last_sym], symbols[:-1]])
                 if self._last_sym is not None else symbols[:-1])
        idx0 = self._sym_abs + len(self._sym_buf) - (
            1 if self._last_sym is not None else 0)
        d = np.abs(prevs - symbols[0 if self._last_sym is not None else 1:])
        starts = idx0 + np.arange(len(d))
        self._score_even += d[starts % 2 == 0].sum()
        self._score_odd += d[starts % 2 == 1].sum()
        self._last_sym = float(symbols[-1])

        self._sym_buf = np.concatenate([self._sym_buf, symbols])
        total_seen = self._sym_abs + len(self._sym_buf)
        if self.parity is None:
            if total_seen < self.parity_min_symbols:
                return np.zeros(0, dtype=np.uint8)
            self.parity = 0 if self._score_even >= self._score_odd else 1
            # drop symbols before the first pair start
            drop = self.parity - self._sym_abs
            if drop > 0:
                self._sym_buf = self._sym_buf[drop:]
                self._sym_abs += drop
        npairs = len(self._sym_buf) // 2
        if npairs == 0:
            return np.zeros(0, dtype=np.uint8)
        first = self._sym_buf[0:2 * npairs:2]
        second = self._sym_buf[1:2 * npairs:2]
        self._sym_buf = self._sym_buf[2 * npairs:]
        self._sym_abs += 2 * npairs
        return (first > second).astype(np.uint8)  # HL = 1, LH = 0

    # --------------------------------------------------------------- framing
    def _try_group(self, window104: np.ndarray) -> Group | None:
        """Exact four-block sync test at the window start; resolves and pins
        the 57 kHz polarity on first success."""
        from sdr_tpu.rds.matrix import SYNDROMES, syndrome
        pols = ((self.polarity,) if self.polarity is not None else (0, 1))
        for pol in pols:
            w = window104 ^ pol
            s = [syndrome(w[q:q + 26]) for q in (0, 26, 52, 78)]
            if (s[0] == SYNDROMES["A"] and s[1] == SYNDROMES["B"]
                    and s[2] in (SYNDROMES["C"], SYNDROMES["C'"])
                    and s[3] == SYNDROMES["D"]):
                self.polarity = pol
                g = _make_group(w, 0, version_b=(s[2] == SYNDROMES["C'"]))
                return Group(blocks=g.blocks, version_b=g.version_b,
                             bit_offset=self._p)
        return None

    def _advance_sync(self) -> list[Group]:
        new: list[Group] = []
        end = self._bit_base + len(self._bits)
        while self._p + 104 <= end:
            lo = self._p - self._bit_base
            window = self._bits[lo:lo + 104]
            hit = self._try_group(window)
            at_expected = (self._locked_at >= 0
                           and self._p == self._locked_at + 104)
            if hit is None and at_expected and self.correct_bursts and \
                    self.polarity is not None:
                g = correct_group(window ^ self.polarity, 0)
                if g is not None:
                    hit = Group(blocks=g.blocks, version_b=g.version_b,
                                bit_offset=self._p,
                                bits_corrected=g.bits_corrected)
                    self.bits_corrected += g.bits_corrected
            if hit is not None:
                new.append(hit)
                self._locked_at = self._p
                self._p += 104
            else:
                if at_expected:
                    # sync lost at the expected position: brute-force
                    # re-search (spec p.18, the reference family's only
                    # recovery behavior — SURVEY §5.3)
                    self._locked_at = -1
                self._p += 1
        # trim consumed bits: nothing before the search pointer is needed
        drop = self._p - self._bit_base
        if drop > 0:
            self._bits = self._bits[drop:]
            self._bit_base = self._p
        return new

    # ------------------------------------------------------------------ push
    def push(self, soft_block: np.ndarray) -> list[Group]:
        """Consume one block of RRC soft output; return newly synced groups.

        Updates self.info incrementally (PI/PS/RT live as groups arrive).
        """
        symbols = self._recover_symbols(np.asarray(soft_block))
        diff_bits = self._pair_symbols(symbols)
        if len(diff_bits):
            prevs = np.concatenate([[self._prev_bit], diff_bits[:-1]])
            bits = (diff_bits ^ prevs).astype(np.uint8)
            self._prev_bit = int(diff_bits[-1])
            self._bits = np.concatenate([self._bits, bits])
        new = self._advance_sync()
        for g in new:
            update_info(self.info, g)
        self.groups.extend(new)
        return new

    @property
    def buffered_bytes(self) -> int:
        """Carried state footprint (bounds the O(1)-memory claim)."""
        return (self._soft_carry.nbytes + self._phase_scores.nbytes
                + self._sym_buf.nbytes + self._bits.nbytes)


class MultiStreamingRds:
    """K live per-station RDS decoders — the fleet-scale live decode.

    The reference's live model is one station piped through one process
    (src/project.cpp:392-393); scaled to the framework's N-station batch
    (channel DP / wideband channelizer), live decode means N incremental
    decoders fed from the batched soft output.  At 1187.5 bit/s per station
    the host-side work is microseconds per block even at hundreds of
    stations, so the decoders run as a plain loop over
    `StreamingRdsDecoder`s (the accelerator-side GF(2) frame-sync matmul,
    rds/matrix.py syndromes_sliding_device, is available for offline batch
    sweeps); memory is O(K) decoder states, independent of stream length.
    """

    def __init__(self, sps: int, k: int, **kw):
        self.decoders = [StreamingRdsDecoder(sps, **kw) for _ in range(k)]

    def push(self, soft_batch: np.ndarray) -> list[tuple[int, list[Group]]]:
        """Consume one (K, n) block of per-station RRC soft output.

        Returns [(station_index, new_groups), ...] for stations that
        synced new groups this block; per-station StationInfo updates
        incrementally (live PI/PS/RT)."""
        soft = np.asarray(soft_batch)
        assert soft.shape[0] == len(self.decoders), soft.shape
        out = []
        for i, dec in enumerate(self.decoders):
            new = dec.push(soft[i])
            if new:
                out.append((i, new))
        return out

    def info(self, i: int) -> StationInfo:
        return self.decoders[i].info
