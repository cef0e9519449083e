"""RDS frame synchronization and group extraction.

Spec p.18 (SURVEY §2.5): slide a 26-bit window over the decoded bit stream,
compute syndromes against the parity-check matrix, and lock when the
A-B-C|C'-D offset sequence appears at 26-bit spacing.  On sync loss (weak
signal), fall back to brute-force re-search — the only 'recovery' behavior
the reference family defines (SURVEY §5.3).

The syndrome computation is one vectorized GF(2) matmul over all windows
(rds/matrix.py `syndromes_sliding`); the state machine below is host-side.
Polarity ambiguity from the 57 kHz PLL is handled by trying the inverted
bit stream too.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from sdr_tpu.rds.matrix import SYNDROMES, syndromes_sliding

_OFFSET_SEQ = ("A", "B", "C", "D")
_SYN_A = SYNDROMES["A"]
_SYN_B = SYNDROMES["B"]
_SYN_C = SYNDROMES["C"]
_SYN_CP = SYNDROMES["C'"]
_SYN_D = SYNDROMES["D"]


@dataclasses.dataclass
class Group:
    """One synchronized group: four 16-bit info words + which C offset."""
    blocks: tuple[int, int, int, int]
    version_b: bool
    bit_offset: int  # position of block A's first bit in the input stream


def find_sync_positions(bits: np.ndarray) -> np.ndarray:
    """Positions p where windows at p, p+26, p+52, p+78 carry syndromes
    A, B, C|C', D — fully vectorized."""
    syn = syndromes_sliding(bits)
    n = len(syn)
    if n < 79:
        return np.zeros(0, dtype=np.int64)
    a = syn[: n - 78] == _SYN_A
    b = syn[26: n - 52] == _SYN_B
    c = (syn[52: n - 26] == _SYN_C) | (syn[52: n - 26] == _SYN_CP)
    d = syn[78:] == _SYN_D
    return np.nonzero(a & b & c & d)[0]


def extract_groups(bits: np.ndarray, *, try_invert: bool = True
                   ) -> tuple[list[Group], int]:
    """Brute-force sync + locked tracking over a bit stream.

    Returns (groups, polarity) with polarity 0 if bits used as-is, 1 if the
    stream had to be inverted (57 kHz carrier polarity ambiguity).
    """
    bits = np.asarray(bits, dtype=np.uint8)
    for polarity in (0, 1) if try_invert else (0,):
        stream = bits ^ polarity
        syn = syndromes_sliding(stream)
        groups = _track(stream, syn)
        if groups:
            return groups, polarity
    return [], 0


def _track(bits: np.ndarray, syn: np.ndarray) -> list[Group]:
    groups: list[Group] = []
    n = len(syn)
    p = 0
    locked_at = -1
    while p + 78 < n:
        if (syn[p] == _SYN_A and syn[p + 26] == _SYN_B
                and syn[p + 52] in (_SYN_C, _SYN_CP) and syn[p + 78] == _SYN_D):
            blocks = tuple(
                int("".join(map(str, bits[q:q + 16])), 2)
                for q in (p, p + 26, p + 52, p + 78))
            groups.append(Group(blocks=blocks,
                                version_b=(syn[p + 52] == _SYN_CP),
                                bit_offset=p))
            locked_at = p
            p += 104  # locked: jump a whole group
        elif locked_at >= 0 and p == locked_at + 104:
            # sync lost at the expected position: brute-force re-search
            locked_at = -1
            p += 1
        else:
            p += 1
    return groups
