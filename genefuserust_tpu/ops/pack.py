"""Compact host->device encodings for the scan pipeline.

Per base the device needs (a) a 4-bit sequence code that preserves byte
equality over the ACGTNacgtn alphabet (merge compares raw bytes,
read.rs:345; pairs containing any OTHER byte are routed to the host scalar
path by the engine), and (b) a 2-bit quality class {low<=Q15, mid,
high>=Q30} — provably sufficient for the merge accept/diff/pick logic
(read.rs:348-427 uses only those two thresholds). Sequences pack 2 bases
per byte, quality classes 4 per byte: 120B per 150bp pair instead of 640B.

Merged qualities are NOT computed on device: the engine re-derives the
exact merged read on host (scalar fast_merge) for the rare matched pairs.
"""

from __future__ import annotations

import numpy as np

# 4-bit sequence codes: 0..3 = ACGT (match BASE codes A=0,T=1,C=2,G=3),
# 4 = N, 5..8 = acgt, 9 = n, 15 = other
SEQ4_LUT = np.full(256, 15, np.uint8)
for i, ch in enumerate(b"ATCG"):
    SEQ4_LUT[ch] = i
SEQ4_LUT[ord("N")] = 4
for i, ch in enumerate(b"atcg"):
    SEQ4_LUT[ch] = 5 + i
SEQ4_LUT[ord("n")] = 9

# 4-bit code -> 2-bit map code (uppercase ACGT only, else invalid=255)
MAP_FROM_SEQ4 = np.full(16, 255, np.uint8)
for c in range(4):
    MAP_FROM_SEQ4[c] = c

# 4-bit complement (reference complement table: A<->T, C<->G, case-insensitive
# input, non-ACGT -> 'N'; sequence.rs:52-59). Output is always uppercase.
COMP4 = np.full(16, 4, np.uint8)  # default N
COMP4[0], COMP4[1], COMP4[2], COMP4[3] = 1, 0, 3, 2  # A<->T, C<->G
COMP4[5], COMP4[6], COMP4[7], COMP4[8] = 1, 0, 3, 2  # a,t,c,g likewise

_Q30 = ord("?")
_Q15 = ord("0")

OK_BYTES = frozenset(b"ACGTNacgtn")


def qual_class(q: np.ndarray) -> np.ndarray:
    """byte quals -> {0=low(<=Q15), 1=mid, 2=high(>=Q30)}."""
    return np.where(q >= _Q30, 2, np.where(q <= _Q15, 0, 1)).astype(np.uint8)


def pack_seq4(codes4: np.ndarray) -> np.ndarray:
    """(B, L) 4-bit values -> (B, ceil(L/2)) bytes (low nibble first)."""
    B, L = codes4.shape
    if L % 2:
        codes4 = np.concatenate([codes4, np.zeros((B, 1), np.uint8)], axis=1)
        L += 1
    return (codes4[:, 0::2] | (codes4[:, 1::2] << 4)).astype(np.uint8)


def pack_q2(classes: np.ndarray) -> np.ndarray:
    """(B, L) 2-bit values -> (B, ceil(L/4)) bytes."""
    B, L = classes.shape
    pad = (-L) % 4
    if pad:
        classes = np.concatenate([classes, np.zeros((B, pad), np.uint8)], axis=1)
    c = classes
    return (
        c[:, 0::4] | (c[:, 1::4] << 2) | (c[:, 2::4] << 4) | (c[:, 3::4] << 6)
    ).astype(np.uint8)


def has_exotic(seq_rows: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """(B,) bool: any byte outside ACGTNacgtn within the read span."""
    B, L = seq_rows.shape
    lut = np.ones(256, bool)
    for ch in OK_BYTES:
        lut[ch] = False
    bad = lut[seq_rows]
    idx = np.arange(L)[None, :] < lens[:, None]
    return (bad & idx).any(axis=1)


# ---------------- device-side unpack (jnp) ----------------


def unpack_seq2_jnp(packed, L: int):
    """(B, ceil(L/4)) uint8 of 2-bit codes (LSB-first) -> (B, L) uint8
    codes 0..3. Non-ACGT positions are carried separately as exception
    [row, col] lists (native gf_merge_pack_pe2) and scattered to 255 by
    the caller."""
    import jax.numpy as jnp

    parts = [
        packed & 3,
        (packed >> 2) & 3,
        (packed >> 4) & 3,
        (packed >> 6) & 3,
    ]
    out = jnp.stack(parts, axis=-1).reshape(packed.shape[0], -1)
    return out[:, :L]


def unpack_seq4_jnp(packed, L: int):
    import jax.numpy as jnp

    lo = packed & 0xF
    hi = (packed >> 4) & 0xF
    out = jnp.stack([lo, hi], axis=-1).reshape(packed.shape[0], -1)
    return out[:, :L]


def unpack_q2_jnp(packed, L: int):
    import jax.numpy as jnp

    parts = [(packed >> (2 * k)) & 0x3 for k in range(4)]
    out = jnp.stack(parts, axis=-1).reshape(packed.shape[0], -1)
    return out[:, :L]
