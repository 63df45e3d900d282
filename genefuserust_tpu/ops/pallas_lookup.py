"""Pallas k-mer table lookup kernel (correctness oracle; CLOSED as a
performance direction — round 4).

Round-1 status: logic-complete and equality-tested against ops/map_read.py
hash_lookup in INTERPRET mode. The round-2/3 plan was deep outstanding-DMA
pipelining toward DRAM-latency-bound (~4-8ns/row) to beat the XLA gather.

Round-4 VERDICT (measured on the real v5e, content-salted in-jit fori
timing — tools/profiling/profile_dma_ring.py, full table in PERF.md
"Round 4: Pallas lookup — measured negative result"):

    pipelined DMA ring   137.5-138.6 ns/row, FLAT across NFLIGHT 4/8/16
    XLA row gather         5.4-8.9  ns/row  (same shapes, same runs)

The ring is DMA-ISSUE-RATE bound: each query costs one scalar-core loop
iteration (descriptor build + start + wait bookkeeping) at ~138ns, and no
amount of in-flight depth changes that — latency was never the
bottleneck. A per-query-DMA Pallas kernel therefore CANNOT beat the XLA
gather on this hardware; the XLA path in ops/map_read.py IS the product
scan, by measurement rather than by default. Vectorized in-VMEM
alternatives were analyzed and rejected: Mosaic's lax.gather lowering
requires out.shape == x.shape == idx.shape (tpu.dynamic_gather), which
cannot express Q-queries-into-R-rows; one-hot MXU matmul pays more in
one-hot construction (Q*R VPU compares) than the gather costs; and
sorted tile-join variants need >=2 extra multi-million-row device sorts
per batch, exceeding the 45-50% Amdahl share pass-1 lookups hold.

This file is kept as the interpret-mode correctness oracle for the
table probe semantics (tests/test_pallas_lookup.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hashtable import EMPTY, SLOTS

TILE = 1024  # queries per grid program (matches the int32 SMEM layout)


def _lookup_kernel(shift: int):
    def kernel(kmer_ref, keys_ref, vals_ref, out_ref):
        def body(krow, vrow, sem):
            def one(i, _):
                k = kmer_ref[i]
                ku = k.astype(jnp.uint32)
                b1 = ((ku * jnp.uint32(0x9E3779B1)) >> shift).astype(jnp.int32)
                b2 = (
                    (
                        (ku ^ (ku >> 15)) * jnp.uint32(0x85EBCA6B)
                        + jnp.uint32(0xC2B2AE35)
                    )
                    >> shift
                ).astype(jnp.int32)
                cp1 = pltpu.make_async_copy(
                    keys_ref.at[pl.ds(b1, 1)], krow.at[pl.ds(0, 1)], sem
                )
                cp1.start()
                cp1.wait()
                m1 = krow[0, :] == k
                cp2 = pltpu.make_async_copy(
                    keys_ref.at[pl.ds(b2, 1)], krow.at[pl.ds(0, 1)], sem
                )
                cp2.start()
                cp2.wait()
                m2 = krow[0, :] == k
                f1 = jnp.any(m1)
                f2 = jnp.any(m2)
                s1 = jnp.argmax(m1).astype(jnp.int32)
                s2 = jnp.argmax(m2).astype(jnp.int32)
                bucket = jnp.where(f1, b1, b2)
                slot = jnp.where(f1, s1, s2)
                found = f1 | f2
                flat = jnp.where(found, bucket * SLOTS + slot, 0)
                cpv = pltpu.make_async_copy(
                    vals_ref.at[pl.ds(flat, 1)], vrow.at[pl.ds(0, 1)], sem
                )
                cpv.start()
                cpv.wait()
                out_ref[i, 0] = jnp.where(found, vrow[0, 0], EMPTY)
                out_ref[i, 1] = jnp.where(found, vrow[0, 1], 0)
                return 0

            jax.lax.fori_loop(0, TILE, one, 0)

        pl.run_scoped(
            body,
            krow=pltpu.VMEM((1, SLOTS), jnp.int32),
            vrow=pltpu.VMEM((1, 2), jnp.int32),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("shift", "interpret"))
def pallas_lookup(
    kmers: jnp.ndarray,  # (N,) int32 bit-pattern kmers, N % TILE == 0
    keys_tbl: jnp.ndarray,  # (nb, SLOTS) int32
    vals_tbl: jnp.ndarray,  # (nb*SLOTS, 2) int32
    shift: int,
    interpret: bool = False,
):
    """-> (N, 2) int32 [contig, pos]; contig==EMPTY on miss (matches
    ops/map_read.hash_lookup for valid queries)."""
    N = kmers.shape[0]
    assert N % TILE == 0
    grid = N // TILE
    return pl.pallas_call(
        _lookup_kernel(shift),
        out_shape=jax.ShapeDtypeStruct((N, 2), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda g: (g,), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((TILE, 2), lambda g: (g, 0)),
        ),
        interpret=interpret,
    )(kmers, keys_tbl, vals_tbl)
