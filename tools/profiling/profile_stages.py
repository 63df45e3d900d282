"""Stage-level timing of the engine's device kernels on the real chip.

Times each pipeline stage and its components inside a jitted lax.fori_loop
(the only reliable timing through the dev tunnel, see PERF.md). Uses the
cached 15.2Mbp bench index + synthetic bench reads so numbers are directly
comparable to bench.py.

Usage: python profile_stages.py [--batch 32768] [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def fori_time(name, fn, iters, *args, roll_arg: int = 0):
    """Time fn(*args) executed `iters` times inside one jitted fori_loop.

    args[roll_arg] is rolled by the loop counter along axis 0 each
    iteration so XLA cannot hoist the loop-invariant body out of the loop
    (the roll's copy cost is bandwidth-bound and negligible vs the
    kernels measured here). fn must return an array; a scalar is folded
    through the carry to serialize iterations."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(k, acc):
            b = list(a)
            b[roll_arg] = jnp.roll(b[roll_arg], k, axis=0)
            out = fn(*b)
            return acc + jnp.sum(out).astype(jnp.int32)

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    r = run(*args)
    r.block_until_ready()
    t0 = time.time()
    r = run(*args)
    r.block_until_ready()
    dt = (time.time() - t0) / iters
    print(f"{name:42s} {dt * 1e3:9.2f} ms/iter", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--panel-mbp", type=float, default=15.2)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".bench_cache", "jaxcache")
    )
    import jax.numpy as jnp

    import bench as benchmod
    from genefuserust_tpu.config import KMER, MIN_OVERLAP, PASS1_STEP, Settings
    from genefuserust_tpu.core.sequence import BASE_CODE_LUT
    from genefuserust_tpu.ops import map_read as mr
    from genefuserust_tpu.ops.fused import fused_merge_chunked, pass1_rows_merged
    from genefuserust_tpu.ops.pack import SEQ4_LUT, pack_q2, pack_seq4, qual_class

    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)

    mapper = benchmod.get_mapper(args.panel_mbp)
    packed = benchmod.get_packed(mapper, args.panel_mbp)
    keys = jax.device_put(jnp.asarray(packed.keys_tbl), dev)
    vals = jax.device_put(jnp.asarray(packed.vals_tbl), dev)
    dupes = jax.device_put(jnp.asarray(packed.dupes), dev)
    shift, max_dupe = packed.shift, packed.max_dupe
    print(
        f"# table: nb={packed.n_buckets} shift={shift} D={max_dupe}",
        flush=True,
    )

    B = args.batch
    block = benchmod.gen_block(mapper, B, 150)
    L = 160
    b1 = np.zeros((B, L), np.uint8)
    b1[:, :150] = block.left.seq
    q1 = np.zeros((B, L), np.uint8)
    q1[:, :150] = block.left.qual
    b2 = np.zeros((B, L), np.uint8)
    b2[:, :150] = block.right.seq
    q2 = np.zeros((B, L), np.uint8)
    q2[:, :150] = block.right.qual
    l1 = np.full(B, 150, np.int32)
    buf = np.concatenate(
        [
            pack_seq4(SEQ4_LUT[b1]),
            pack_q2(qual_class(q1)),
            pack_seq4(SEQ4_LUT[b2]),
            pack_q2(qual_class(q2)),
        ],
        axis=1,
    )
    lens2 = np.stack([l1, l1], axis=1)
    buf_d = jax.device_put(jnp.asarray(buf), dev)
    lens2_d = jax.device_put(jnp.asarray(lens2), dev)

    it = args.iters

    # ---- stage 0: merge ----
    fori_time(
        "merge (fused_merge_chunked)",
        lambda b, l: fused_merge_chunked(b, l, L, min(2048, B))[0],
        it,
        buf_d,
        lens2_d,
    )
    msum, m_codes = fused_merge_chunked(buf_d, lens2_d, L, min(2048, B))
    M = np.asarray(msum)
    merged = M[:, 0].astype(bool)
    print(f"# merged fraction: {merged.mean():.3f}", flush=True)
    rows_m = np.nonzero(merged)[0]
    pb = 8
    while pb < len(rows_m):
        pb *= 2
    mi = np.zeros(pb, np.int32)
    ml = np.zeros(pb, np.int32)
    mi[: len(rows_m)] = rows_m
    ml[: len(rows_m)] = M[rows_m, 2]
    mi_d = jax.device_put(jnp.asarray(mi), dev)
    ml_d = jax.device_put(jnp.asarray(ml), dev)

    # ---- stage 1: pass1 merged lane (the bench-dominant lane) ----
    st = Settings()
    fori_time(
        "pass1 merged lane (full)",
        lambda mc, i, l: pass1_rows_merged(
            mc, i, l, keys, vals, dupes, L2=2 * L, shift=shift,
            max_dupe=max_dupe, major_req=st.major_gene_key_requirement,
            minor_req=st.minor_gene_key_requirement,
        ),
        it,
        m_codes,
        mi_d,
        ml_d,
    )

    # ---- pass1 components at merged-lane shapes ----
    from genefuserust_tpu.ops.pack import MAP_FROM_SEQ4

    map4 = jnp.asarray(MAP_FROM_SEQ4)
    Lw = 2 * L - MIN_OVERLAP
    rows = jnp.take(m_codes, mi_d, axis=0)[:, :Lw]
    codes_d = jnp.take(map4, rows.astype(jnp.int32), axis=0)
    codes_d.block_until_ready()
    NK = Lw - KMER + 1
    NS = (NK + PASS1_STEP - 1) // PASS1_STEP

    fori_time(
        "  compute_kmers",
        lambda c, l: mr.compute_kmers(c, l)[0],
        it,
        codes_d,
        ml_d,
    )
    km, kvalid = mr.compute_kmers(codes_d, ml_d)
    skm = km[:, ::PASS1_STEP]
    skv = kvalid[:, ::PASS1_STEP]
    skm.block_until_ready()
    print(f"# pass1 queries/row: {NS} (PB={pb})", flush=True)

    fori_time(
        "  hash_lookup (keys x2 + vals)",
        lambda k, v, q, qv: jnp.stack(
            mr.hash_lookup((k, v), shift, q, qv), -1
        ),
        it,
        keys,
        vals,
        skm,
        skv,
        roll_arg=2,
    )

    # key-probes only (isolate the value gather)
    def probes_only(ktbl, q):
        k = q
        b1_ = ((k * jnp.uint32(0x9E3779B1)) >> shift).astype(jnp.int32)
        b2_ = (
            ((k ^ (k >> 15)) * jnp.uint32(0x85EBCA6B) + jnp.uint32(0xC2B2AE35))
            >> shift
        ).astype(jnp.int32)
        k1 = jnp.take(ktbl, b1_, axis=0)
        k2 = jnp.take(ktbl, b2_, axis=0)
        return (k1 == q[..., None].astype(jnp.int32)).any(-1) | (
            k2 == q[..., None].astype(jnp.int32)
        ).any(-1)

    fori_time(
        "  key probes only (2 gathers)", probes_only, it, keys, skm, roll_arg=1
    )

    def one_probe(ktbl, q):
        b1_ = ((q * jnp.uint32(0x9E3779B1)) >> shift).astype(jnp.int32)
        k1 = jnp.take(ktbl, b1_, axis=0)
        return (k1 == q[..., None].astype(jnp.int32)).any(-1)

    fori_time(
        "  one key probe (1 gather)", one_probe, it, keys, skm, roll_arg=1
    )

    contig, pos = mr.hash_lookup((keys, vals), shift, skm, skv)
    contig.block_until_ready()

    fori_time(
        "  expand_candidates (dupe gather)",
        lambda c, p, d: mr.expand_candidates(c, p, d, max_dupe)[0],
        it,
        contig,
        pos,
        dupes,
    )
    cc, cp, cv = mr.expand_candidates(contig, pos, dupes, max_dupe)
    i_idx = jax.lax.broadcasted_iota(jnp.int32, cc.shape[:2], 1) * PASS1_STEP
    v_hi = cc.reshape(pb, -1)
    v_lo = (cp - i_idx[:, :, None]).reshape(pb, -1)
    v_ok = cv.reshape(pb, -1)
    v_hi.block_until_ready()
    print(f"# vote list width: {v_hi.shape[1]}", flush=True)

    fori_time(
        "  top2_votes (two-key sort)",
        lambda a, b, c: jnp.stack(mr.top2_votes(a, b, c), -1),
        it,
        v_hi,
        v_lo,
        v_ok,
    )

    # ---- gather cost vs table size ----
    rng = np.random.default_rng(0)
    NQ = pb * NS
    for nbt in (1 << 10, 1 << 16, 1 << 20, 1 << 24):
        tbl = jax.device_put(
            jnp.asarray(rng.integers(0, 99, (nbt, 8)).astype(np.int32)), dev
        )
        idx = jax.device_put(
            jnp.asarray(rng.integers(0, nbt, NQ).astype(np.int32)), dev
        )
        dt = fori_time(
            f"  take rows8 tbl={nbt:>9d} ({NQ/1e6:.1f}M q)",
            lambda t, i: jnp.take(t, i, axis=0).sum(-1),
            it,
            tbl,
            idx,
            roll_arg=1,
        )
        print(f"    -> {dt / NQ * 1e9:.1f} ns/row", flush=True)

    # wide-row cost: rows of 2 (current vals) vs 8
    tbl2 = jax.device_put(
        jnp.asarray(rng.integers(0, 99, (1 << 24, 2)).astype(np.int32)), dev
    )
    idx = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 24, NQ).astype(np.int32)), dev
    )
    dt = fori_time(
        f"  take rows2 tbl={1<<24:>9d}",
        lambda t, i: jnp.take(t, i, axis=0).sum(-1),
        it,
        tbl2,
        idx,
        roll_arg=1,
    )
    print(f"    -> {dt / NQ * 1e9:.1f} ns/row", flush=True)

    # scalar gather (packed int32 values)
    tbl1 = jax.device_put(
        jnp.asarray(rng.integers(0, 99, (1 << 24,)).astype(np.int32)), dev
    )
    dt = fori_time(
        f"  take scalar tbl={1<<24:>9d}",
        lambda t, i: jnp.take(t, i, axis=0),
        it,
        tbl1,
        idx,
        roll_arg=1,
    )
    print(f"    -> {dt / NQ * 1e9:.1f} ns/row", flush=True)

    # sort cost scaling
    for W in (552, 1104):
        a = jax.device_put(
            jnp.asarray(rng.integers(0, 1 << 30, (B, W)).astype(np.int32)), dev
        )
        b = jax.device_put(
            jnp.asarray(rng.integers(0, 1 << 30, (B, W)).astype(np.int32)), dev
        )
        fori_time(
            f"  two-key sort (B,{W})",
            lambda x, y: jax.lax.sort((x, y), dimension=1, num_keys=2)[0],
            it,
            a,
            b,
        )
        fori_time(
            f"  one-key sort (B,{W})",
            lambda x, y: jax.lax.sort((x, y), dimension=1, num_keys=1)[0],
            it,
            a,
            b,
        )


if __name__ == "__main__":
    main()
