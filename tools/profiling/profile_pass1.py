"""Decompose pass-1 (KV layout, bench shapes): kmers, gathers, dupes, sort.

All tables are fori ARGS (closure-captured tables -> tunnel HTTP 413)."""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def fori_time(name, fn, iters, *args, roll_arg=0):
    """Timed jitted fori loop. CRITICAL (profile_memoize.py): the axon
    tunnel memoizes executions by executable + input CONTENT — the timed
    call MUST see different input values than the warmup call, or it
    returns in ~0.03ms without executing. We salt the rolled argument with
    a distinct constant per call (the probe fn must consume the rolled
    arg's values, e.g. via `(i + kv[0])`-style index/key derivation)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(salt, *a):
        def body(k, acc):
            b = list(a)
            b[roll_arg] = jnp.roll(b[roll_arg], k, axis=0) + salt
            out = fn(*b)
            return acc + jnp.sum(out).astype(jnp.int32)

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    dt_prev = None
    for c, salt in enumerate((101, 57, 23)):
        s = jnp.asarray(salt, list(args)[roll_arg].dtype)
        t0 = time.time()
        run(s, *args).block_until_ready()
        dt = (time.time() - t0) / iters
        if c:  # call 0 is compile+warmup
            print(f"{name:46s} {dt * 1e3:9.2f} ms/iter", flush=True)
            if dt_prev is not None and min(dt, dt_prev) < 1e-4:
                print(f"{'':46s}   ^ SUSPECT: sub-0.1ms — likely memoized",
                      flush=True)
            dt_prev = dt
    return dt_prev


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".bench_cache", "jaxcache")
    )
    import jax.numpy as jnp

    import bench as benchmod
    from genefuserust_tpu.config import KMER, PASS1_STEP, Settings
    from genefuserust_tpu.ops import map_read as mr
    from genefuserust_tpu.ops.pack import MAP_FROM_SEQ4

    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)
    mapper = benchmod.get_mapper(15.2)
    kvp = benchmod.get_packed(mapper, 15.2)
    shift, cbits, pos_bias, D = kvp.shift, kvp.cbits, kvp.pos_bias, kvp.max_dupe

    B = 32768
    W = 192  # bucketed merged width
    rng = np.random.default_rng(0)
    # realistic on-target codes: sample k-mers from gene sequences
    gene = mapper.indexer.fusion_seq[0]
    from genefuserust_tpu.core.sequence import encode_bases

    codes = np.zeros((B, W), np.uint8)
    for i in range(0, B, 256):
        off = int(rng.integers(0, len(gene) - 200))
        row = encode_bases(gene[off : off + 190])
        codes[i : i + 256, : len(row)] = row
    lens = np.full(B, 190, np.int32)
    codes_d = jax.device_put(jnp.asarray(codes), dev)
    lens_d = jax.device_put(jnp.asarray(lens), dev)
    kv = jax.device_put(jnp.asarray(np.asarray(kvp.kv_tbl)), dev)
    dupes = jax.device_put(jnp.asarray(np.asarray(kvp.dupes)), dev)
    it = 6

    NK = W - KMER + 1
    NS = (NK + PASS1_STEP - 1) // PASS1_STEP
    print(f"# B={B} W={W} NS={NS} D={D}", flush=True)

    fori_time(
        "full pass1 (kv)",
        lambda c, l, k, d: jnp.stack(
            mr.map_read_pass1(
                c, l, k, jnp.zeros((1, 2), jnp.int32), d, shift, D,
                kv=True, cbits=cbits, pos_bias=pos_bias,
            ),
            -1,
        ).astype(jnp.int32),
        it, codes_d, lens_d, kv, dupes, roll_arg=1,
    )
    fori_time(
        "  compute_kmers",
        lambda c, l: mr.compute_kmers(c, l)[0].astype(jnp.int32),
        it, codes_d, lens_d, roll_arg=1,
    )
    km, kvalid = mr.compute_kmers(codes_d, lens_d)
    skm = jnp.asarray(np.asarray(km)[:, ::PASS1_STEP])
    skv = jnp.asarray(np.asarray(kvalid)[:, ::PASS1_STEP])

    fori_time(
        "  kv_lookup (2 row gathers + decode)",
        lambda q, v, k: jnp.stack(
            mr.kv_lookup(k, shift, cbits, pos_bias, q, v), -1
        ),
        it, skm, skv, kv, roll_arg=0,
    )
    contig, pos = mr.kv_lookup(kv, shift, cbits, pos_bias, skm, skv)

    fori_time(
        "  expand_candidates_kv (dupe gather)",
        lambda c, p, d: mr.expand_candidates_kv(c, p, d, D, cbits, pos_bias)[0],
        it, contig, pos, dupes, roll_arg=0,
    )
    cc, cp, cv = mr.expand_candidates_kv(contig, pos, dupes, D, cbits, pos_bias)
    i_idx = np.arange(NS, dtype=np.int32)[None, :, None] * PASS1_STEP
    v_hi = jnp.asarray(np.asarray(cc).reshape(B, NS * D))
    v_lo = jnp.asarray((np.asarray(cp) - i_idx).reshape(B, NS * D))
    v_ok = jnp.asarray(np.asarray(cv).reshape(B, NS * D))

    fori_time(
        "  top2_votes (two-key sort width %d)" % (NS * D),
        lambda a, b, c: jnp.stack(mr.top2_votes(a, b, c), -1),
        it, v_hi, v_lo, v_ok, roll_arg=0,
    )
    # gather-only floors at this query count
    NQ = B * NS
    idx = jax.device_put(
        jnp.asarray(rng.integers(0, kvp.n_buckets, NQ).astype(np.int32)), dev
    )
    dt = fori_time(
        "  raw take rows8 x1 (%0.1fM q)" % (NQ / 1e6),
        lambda t, i: jnp.take(t, i, axis=0).sum(-1),
        it, kv, idx, roll_arg=1,
    )
    print(f"    -> {dt / NQ * 1e9:.1f} ns/row", flush=True)
    # low-cardinality variants: does a mostly-constant index stream gather
    # faster (cache) — decides the h1-first/full-flag scheme
    idx0 = jax.device_put(jnp.zeros(NQ, jnp.int32), dev)
    dt = fori_time(
        "  raw take rows8 all-zero idx",
        lambda t, i: jnp.take(t, i, axis=0).sum(-1),
        it, kv, idx0, roll_arg=1,
    )
    print(f"    -> {dt / NQ * 1e9:.1f} ns/row", flush=True)
    mix = np.where(
        rng.random(NQ) < 0.987, 0, rng.integers(0, kvp.n_buckets, NQ)
    ).astype(np.int32)
    idxm = jax.device_put(jnp.asarray(mix), dev)
    dt = fori_time(
        "  raw take rows8 98.7%%-zero idx",
        lambda t, i: jnp.take(t, i, axis=0).sum(-1),
        it, kv, idxm, roll_arg=1,
    )
    print(f"    -> {dt / NQ * 1e9:.1f} ns/row", flush=True)


if __name__ == "__main__":
    main()
