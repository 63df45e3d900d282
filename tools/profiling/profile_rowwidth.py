"""Does a row gather cost more for wider rows? Decides the single-probe
wide-bucket table layout (1 gather/query instead of the 2-choice 2).

Measures jnp.take of (N, w) int32 tables at w in {8, 16, 32, 64} with the
same query count; per-row cost ~constant => single-hash buckets of 16-32
slots give an exact 1-gather probe (plus a seed search at build time).

All tables are fori ARGS (closure-captured tables -> tunnel HTTP 413)."""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
from profile_pass1 import fori_time  # noqa: E402


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".bench_cache", "jaxcache")
    )
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)
    rng = np.random.default_rng(0)
    NQ = 2_900_000
    # argv: [widths-csv [table-MB]] — e.g. `widths 2,8,128 512` probes
    # kv2-shaped 8B rows at the production 512MB footprint
    widths = (8, 16, 32, 64)
    BYTES = 4 * 8 * 4_194_304  # default fixed table footprint (134 MB)
    if len(sys.argv) > 2:
        widths = tuple(int(x) for x in sys.argv[2].split(","))
    if len(sys.argv) > 3:
        BYTES = int(float(sys.argv[3]) * 1e6)
    it = 6
    for w in widths:
        n = BYTES // (4 * w)
        tbl = jax.device_put(
            jnp.asarray(rng.integers(0, 2**31, (n, w), dtype=np.int64).astype(np.int32)),
            dev,
        )
        idx = jax.device_put(
            jnp.asarray(rng.integers(0, n, NQ).astype(np.int32)), dev
        )
        # slot-match reduction (like kv_lookup's decode) over indices whose
        # VALUES change with the loop counter ((i + k) mod n): neither the
        # roll-permutation trick nor row-stat precomputation lets XLA skip
        # the per-iteration gather (plain rolled take+sum times as ~0)
        kvec = jax.device_put(jnp.arange(it, dtype=jnp.int32), dev)

        def probe(t, i, kv_, _n=n):
            ii = (i + kv_[0]) % _n
            return jnp.where(jnp.take(t, ii, axis=0) == ii[:, None], 1, 0).sum(-1)

        dt = fori_time(
            f"take rows{w} ({n/1e6:.1f}M rows, {NQ/1e6:.1f}M q)",
            probe,
            it, tbl, idx, kvec, roll_arg=2,
        )
        print(f"    -> {dt / NQ * 1e9:.1f} ns/row", flush=True)
        del tbl, idx


def main_kv():
    """Same probes against the REAL bench kv table + kv_lookup shapes, to
    find what makes the production lookup 15 ns/row when raw row gathers
    run at ~0.2 ns/row."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".bench_cache", "jaxcache")
    )
    import jax.numpy as jnp

    import bench as benchmod
    from genefuserust_tpu.ops import map_read as mr

    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)
    mapper = benchmod.get_mapper(15.2)
    kvp = benchmod.get_packed(mapper, 15.2)
    kv = jax.device_put(jnp.asarray(np.asarray(kvp.kv_tbl)), dev)
    n = kvp.n_buckets
    print(f"# kv table: {n/1e6:.1f}M rows x {kvp.kv_tbl.shape[1]} "
          f"({kvp.kv_tbl.nbytes/1e6:.0f} MB)", flush=True)
    rng = np.random.default_rng(0)
    B, NS = 32768, 89
    NQ = B * NS
    it = 6
    kvec = jax.device_put(jnp.arange(it, dtype=jnp.int32), dev)

    idx1 = jax.device_put(jnp.asarray(rng.integers(0, n, NQ).astype(np.int32)), dev)

    def probe1d(t, i, kv_, _n=n):
        ii = (i + kv_[0]) % _n
        return jnp.where(jnp.take(t, ii, axis=0) == ii[..., None], 1, 0).sum(-1)

    dt = fori_time("kv tbl, 1-D idx, match-decode", probe1d, it, kv, idx1, kvec,
                   roll_arg=2)
    print(f"    -> {dt / NQ * 1e9:.2f} ns/row", flush=True)

    idx2 = jax.device_put(
        jnp.asarray(rng.integers(0, n, (B, NS)).astype(np.int32)), dev
    )
    dt = fori_time("kv tbl, 2-D idx (B,NS), match-decode", probe1d, it, kv, idx2,
                   kvec, roll_arg=2)
    print(f"    -> {dt / NQ * 1e9:.2f} ns/row", flush=True)

    # hash-derived indices (the real b1 computation) on 2-D kmers
    km = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, (B, NS), dtype=np.uint64)
                    .astype(np.uint32)), dev
    )

    def probe_hash(t, k, kv_):
        kk = k + kv_[0].astype(jnp.uint32)
        b1 = ((kk * jnp.uint32(0x9E3779B1)) >> kvp.shift).astype(jnp.int32)
        return jnp.where(jnp.take(t, b1, axis=0) == kk[..., None].astype(jnp.int32),
                         1, 0).sum(-1)

    dt = fori_time("kv tbl, hash-idx 2-D, match-decode", probe_hash, it, kv, km,
                   kvec, roll_arg=2)
    print(f"    -> {dt / NQ * 1e9:.2f} ns/row", flush=True)

    # the production kv_lookup itself (2 gathers + full decode)
    def probe_full(t, k, kv_):
        kk = k + kv_[0].astype(jnp.uint32)
        c, p = mr.kv_lookup(t, kvp.shift, kvp.cbits, kvp.pos_bias, kk,
                            jnp.ones_like(kk, jnp.bool_))
        return (c + p).astype(jnp.int32)

    dt = fori_time("kv_lookup full (2 gathers + decode)", probe_full, it, kv, km,
                   kvec, roll_arg=2)
    print(f"    -> {dt / (2 * NQ) * 1e9:.2f} ns/row", flush=True)


def main_pin():
    """Pin down the 88ms-vs-0.02ms kv_lookup discrepancy: replicate
    profile_pass1's exact harness (real strided kmers, roll_arg=0) next to
    the synthetic probe, plus a 10x-NQ physics sanity check."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".bench_cache", "jaxcache")
    )
    import jax.numpy as jnp

    import bench as benchmod
    from genefuserust_tpu.config import KMER, PASS1_STEP
    from genefuserust_tpu.ops import map_read as mr
    from genefuserust_tpu.core.sequence import encode_bases

    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)
    mapper = benchmod.get_mapper(15.2)
    kvp = benchmod.get_packed(mapper, 15.2)
    kv = jax.device_put(jnp.asarray(np.asarray(kvp.kv_tbl)), dev)
    it = 6
    rng = np.random.default_rng(0)

    # exactly profile_pass1's setup
    B, W = 32768, 192
    gene = mapper.indexer.fusion_seq[0]
    codes = np.zeros((B, W), np.uint8)
    for i in range(0, B, 256):
        off = int(rng.integers(0, len(gene) - 200))
        row = encode_bases(gene[off : off + 190])
        codes[i : i + 256, : len(row)] = row
    lens = np.full(B, 190, np.int32)
    codes_d = jax.device_put(jnp.asarray(codes), dev)
    lens_d = jax.device_put(jnp.asarray(lens), dev)
    km, kvalid = mr.compute_kmers(codes_d, lens_d)
    skm = jnp.asarray(np.asarray(km)[:, ::PASS1_STEP])
    skv = jnp.asarray(np.asarray(kvalid)[:, ::PASS1_STEP])
    NS = skm.shape[1]
    NQ = B * NS
    print(f"# B={B} NS={NS} skm dtype={skm.dtype}", flush=True)

    dt = fori_time(
        "kv_lookup, real skm, roll_arg=0 (pass1 harness)",
        lambda q, v, k: jnp.stack(
            mr.kv_lookup(k, kvp.shift, kvp.cbits, kvp.pos_bias, q, v), -1
        ),
        it, skm, skv, kv, roll_arg=0,
    )
    print(f"    -> {dt / (2 * NQ) * 1e9:.2f} ns/row", flush=True)

    # same data, loop-varying scalar instead of roll
    kvec = jax.device_put(jnp.arange(it, dtype=jnp.int32), dev)

    def probe_c(q, v, k, c):
        qq = q + c[0].astype(q.dtype)
        return jnp.stack(
            mr.kv_lookup(k, kvp.shift, kvp.cbits, kvp.pos_bias, qq, v), -1
        )

    dt = fori_time(
        "kv_lookup, real skm, +c scalar variant",
        probe_c, it, skm, skv, kv, kvec, roll_arg=3,
    )
    print(f"    -> {dt / (2 * NQ) * 1e9:.2f} ns/row", flush=True)

    # physics sanity: 10x the queries through the +c variant
    big = jnp.tile(skm, (10, 1))
    bigv = jnp.tile(skv, (10, 1))
    dt = fori_time(
        "kv_lookup, 10x queries, +c variant",
        probe_c, it, big, bigv, kv, kvec, roll_arg=3,
    )
    print(f"    -> {dt / (20 * NQ) * 1e9:.2f} ns/row", flush=True)


def main_pin2():
    """Bisect WHICH difference makes kv_lookup 88ms on real kmers but
    0.02ms on synthetic ones: valid-mask-as-argument, stacked return,
    or the kmer data itself."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".bench_cache", "jaxcache")
    )
    import jax.numpy as jnp

    import bench as benchmod
    from genefuserust_tpu.config import PASS1_STEP
    from genefuserust_tpu.ops import map_read as mr
    from genefuserust_tpu.core.sequence import encode_bases

    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)
    mapper = benchmod.get_mapper(15.2)
    kvp = benchmod.get_packed(mapper, 15.2)
    kv = jax.device_put(jnp.asarray(np.asarray(kvp.kv_tbl)), dev)
    it = 6
    rng = np.random.default_rng(0)
    B, W = 32768, 192
    gene = mapper.indexer.fusion_seq[0]
    codes = np.zeros((B, W), np.uint8)
    for i in range(0, B, 256):
        off = int(rng.integers(0, len(gene) - 200))
        row = encode_bases(gene[off : off + 190])
        codes[i : i + 256, : len(row)] = row
    lens = np.full(B, 190, np.int32)
    km, kvalid = mr.compute_kmers(
        jax.device_put(jnp.asarray(codes), dev),
        jax.device_put(jnp.asarray(lens), dev),
    )
    skm = jnp.asarray(np.asarray(km)[:, ::PASS1_STEP])
    skv = jnp.asarray(np.asarray(kvalid)[:, ::PASS1_STEP])
    NS = skm.shape[1]
    NQ = B * NS
    rkm = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, (B, NS), dtype=np.uint64)
                    .astype(np.uint32)), dev
    )
    kvec = jax.device_put(jnp.arange(it, dtype=jnp.int32), dev)
    print(f"# B={B} NS={NS}", flush=True)

    def run_case(name, q, valid_mode, ret_mode):
        def fn(qa, va, t, c):
            qq = qa + c[0].astype(qa.dtype)
            v = va if valid_mode == "arg" else jnp.ones_like(qq, jnp.bool_)
            cc, pp = mr.kv_lookup(t, kvp.shift, kvp.cbits, kvp.pos_bias, qq, v)
            if ret_mode == "stack":
                return jnp.stack((cc, pp), -1)
            return (cc + pp).astype(jnp.int32)

        dt = fori_time(name, fn, it, q, skv, kv, kvec, roll_arg=3)
        print(f"    -> {dt / (2 * NQ) * 1e9:.2f} ns/row", flush=True)

    run_case("real skm, valid=arg, stack   (slow ref)", skm, "arg", "stack")
    run_case("real skm, valid=const, sum   ", skm, "const", "sum")
    run_case("real skm, valid=arg, sum     ", skm, "arg", "sum")
    run_case("real skm, valid=const, stack ", skm, "const", "stack")
    run_case("rand km,  valid=arg, stack   ", rkm, "arg", "stack")
    run_case("rand km,  valid=const, sum   (fast ref)", rkm, "const", "sum")


def main_pin3():
    """Final matrix on the REAL kv table: {1-D, 2-D} indices x {slot-match
    reduce, full kv_lookup} x {full 537MB table, 128MB slice}, each with a
    4x-query physics check. Decides whether the 15 ns/row pass-1 cost is
    index-rank, table-size, or decode-bound."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".bench_cache", "jaxcache")
    )
    import jax.numpy as jnp

    import bench as benchmod
    from genefuserust_tpu.ops import map_read as mr

    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)
    mapper = benchmod.get_mapper(15.2)
    kvp = benchmod.get_packed(mapper, 15.2)
    kv_full = jax.device_put(jnp.asarray(np.asarray(kvp.kv_tbl)), dev)
    n_full = kvp.n_buckets
    n_small = 4_194_304  # 128 MB slice
    kv_small = kv_full[:n_small]
    print(f"# full: {n_full/1e6:.1f}M rows, small: {n_small/1e6:.1f}M rows",
          flush=True)
    rng = np.random.default_rng(0)
    B, NS = 32768, 89
    NQ = B * NS
    it = 6
    kvec = jax.device_put(jnp.arange(it, dtype=jnp.int32), dev)
    km2 = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, (B, NS), dtype=np.uint64)
                    .astype(np.uint32)), dev
    )
    km1 = km2.reshape(-1)

    def reduce_probe(t, n):
        def fn(q, tt, c):
            kk = q + c[0].astype(q.dtype)
            b1 = ((kk * jnp.uint32(0x9E3779B1)).astype(jnp.uint32)
                  % jnp.uint32(n)).astype(jnp.int32)
            r = jnp.take(tt, b1, axis=0)
            return jnp.where(r[..., :4] == kk[..., None].astype(jnp.int32),
                             1, 0).sum(-1)
        return fn

    def full_probe(t, n):
        def fn(q, tt, c):
            kk = q + c[0].astype(q.dtype)
            cc, pp = mr.kv_lookup(tt, kvp.shift, kvp.cbits, kvp.pos_bias, kk,
                                  jnp.ones_like(kk, jnp.bool_))
            return (cc + pp).astype(jnp.int32)
        return fn

    for tname, tt, n in (("full537", kv_full, n_full), ("small128", kv_small, n_small)):
        for iname, q in (("1-D", km1), ("2-D", km2)):
            for pname, mk, ng in (("reduce", reduce_probe, 1), ("kvlookup", full_probe, 2)):
                dt = fori_time(f"{tname} {iname} {pname}", mk(tt, n), it, q, tt,
                               kvec, roll_arg=2)
                print(f"    -> {dt / (ng * NQ) * 1e9:.2f} ns/row", flush=True)
    # physics check on the fastest-looking combos: 4x queries
    km1x4 = jnp.tile(km1, 4)
    for tname, tt, n in (("full537", kv_full, n_full),):
        dt = fori_time(f"{tname} 1-D reduce x4q", reduce_probe(tt, n), it,
                       km1x4, tt, kvec, roll_arg=2)
        print(f"    -> {dt / (4 * NQ) * 1e9:.2f} ns/row", flush=True)
        dt = fori_time(f"{tname} 1-D kvlookup x4q", full_probe(tt, n), it,
                       km1x4, tt, kvec, roll_arg=2)
        print(f"    -> {dt / (8 * NQ) * 1e9:.2f} ns/row", flush=True)


if __name__ == "__main__":
    if "--pin3" in sys.argv:
        main_pin3()
    elif "--pin2" in sys.argv:
        main_pin2()
    elif "--pin" in sys.argv:
        main_pin()
    elif "--kv" in sys.argv:
        main_kv()
    else:
        main()
