"""Per-stage kernel timings on the current default device (diagnostics)."""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--read-len", type=int, default=160)
    ap.add_argument("--panel-mbp", type=float, default=2.0)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import get_packed
    from genefuserust_tpu.core.sequence import BASE_CODE_LUT
    from genefuserust_tpu.ops import map_read as M
    from genefuserust_tpu.ops.merge import merge_batch

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)
    from bench import get_mapper

    mapper = get_mapper(args.panel_mbp)
    packed = get_packed(mapper, args.panel_mbp)
    keys_tbl = jax.device_put(jnp.asarray(packed.keys_tbl), dev)
    vals_tbl = jax.device_put(jnp.asarray(packed.vals_tbl), dev)
    dupes = jax.device_put(jnp.asarray(packed.dupes), dev)
    B, L = args.batch, args.read_len
    from bench import gen_block

    blk = gen_block(mapper, B, L)
    b1, q1 = blk.left.seq, blk.left.qual
    lens = blk.left.lens
    from genefuserust_tpu.core.sequence import COMPLEMENT_LUT

    b2 = blk.right.seq
    b2r = COMPLEMENT_LUT[b2][:, ::-1].copy()
    q2r = blk.right.qual[:, ::-1].copy()
    codes = BASE_CODE_LUT[b1]
    d = lambda x: jax.device_put(jnp.asarray(x), dev)
    codes_d, lens_d = d(codes), d(lens)
    b1d, q1d, b2d, b2rd, q2rd = d(b1), d(q1), d(b2), d(b2r), d(q2r)

    def bench(name, fn, *xs):
        t0 = time.time()
        out = fn(*xs)
        jax.block_until_ready(out)
        compile_t = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(*xs)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / args.iters
        print(f"{name:24s} {dt * 1e3:9.2f} ms/iter  (compile {compile_t:.1f}s)")
        return out

    NK = L - 16 + 1
    km_fn = jax.jit(M.compute_kmers)
    km, kv = bench("compute_kmers", km_fn, codes_d, lens_d)

    lk_fn = jax.jit(
        lambda kt, vt, k, v: M.hash_lookup((kt, vt), packed.shift, k, v)
    )
    contig, pos = bench("hash_lookup", lk_fn, keys_tbl, vals_tbl, km, kv)

    ex_fn = jax.jit(
        lambda c, p, dp: M.expand_candidates(c, p, dp, packed.max_dupe)
    )
    cc, cp, cv = bench("expand_candidates", ex_fn, contig, pos, dupes)

    D = int(cc.shape[-1])

    def pass1(cc, cp, cv):
        i_idx = jax.lax.broadcasted_iota(jnp.int32, cc.shape[:2], 1)
        sc = cc[:, ::2, :]
        sp = cp[:, ::2, :]
        sv = cv[:, ::2, :]
        si = i_idx[:, ::2, None]
        NS = sc.shape[1]
        return M.top2_votes(
            (sc).reshape(B, NS * D),
            (sp - si).reshape(B, NS * D),
            sv.reshape(B, NS * D),
        )

    p1 = bench("pass1_top2(sort)", jax.jit(pass1), cc, cp, cv)
    h1, l1, c1, h2, l2, c2 = p1

    def pass2(cc, cp, cv, h1, l1, h2, l2):
        i_idx = jax.lax.broadcasted_iota(jnp.int32, cc.shape[:2], 1)
        a_lo = cp - i_idx[:, :, None]
        m1 = M._eq_pm1(cc, a_lo, h1[:, None, None], l1[:, None, None])
        m2 = M._eq_pm1(cc, a_lo, h2[:, None, None], l2[:, None, None])
        flag = jnp.where(cv & m1, 3, jnp.where(cv & m2, 2, 0)).astype(jnp.int32)
        flagpos = jnp.max(flag, axis=2)
        pad = jnp.zeros((B, 15), jnp.int32)
        padded = jnp.concatenate([pad, flagpos, pad], axis=1)
        mask = jnp.zeros((B, L), jnp.int32)
        for j in range(16):
            mask = jnp.maximum(mask, padded[:, 15 - j : 15 - j + L])
        return mask

    mask = bench("pass2_mask", jax.jit(pass2), cc, cp, cv, h1, l1, h2, l2)

    seg_fn = jax.jit(lambda m, l: M.extract_segments(m, l, 3))
    bench("extract_segments", seg_fn, mask, lens_d)

    full = jax.jit(
        lambda c, l, kt, vt, dp: M.map_read_batch(
            c, l, kt, vt, dp, packed.shift, packed.max_dupe
        )
    )
    bench("map_read_batch(full)", full, codes_d, lens_d, keys_tbl, vals_tbl, dupes)

    mg = jax.jit(merge_batch)
    bench("merge_batch", mg, b1d, q1d, lens_d, b2rd, q2rd, lens_d)

    # dispatch-latency floor
    tiny = jax.jit(lambda x: x + 1)
    bench("dispatch_floor", tiny, lens_d)


if __name__ == "__main__":
    main()
