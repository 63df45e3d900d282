"""Kernel microbenchmarks (the reference ships criterion microbenches,
benches/my_benchmark.rs; these are the engine-level equivalents).

Usage: python benches/micro.py [--device cpu|default]
Prints a ms/op table for: merge, map_read, edit distance, hash lookup,
host index build + pack.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="default")
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from bench import build_panel, gen_pairs, get_packed
    from genefuserust_tpu.core.sequence import BASE_CODE_LUT
    from genefuserust_tpu.ops.edit_distance import edit_distance_batch
    from genefuserust_tpu.ops.hashtable import pack_index
    from genefuserust_tpu.ops.map_read import map_read_batch
    from genefuserust_tpu.ops.merge import merge_batch

    dev = jax.devices()[0]
    print(f"device: {dev}")
    B = args.batch

    t0 = time.time()
    ix, _ = build_panel(0.5)
    t_build = time.time() - t0
    t0 = time.time()
    packed = pack_index(ix)
    t_pack = time.time() - t0
    print(f"host index build (1Mbp eq): {t_build * 1e3:8.1f} ms")
    print(f"host table pack:            {t_pack * 1e3:8.1f} ms")

    table = jax.device_put(jnp.asarray(packed.table), dev)
    dupes = jax.device_put(jnp.asarray(packed.dupes), dev)
    packed_np = packed

    get_packed(0.5)  # ensure seqs cache exists for gen_pairs
    b1, q1, b2, b2r, q2r, lens = gen_pairs(0.5, B, 150)
    d = lambda x: jax.device_put(jnp.asarray(x), dev)

    def timed(name, fn, *xs):
        out = fn(*xs)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(*xs)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / args.iters
        print(f"{name:28s} {dt * 1e3:8.2f} ms  ({B / dt:,.0f}/s)")

    timed(
        "merge_batch",
        jax.jit(merge_batch),
        d(b1), d(q1), d(lens), d(b2r), d(q2r), d(lens),
    )
    codes = d(BASE_CODE_LUT[b1])
    timed(
        "map_read_batch",
        jax.jit(
            lambda c, l, t, dp: map_read_batch(
                c, l, t, dp, packed_np.shift, packed_np.max_dupe
            )
        ),
        codes, d(lens), table, dupes,
    )
    pl = np.full(B, 75, np.int32)
    timed(
        "edit_distance_batch W=3",
        jax.jit(lambda p, pl, t, tl: edit_distance_batch(p, pl, t, tl, 3)),
        d((BASE_CODE_LUT[b1] % 5)[:, :96]), d(pl),
        d((BASE_CODE_LUT[b2] % 5)[:, :96]), d(pl),
    )


if __name__ == "__main__":
    main()
