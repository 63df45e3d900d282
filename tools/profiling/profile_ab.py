"""A/B timing: pass1 merged-lane kernel, split vs KV table layout.

Isolates the round-2 regression: bench dropped 29.4k -> 16.7k pairs/s
after the KV-row + width-bucketing change. Times pass1_rows_merged at
bench shapes (32768 rows) for: split layout @ full width, KV layout @
full width, KV layout @ trimmed width 192.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def fori_time(name, fn, iters, *args, roll_arg=0):
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
    print(f"{name:48s} {dt * 1e3:9.2f} ms/iter", flush=True)
    return dt


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".bench_cache", "jaxcache")
    )
    import jax.numpy as jnp

    import bench as benchmod
    from genefuserust_tpu.config import MIN_OVERLAP, Settings
    from genefuserust_tpu.ops.fused import fused_merge_chunked, pass1_rows_merged
    from genefuserust_tpu.ops.hashtable import PackedIndex
    from genefuserust_tpu.ops.pack import SEQ4_LUT, pack_q2, pack_seq4, qual_class

    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)

    mapper = benchmod.get_mapper(15.2)
    kvp = benchmod.get_packed(mapper, 15.2)
    base = os.path.join(benchmod.CACHE, "packed_15.2_v3")
    meta = np.load(base + "_meta.npy")
    split = PackedIndex(
        None,
        np.load(base + "_dupes.npy", mmap_mode="r"),
        int(meta[0]),
        int(meta[1]),
        int(meta[2]),
        keys_tbl=np.load(base + "_keys.npy", mmap_mode="r"),
        vals_tbl=np.load(base + "_vals.npy", mmap_mode="r"),
        empty_key=int(meta[3]),
    )

    B = 32768
    L = 160
    block = benchmod.gen_block(mapper, B, 150)
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
    msum, m_codes = fused_merge_chunked(
        jnp.asarray(buf), jnp.asarray(lens2), L, 2048
    )
    M = np.asarray(msum)
    ml_np = M[:, 2].astype(np.int32)
    mi = jnp.asarray(np.arange(B, dtype=np.int32))
    ml = jnp.asarray(ml_np)
    st = Settings()
    it = 6

    kv_keys = jnp.asarray(np.asarray(kvp.kv_tbl))
    kv_dupes = jnp.asarray(np.asarray(kvp.dupes))
    dummy = jnp.zeros((1, 2), jnp.int32)
    sp_keys = jnp.asarray(np.asarray(split.keys_tbl))
    sp_vals = jnp.asarray(np.asarray(split.vals_tbl))
    sp_dupes = jnp.asarray(np.asarray(split.dupes))
    print("# tables uploaded", flush=True)

    common = dict(
        L2=2 * L,
        major_req=st.major_gene_key_requirement,
        minor_req=st.minor_gene_key_requirement,
    )

    # tables are fori ARGS, never closure constants (a closed-over table
    # is embedded in the compile request -> tunnel HTTP 413)
    fori_time(
        "split @ width290",
        lambda mc, i, l, k, v, d: pass1_rows_merged(
            mc, i, l, k, v, d,
            shift=split.shift, max_dupe=split.max_dupe, **common,
        ),
        it, m_codes, mi, ml, sp_keys, sp_vals, sp_dupes, roll_arg=1,
    )
    fori_time(
        "kv    @ width290",
        lambda mc, i, l, k, v, d: pass1_rows_merged(
            mc, i, l, k, v, d,
            shift=kvp.shift, max_dupe=kvp.max_dupe, kv=True,
            cbits=kvp.cbits, pos_bias=kvp.pos_bias, **common,
        ),
        it, m_codes, mi, ml, kv_keys, dummy, kv_dupes, roll_arg=1,
    )
    fori_time(
        "kv    @ width192",
        lambda mc, i, l, k, v, d: pass1_rows_merged(
            mc, i, l, k, v, d,
            shift=kvp.shift, max_dupe=kvp.max_dupe, kv=True,
            cbits=kvp.cbits, pos_bias=kvp.pos_bias, width=192, **common,
        ),
        it, m_codes, mi, ml, kv_keys, dummy, kv_dupes, roll_arg=1,
    )
    fori_time(
        "split @ width192",
        lambda mc, i, l, k, v, d: pass1_rows_merged(
            mc, i, l, k, v, d,
            shift=split.shift, max_dupe=split.max_dupe, width=192, **common,
        ),
        it, m_codes, mi, ml, sp_keys, sp_vals, sp_dupes, roll_arg=1,
    )


if __name__ == "__main__":
    main()
