"""Reliable (in-jit fori_loop) gather-strategy measurements on the device.

Questions: does index ORDER (sorted vs random) change row-gather
throughput; what does row WIDTH cost; how expensive is an in-jit sort +
unpermute (the components of a sort-join lookup)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)
    rng = np.random.default_rng(0)
    nb = 1 << 22  # ~4M buckets (2Mbp panel scale)
    NQ = 1 << 20  # ~1M lookups per iter

    tbl8 = jax.device_put(
        jnp.asarray(rng.integers(0, 99, (nb, 8)).astype(np.int32)), dev
    )
    tbl16 = jax.device_put(
        jnp.asarray(rng.integers(0, 99, (nb, 16)).astype(np.int32)), dev
    )
    idx_rand = rng.integers(0, nb, NQ).astype(np.int32)
    idx_sort = np.sort(idx_rand)
    d_rand = jax.device_put(jnp.asarray(idx_rand), dev)
    d_sort = jax.device_put(jnp.asarray(idx_sort), dev)
    vals = jax.device_put(
        jnp.asarray(rng.integers(0, 2**31, NQ, dtype=np.int64).astype(np.int32)), dev
    )

    def timed(name, fn, *xs, iters=3):
        wrapped = jax.jit(
            lambda *a: jax.lax.fori_loop(
                0, 8, lambda k, acc: acc + fn(k, *a), jnp.int32(0)
            )
        )
        out = np.asarray(wrapped(*xs))
        t0 = time.time()
        for _ in range(iters):
            out = np.asarray(wrapped(*xs))
        dt = (time.time() - t0) / iters / 8
        print(f"{name:34s} {dt * 1e3:8.2f} ms/iter")

    # vary the indices per inner iter (add k, wraps) to defeat caching
    timed("rows8 random", lambda k, t, i: jnp.take(t, (i + k) % nb, axis=0).sum(), tbl8, d_rand)
    timed("rows8 sorted", lambda k, t, i: jnp.take(t, jnp.minimum(i + k, nb - 1), axis=0).sum(), tbl8, d_sort)
    timed("rows16 random", lambda k, t, i: jnp.take(t, (i + k) % nb, axis=0).sum(), tbl16, d_rand)
    timed("rows16 sorted", lambda k, t, i: jnp.take(t, jnp.minimum(i + k, nb - 1), axis=0).sum(), tbl16, d_sort)
    timed(
        "scalar random",
        lambda k, t, i: jnp.take(t[:, 0], (i + k) % nb, axis=0).sum(),
        tbl8,
        d_rand,
    )
    timed(
        "sort u32 1M (2-key payload)",
        lambda k, t, i: jax.lax.sort((i + k, i), dimension=0, num_keys=1)[0].sum(),
        tbl8,
        d_rand,
    )
    timed(
        "unpermute 1M (axis0 take)",
        lambda k, t, i: jnp.take(vals, (i + k) % NQ, axis=0).sum(),
        tbl8,
        d_rand,
    )


if __name__ == "__main__":
    main()
