"""Does the axon tunnel memoize repeated executions with identical input
buffers? fori_time times a SECOND run(*args) with the same handles; if the
plugin caches (executable, input handles) -> result, every such timing is
bogus. Probe: same jitted fori kernel timed (a) with reused buffers,
(b) with freshly device_put copies of the same values each call, plus a
4x-work scaling check on each mode."""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".bench_cache", "jaxcache")
    )
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)
    rng = np.random.default_rng(0)
    N = 8_388_608  # 256 MB table (8xint32 rows)
    tbl_h = rng.integers(0, 2**31, (N, 8), dtype=np.int64).astype(np.int32)
    it = 6

    def make_run(nq):
        @jax.jit
        def run(t, q, kv):
            def body(k, acc):
                c = jnp.roll(kv, k, axis=0)[0]
                kk = q + c
                b = ((kk.astype(jnp.uint32) * jnp.uint32(0x9E3779B1))
                     % jnp.uint32(N)).astype(jnp.int32)
                r = jnp.take(t, b, axis=0)
                m = jnp.where(r[:, :4] == kk[:, None], 1, 0).sum(-1)
                return acc + m.sum()

            return jax.lax.fori_loop(0, it, body, jnp.int32(0))

        return run

    for nq in (1_000_000, 4_000_000):
        run = make_run(nq)
        q_h = rng.integers(0, 2**31, nq).astype(np.int32)
        kv_h = np.arange(it, dtype=np.int32)
        t_d = jax.device_put(jnp.asarray(tbl_h), dev)
        q_d = jax.device_put(jnp.asarray(q_h), dev)
        kv_d = jax.device_put(jnp.asarray(kv_h), dev)
        run(t_d, q_d, kv_d).block_until_ready()  # compile+warm

        # (a) reused buffers, 3 timed calls
        for j in range(3):
            t0 = time.time()
            run(t_d, q_d, kv_d).block_until_ready()
            dt = (time.time() - t0) / it
            print(f"nq={nq/1e6:.0f}M reused   call{j}: {dt*1e3:8.2f} ms/iter "
                  f"({dt/nq*1e9:.2f} ns/row)", flush=True)
        # (b) fresh kv buffer each call (same values)
        for j in range(3):
            kv_f = jax.device_put(jnp.asarray(kv_h), dev)
            t0 = time.time()
            run(t_d, q_d, kv_f).block_until_ready()
            dt = (time.time() - t0) / it
            print(f"nq={nq/1e6:.0f}M fresh-kv call{j}: {dt*1e3:8.2f} ms/iter "
                  f"({dt/nq*1e9:.2f} ns/row)", flush=True)
        # (c) fresh query buffer each call (same values)
        for j in range(3):
            q_f = jax.device_put(jnp.asarray(q_h), dev)
            t0 = time.time()
            run(t_d, q_f, kv_d).block_until_ready()
            dt = (time.time() - t0) / it
            print(f"nq={nq/1e6:.0f}M fresh-q  call{j}: {dt*1e3:8.2f} ms/iter "
                  f"({dt/nq*1e9:.2f} ns/row)", flush=True)
        # (d) DIFFERENT kv values each call (changes every iteration's kk)
        for j in range(3):
            kv_f = jax.device_put(jnp.asarray(kv_h + 7 * (j + 1)), dev)
            t0 = time.time()
            r = run(t_d, q_d, kv_f)
            r.block_until_ready()
            dt = (time.time() - t0) / it
            print(f"nq={nq/1e6:.0f}M diff-kv  call{j}: {dt*1e3:8.2f} ms/iter "
                  f"({dt/nq*1e9:.2f} ns/row) r={int(r)}", flush=True)
        # (e) DIFFERENT query values each call
        for j in range(3):
            q_f = jax.device_put(jnp.asarray(q_h + (j + 1)), dev)
            t0 = time.time()
            r = run(t_d, q_f, kv_d)
            r.block_until_ready()
            dt = (time.time() - t0) / it
            print(f"nq={nq/1e6:.0f}M diff-q   call{j}: {dt*1e3:8.2f} ms/iter "
                  f"({dt/nq*1e9:.2f} ns/row) r={int(r)}", flush=True)


if __name__ == "__main__":
    main()
