"""Pipelined-DMA row gather (round-3 rebuild of the round-1 ring).

Differences from the round-1 kernel that wedged the device
(profile_pallas_gather.py):
  - .wait() uses the SAME descriptor as .start() (recomputed src slice),
    exactly matching the pallas guide's double-buffering pattern — the
    shape-only wait descriptor was the prime crash suspect;
  - NFLIGHT is a parameter (default 2 = the guide's double buffer);
  - a tiny smoke case (grid=1, one tile) runs before any timed case;
  - interpret-mode equality is checked first, always.

Usage:
  python tools/profiling/profile_dma_ring.py smoke      # interpret only (any host)
  python tools/profiling/profile_dma_ring.py device     # tiny on-device smoke
  python tools/profiling/profile_dma_ring.py bench [W] [NFLIGHT]  # timed
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

TILE = 1024  # queries per grid program (SMEM int32 layout T(1024))


def build(nb, W, NFLIGHT, grid, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, tbl_ref, o_ref):
        g = pl.program_id(0)

        def body(scratch, sems):
            def get_dma(slot, k):
                return pltpu.make_async_copy(
                    tbl_ref.at[pl.ds(idx_ref[k], 1)],
                    scratch.at[pl.ds(slot, 1)],
                    sems.at[slot],
                )

            for k in range(NFLIGHT):
                get_dma(k, k).start()

            def step(k, acc):
                slot = jax.lax.rem(k, NFLIGHT)
                # wait with the SAME descriptor the start used
                get_dma(slot, k).wait()
                acc = acc + jnp.sum(scratch[slot])

                @pl.when(k + NFLIGHT < TILE)
                def _():
                    get_dma(slot, k + NFLIGHT).start()

                return acc

            acc = jax.lax.fori_loop(0, TILE, step, jnp.int32(0))
            o_ref[g] = acc  # SMEM output: scalar stores are legal there

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((NFLIGHT, W), jnp.int32),
            sems=pltpu.SemaphoreType.DMA((NFLIGHT,)),
        )

    @jax.jit
    def run(idx, tbl):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((grid,), jnp.int32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec(
                        (TILE,), lambda g: (g,), memory_space=pltpu.SMEM
                    ),
                    # HBM explicitly: ANY lets the compiler put small tables
                    # in VMEM, where dynamic row slices must be 128-lane
                    # aligned (Mosaic compile error). Production tables are
                    # hundreds of MB and live in HBM anyway.
                    pl.BlockSpec(memory_space=pltpu.HBM),
                ],
                out_specs=pl.BlockSpec(
                    (grid,), lambda g: (0,), memory_space=pltpu.SMEM
                ),
            ),
            interpret=interpret,
        )(idx, tbl)

    return run


def ref_sums(idx, tbl, grid):
    rows = tbl[idx]  # (NQ, W)
    return rows.reshape(grid, TILE, -1).sum(axis=(1, 2)).astype(np.int32)


def case(nb, W, NFLIGHT, grid, interpret, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    tbl = rng.integers(0, 50, (nb, W)).astype(np.int32)
    idx = rng.integers(0, nb, grid * TILE).astype(np.int32)
    fn = build(nb, W, NFLIGHT, grid, interpret)
    out = np.asarray(fn(jnp.asarray(idx), jnp.asarray(tbl)))
    exp = ref_sums(idx, tbl, grid)
    assert np.array_equal(out, exp), (out[:8], exp[:8])
    return fn, idx, tbl


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "smoke"
    if mode == "smoke":
        import jax

        jax.config.update("jax_platforms", "cpu")
        for nf in (1, 2, 4, 8):
            case(nb=4096, W=8, NFLIGHT=nf, grid=2, interpret=True)
            print(f"interpret NFLIGHT={nf}: ok")
        return

    import jax
    import jax.numpy as jnp

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    if mode == "device":
        # Mosaic constraint (measured on-device): DMA slice minormost dim
        # must be 128-lane aligned — so the probe fetches whole 128-lane
        # lines (512B for int32). Row width must be a multiple of 128 lanes.
        case(nb=4096, W=128, NFLIGHT=2, grid=1, interpret=False)
        print("device smoke NFLIGHT=2 W=128: ok")
        case(nb=1 << 20, W=128, NFLIGHT=8, grid=4, interpret=False)
        print("device smoke NFLIGHT=8 W=128 1M-row table: ok")
        return

    if mode == "fori":
        # in-jit fori timing (the only dispatch-latency-free methodology on
        # this tunnel; content varied per iter to defeat memoization)
        W = int(sys.argv[2]) if len(sys.argv) > 2 else 128
        NFLIGHT = int(sys.argv[3]) if len(sys.argv) > 3 else 4
        NIT = int(sys.argv[4]) if len(sys.argv) > 4 else 32
        # production-scale table: 1M lines x 512B = 512MB (kv2 at 15.2Mbp)
        nb = 1 << 20
        grid = 128
        NQ = grid * TILE
        rng = np.random.default_rng(1)
        tbl = rng.integers(0, 50, (nb, W)).astype(np.int32)
        idx = rng.integers(0, nb, grid * TILE).astype(np.int32)
        # equality already proven by `device` mode; build fn directly
        fn = build(nb, W, NFLIGHT, grid) if W % 128 == 0 else None
        if fn is None:
            print(
                f"pallas ring skipped: W must be a multiple of 128 (got {W})",
                file=sys.stderr,
            )
        didx = jnp.asarray(idx)
        dtbl = jnp.asarray(tbl)

        def make_loop(f, n):
            @jax.jit
            def loop(idx, tbl, salt):
                def body(i, acc):
                    v = (idx + (salt + i) * jnp.int32(1640531527)) % nb
                    return acc + f(v, tbl).sum()

                return jax.lax.fori_loop(0, n, body, jnp.int32(0))

            return loop

        @jax.jit
        def xla_take(idx, tbl):
            return jnp.take(tbl, idx, axis=0).sum(axis=1)

        arms = [("pallas ring", fn), ("xla take", xla_take)]
        for name, f in [(n, f) for n, f in arms if f is not None]:
            l1 = make_loop(f, 1)
            lN = make_loop(f, NIT)
            np.asarray(l1(didx, dtbl, jnp.int32(0)))  # warm/compile
            np.asarray(lN(didx, dtbl, jnp.int32(1)))
            t0 = time.time()
            a = np.asarray(l1(didx, dtbl, jnp.int32(100)))
            t1 = time.time()
            b = np.asarray(lN(didx, dtbl, jnp.int32(200)))
            t2 = time.time()
            per = ((t2 - t1) - (t1 - t0)) / (NIT - 1)
            print(
                f"{name:12s} W={W} NFLIGHT={NFLIGHT}: {per * 1e3:8.2f} ms/iter "
                f"({per / NQ * 1e9:6.2f} ns/row)  [1-iter {t1 - t0:.3f}s, "
                f"{NIT}-iter {t2 - t1:.3f}s]"
            )
        return

    # bench: ns/row vs the XLA take at the same shape
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    NFLIGHT = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    if W % 128 != 0:
        sys.exit(
            f"bench: W must be a multiple of 128 lanes (got {W}) — "
            "Mosaic requires 128-lane-aligned DMA slices"
        )
    nb = 1 << 22
    grid = 128
    NQ = grid * TILE
    fn, idx, tbl = case(nb, W, NFLIGHT, grid, interpret=False, seed=1)
    didx = jnp.asarray(idx)
    dtbl = jnp.asarray(tbl)

    @jax.jit
    def xla_take(idx, tbl):
        return jnp.take(tbl, idx, axis=0).sum(axis=1)

    # content-varied iterations (axon memoizes identical executions)
    idxs = [jnp.asarray(np.roll(idx, i + 1)) for i in range(4)]
    for name, f in (("pallas ring", fn), ("xla take", xla_take)):
        np.asarray(f(didx, dtbl))  # warm
        t0 = time.time()
        for i in range(4):
            np.asarray(f(idxs[i], dtbl))
        dt = (time.time() - t0) / 4
        print(
            f"{name:12s} W={W} NFLIGHT={NFLIGHT}: {dt * 1e3:8.2f} ms "
            f"({dt / NQ * 1e9:6.2f} ns/row)"
        )


if __name__ == "__main__":
    main()
