"""Timed Pallas row-gather: can DMA-per-row beat XLA's ~17ns/row gather?

ROUND-1 STATUS: compiles after two block-shape fixes (out block must be
tile-aligned or whole-array; SMEM query block must match XLA layout T(1024)
=> TILE=1024), but the in-flight DMA ring then crashed the remote TPU
backend at RUNTIME ("TPU backend error (Internal)") and the device took
~6 minutes to auto-recover. The ring's wait/start pairing (shape-only
`.wait()` descriptor) is the prime suspect. DO NOT run casually — wedges
the shared device; develop this in a dedicated session (round 2).

Kernel: grid over query tiles; each program DMAs QN rows of (1, 128) int32
from an HBM table into VMEM (double-buffered ring of in-flight copies),
sums them. Compares against the XLA jnp.take baseline at identical shapes.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)
    rng = np.random.default_rng(0)
    nb = 1 << 22
    W = 128  # row width int32 (one full lane row)
    NQ = 1 << 17  # queries per call
    TILE = 1024  # queries per grid program (matches XLA layout T(1024))
    NFLIGHT = 8

    tbl = jax.device_put(
        jnp.asarray(rng.integers(0, 99, (nb, W)).astype(np.int32)), dev
    )
    idx = jax.device_put(
        jnp.asarray(rng.integers(0, nb, NQ).astype(np.int32)), dev
    )

    def kernel(idx_ref, tbl_ref, o_ref):
        def body(scratch, sems):
            def start(k):
                b = idx_ref[k]
                pltpu.make_async_copy(
                    tbl_ref.at[pl.ds(b, 1)],
                    scratch.at[pl.ds(k % NFLIGHT, 1)],
                    sems.at[k % NFLIGHT],
                ).start()

            for k in range(NFLIGHT):
                start(k)

            def step(k, acc):
                pltpu.make_async_copy(
                    tbl_ref.at[pl.ds(0, 1)],  # shape-only for wait
                    scratch.at[pl.ds(k % NFLIGHT, 1)],
                    sems.at[k % NFLIGHT],
                ).wait()
                acc = acc + jnp.sum(scratch[k % NFLIGHT])

                @pl.when(k + NFLIGHT < TILE)
                def _():
                    b = idx_ref[k + NFLIGHT]
                    pltpu.make_async_copy(
                        tbl_ref.at[pl.ds(b, 1)],
                        scratch.at[pl.ds((k + NFLIGHT) % NFLIGHT, 1)],
                        sems.at[(k + NFLIGHT) % NFLIGHT],
                    ).start()

                return acc

            acc = jax.lax.fori_loop(0, TILE, step, jnp.int32(0))
            o_ref[pl.program_id(0), :] = jnp.broadcast_to(acc, (128,))

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((NFLIGHT, W), jnp.int32),
            sems=pltpu.SemaphoreType.DMA((NFLIGHT,)),
        )

    grid = NQ // TILE

    @jax.jit
    def pallas_gather(idx, tbl):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((grid, 128), jnp.int32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((TILE,), lambda g: (g,), memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec((grid, 128), lambda g: (0, 0)),
            ),
        )(idx, tbl)

    @jax.jit
    def xla_gather(idx, tbl):
        def body(k, acc):
            return acc + jnp.take(tbl, (idx + k) % nb, axis=0).sum()

        return jax.lax.fori_loop(0, 4, body, jnp.int32(0))

    def timed(name, fn, per_call_rows, iters=4):
        out = np.asarray(fn(idx, tbl))
        t0 = time.time()
        for _ in range(iters):
            out = np.asarray(fn(idx, tbl))
        dt = (time.time() - t0) / iters
        print(f"{name:28s} {dt * 1e3:8.2f} ms  ({dt / per_call_rows * 1e9:6.2f} ns/row)")

    timed("xla take rows128 (4x)", xla_gather, 4 * NQ)
    timed("pallas dma rows128", pallas_gather, NQ)


if __name__ == "__main__":
    main()
