"""Host-side stage timing of the real engine pipeline on the chip.

NOTE (post readiness-gated scheduler): with pipeline_depth >= the number
of batches in the harness block, everything assembles in flush() and the
reported rate measures pipeline FILL+DRAIN, not steady state — use
bench.py (5x8-batch iterations) for throughput; this harness is for
stage-cost decomposition only.

Unlike profile_ab.py (pure kernel time), this measures where WALL time
goes per batch in TpuEngine: stage issue costs (host pack + upload +
dispatch) and stage fetch costs (blocking np.asarray), plus host
assembly. Run after bench.py has populated the compile cache.
"""

import os
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".bench_cache", "jaxcache")
    )
    import bench as benchmod
    from genefuserust_tpu.config import Settings
    from genefuserust_tpu.parallel import engine as eng

    times = defaultdict(float)
    counts = defaultdict(int)

    def wrap(name, fn):
        def inner(*a, **k):
            t0 = time.time()
            r = fn(*a, **k)
            times[name] += time.time() - t0
            counts[name] += 1
            return r

        return inner

    BS = int(os.environ.get("PROF_BATCH", "65536"))
    mapper = benchmod.get_mapper(15.2)
    packed = benchmod.get_packed(mapper, 15.2)
    engine = eng.TpuEngine(Settings(), batch_size=BS)
    engine.use_packed(packed, mapper)

    engine._st0_produce = wrap("st0_produce(merge+pack+upload)", engine._st0_produce)
    engine._fetch_merge = wrap("st1_fetch_merge", engine._fetch_merge)
    engine._st1_issue_scan = wrap("st1_total(join+dispatch)", engine._st1_issue_scan)
    engine._st3_assemble = wrap("st3_assemble(fetch+host)", engine._st3_assemble)
    # fetch-join wait, counted separately (it is INSIDE st2/st3 totals):
    # large values mean the stage thread blocks on device results that
    # have not landed yet — i.e. the device (or transfer) is behind
    real_get = eng._Fetch.get

    def timed_get(self_):
        t0 = time.time()
        r = real_get(self_)
        times["  (fetch-join wait, all stages)"] += time.time() - t0
        counts["  (fetch-join wait, all stages)"] += 1
        return r

    eng._Fetch.get = timed_get

    block = benchmod.gen_block(mapper, 131072)

    # warmup
    t0 = time.time()
    engine.scan_pair_block(mapper, block)
    engine.flush(mapper)
    print(f"# warmup: {time.time() - t0:.1f}s", flush=True)
    times.clear()
    counts.clear()
    if engine._timers:
        engine._timers.clear()

    t0 = time.time()
    for _ in range(2):
        engine.scan_pair_block(mapper, block)
    engine.flush(mapper)
    total = time.time() - t0
    n_batches = 2 * 131072 // BS
    print(f"# steady: {total:.2f}s for {n_batches} batches "
          f"({2 * 131072 / total:,.0f} pairs/s)", flush=True)
    for k in sorted(times, key=lambda k: -times[k]):
        print(
            f"{k:34s} {times[k]:7.2f}s total  "
            f"{times[k] / max(1, counts[k]) * 1e3:7.1f} ms/call x{counts[k]}",
            flush=True,
        )
    acc = sum(times[k] for k in times if k != "st1_fetch_merge")
    print(f"{'(sum of stages)':34s} {acc:7.2f}s of {total:.2f}s", flush=True)
    if engine._timers:
        print("# fine timers (st0 runs on the producer thread):", flush=True)
        for k in sorted(engine._timers, key=lambda k: -engine._timers[k][0]):
            tot, n = engine._timers[k]
            print(f"  {k:32s} {tot:7.2f}s total  "
                  f"{tot / max(1, n) * 1e3:7.1f} ms/call x{n}", flush=True)


if __name__ == "__main__":
    main()
