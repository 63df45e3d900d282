"""Host-side stage timing of the real engine pipeline on the chip.

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

    mapper = benchmod.get_mapper(15.2)
    packed = benchmod.get_packed(mapper, 15.2)
    engine = eng.TpuEngine(Settings(), batch_size=32768)
    engine.use_packed(packed)
    engine._prepared_for = mapper

    engine._st0_issue_merge = wrap("st0_issue(pack+upload+merge)", engine._st0_issue_merge)
    engine._fetch_merge = wrap("st1_fetch_merge", engine._fetch_merge)
    engine._st1_issue_pass1 = wrap("st1_total(fetch+issue)", engine._st1_issue_pass1)
    engine._st2_issue_pass2 = wrap("st2_total(fetchP1+issueP2)", engine._st2_issue_pass2)
    engine._st3_assemble = wrap("st3_assemble(fetch+host)", engine._st3_assemble)

    block = benchmod.gen_block(mapper, 131072, 150)

    # warmup
    t0 = time.time()
    engine.scan_pair_block(mapper, block)
    engine.flush(mapper)
    print(f"# warmup: {time.time() - t0:.1f}s", flush=True)
    times.clear()
    counts.clear()

    t0 = time.time()
    for _ in range(2):
        engine.scan_pair_block(mapper, block)
    engine.flush(mapper)
    total = time.time() - t0
    n_batches = 2 * 131072 // 32768
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


if __name__ == "__main__":
    main()
