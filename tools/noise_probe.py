"""Cheap host-noise probe: fixed multi-core CPU work, no JVM.

This sandbox is a microVM on a shared host; co-tenant interference
arrives in hour-scale bursts that no in-VM load metric sees (loadavg
stays ~0 while wall time triples — round-4/5 lesson). Before taking any
benchmark record, run this probe: 16 processes each doing a fixed
numpy matmul loop. Wall time on a quiet box is stable run-to-run; a
noisy host inflates it the same way it inflates Spark stage walls.

Prints one JSON line {"probe_wall": s, "single_wall": s}. Compare
against the committed quiet references in BENCH/canary_history.json
("noise_probe" records) — within ~15% of the minimum = quiet enough.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def _work(_: int) -> float:
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.standard_normal((512, 512))
    t0 = time.time()
    for _i in range(40):
        a = np.tanh(a @ a.T / 512.0)
    return time.time() - t0


def main() -> dict:
    t0 = time.time()
    single = _work(0)
    with mp.Pool(16) as p:
        walls = p.map(_work, range(16))
    out = {
        "single_wall": round(single, 2),
        "probe_wall": round(max(walls), 2),
        "total_wall": round(time.time() - t0, 2),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
