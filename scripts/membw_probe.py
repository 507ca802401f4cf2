#!/usr/bin/env python3
"""Quick host memory-bandwidth probe (driver-side only, not part of
the library): numpy int64 sum sweeps over a 256 MiB array, single
thread and 16-way sliced — the same shape as graft.Bench's in-run
membw probe. Use before launching a full bench run: the healthy band
recorded in BASELINE.md is aggregate >= ~30 GB/s (numpy's sliced sum
releases the GIL, so the parallel figure is comparable)."""
import numpy as np, time
from concurrent.futures import ThreadPoolExecutor

n = 32 << 20
a = np.full(n, 7, dtype=np.int64)
a.sum()
best1 = 0.0
for _ in range(3):
    t = time.time(); a.sum(); d = time.time() - t
    best1 = max(best1, 8.0 * n / d / 1e9)
nt = 16
chunk = n // nt
def sweep(t):
    return a[t * chunk:(t + 1) * chunk].sum()
with ThreadPoolExecutor(nt) as ex:
    list(ex.map(sweep, range(nt)))
    bestp = 0.0
    for _ in range(3):
        t0 = time.time(); list(ex.map(sweep, range(nt))); d = time.time() - t0
        bestp = max(bestp, 8.0 * n / d / 1e9)
print(f"membw 1t {best1:.1f} GB/s, parallel({nt}) {bestp:.1f} GB/s "
      f"({'HEALTHY' if bestp >= 30 else 'throttled'} vs the >=30 band)")
