#!/usr/bin/env python3
"""Host memory-bandwidth probe (driver-side only, not part of the
library): numpy int64 sum sweeps over a 256 MiB array, 16-way sliced.
Reports BURST (first second of sweeps) and SUSTAINED (after ~8 s of
continuous load) separately: the r17 host forensics in BASELINE.md
showed a burst-credit throttle — one-shot probes read 45-85 GB/s
while any process that has been driving memory for seconds gets
14-25 — so only the SUSTAINED figure predicts what graft.Bench will
see. Healthy band: sustained >= ~30 GB/s."""
import numpy as np, time
from concurrent.futures import ThreadPoolExecutor

n = 32 << 20
a = np.full(n, 7, dtype=np.int64)
nt = 16
chunk = n // nt
def sweep(t):
    return a[t * chunk:(t + 1) * chunk].sum()

with ThreadPoolExecutor(nt) as ex:
    list(ex.map(sweep, range(nt)))  # touch + warm
    rates = []
    t_start = time.time()
    while time.time() - t_start < 12:
        t0 = time.time()
        list(ex.map(sweep, range(nt)))
        rates.append((time.time() - t_start, 8.0 * n / (time.time() - t0) / 1e9))
burst = max(r for ts, r in rates if ts < 1.5)
tail = [r for ts, r in rates if ts > 8.0]
sustained = sorted(tail)[len(tail) // 2] if tail else float("nan")
state = "HEALTHY" if sustained >= 30 else "throttled"
print(f"membw burst {burst:.1f} GB/s, sustained {sustained:.1f} GB/s "
      f"({state} vs the >=30 sustained band; {len(rates)} sweeps)")
