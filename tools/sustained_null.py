"""Sustained host-ceiling probe: w concurrent pure-numpy matmul workers for
DURATION seconds, no Ray, no shared state. Throughput = total iterations/s.
Interleaved widths 4,16,4,16 to control drift."""
import json, multiprocessing as mp, sys, time

DURATION = 30.0

def worker(q):
    import numpy as np
    rng = np.random.default_rng(0)
    a = rng.random((384, 384)); b = rng.random((384, 384))
    t0 = time.time(); n = 0
    while time.time() - t0 < DURATION:
        (a @ b).sum(); n += 1
    q.put(n)

def leg(w):
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q,)) for _ in range(w)]
    t0 = time.time()
    for p in ps: p.start()
    # drain BEFORE join: each q.get() returns only after its worker finished
    # its timed loop, so the wall measurement is unchanged, and join can never
    # deadlock on a full pipe buffer (the classic join-before-get hazard)
    total = sum(q.get() for _ in ps)
    wall = time.time() - t0
    for p in ps: p.join()
    return total / wall

if __name__ == "__main__":
    legs = []
    for w in (4, 16, 4, 16):
        thr = leg(w)
        legs.append({"width": w, "iters_per_sec": round(thr, 1)})
        print(f"width {w}: {thr:.1f} iters/s", file=sys.stderr)
    t4 = [l["iters_per_sec"] for l in legs if l["width"] == 4]
    t16 = [l["iters_per_sec"] for l in legs if l["width"] == 16]
    eff = (sum(t16)/2) / (sum(t4)/2) / 4
    print(json.dumps({"duration_per_leg_sec": DURATION, "legs": legs,
                      "sustained_null_efficiency_4_to_16": round(eff, 3)}))
