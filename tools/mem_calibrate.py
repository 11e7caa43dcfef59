# Memory-bandwidth scaling calibration for this sandbox (companion to
# cpu_calibrate.py). A Spark feature job is memory-traffic-heavy (parquet
# decode, shuffle, cache); on a REAL N-vs-4N cluster each executor brings
# its own DRAM channels, but in this single-box stand-in all threads share
# one memory controller. This measures how aggregate STREAM-triad-like
# bandwidth scales with process count: if 4->16 bandwidth scaling is << 4x,
# that is a hardware ceiling no job running here can exceed, and job
# scaling efficiency must be read against it.
import multiprocessing as mp, time, array

def triad(q):
    n = 4_000_000  # 3 arrays x 8B x 4M = 96 MB/proc >> LLC
    a = array.array('d', bytes(8 * n))
    b = array.array('d', [1.0]) * n
    c = array.array('d', [2.0]) * n
    t0 = time.time()
    passes = 0
    while time.time() - t0 < 6.0:
        # a = b + 3*c, vectorless python is compute-heavy; use memoryview
        # slice copies which run in C and stream memory
        a[:] = b
        b[:] = c
        c[:] = a
        passes += 1
    q.put(passes * 3 * 8 * n)  # bytes moved (read+write per slice copy ~2x; relative scaling is what matters)

if __name__ == "__main__":
    for rep in range(2):
        out = []
        for procs in (4, 8, 16, 32):
            q = mp.Queue()
            ps = [mp.Process(target=triad, args=(q,)) for _ in range(procs)]
            t0 = time.time()
            [p.start() for p in ps]; [p.join() for p in ps]
            total = sum(q.get() for _ in ps)
            out.append((procs, total / (time.time() - t0) / 1e9))
        base = dict(out)
        print(" ".join(f"{p}:{v:.1f}GB/s" for p, v in out),
              f"| 4->16 eff={base[16]/base[4]/4:.2f} 8->32 eff={base[32]/base[8]/4:.2f}")
