import multiprocessing as mp, time
def burn(q):
    t0 = time.time(); n = 0
    x = 1.0
    while time.time() - t0 < 6.0:
        for _ in range(100000): x = x * 1.0000001 + 0.5
        n += 100000
    q.put(n)
for rep in range(2):
    out = []
    for procs in (4, 8, 16, 32):
        q = mp.Queue()
        ps = [mp.Process(target=burn, args=(q,)) for _ in range(procs)]
        t0 = time.time()
        [p.start() for p in ps]; [p.join() for p in ps]
        total = sum(q.get() for _ in ps)
        out.append((procs, total/(time.time()-t0)/1e6))
    base = dict(out)
    print(" ".join(f"{p}:{v:.0f}M" for p,v in out),
          f"| 4->16 eff={base[16]/base[4]/4:.2f} 8->32 eff={base[32]/base[8]/4:.2f}")
