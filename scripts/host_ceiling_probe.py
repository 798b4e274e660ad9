import multiprocessing as mp, time, numpy as np, sys

def work(_):
    # mixed kernel: mid-size numpy (memory) + small-alloc python/numpy ops
    acc = 0.0
    rng = np.random.default_rng(0)
    a = rng.random(200_000)
    for i in range(300):
        b = a * 1.0000001 + 0.5
        acc += float(b[::97].sum())
        xs = [np.arange(50) * k for k in range(1, 6)]
        acc += sum(float(x.sum()) for x in xs)
    return acc

if __name__ == "__main__":
    for n in (1, 8, 32):
        t0 = time.time()
        with mp.Pool(n) as p:
            p.map(work, range(n * 4))  # 4 tasks per proc
        dt = time.time() - t0
        print(f"procs={n} tasks={n*4} wall={dt:.2f}s per-task={dt/(4):.3f}s")
