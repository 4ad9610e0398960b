"""Concurrent-serving benchmark: N serving REPLICAS (one process each,
like real serving pods — no shared GIL) reading the SAME index artifacts
from shared storage, driven through a client-count sweep.

The reference's analogue is its multi-client TPS table (91.43 TPS at 16
clients on 138 M docs, benchmarks/datasets/msmarco-v2/results/.../
summary.md:63-70). Each replica warms its term cache on the fixed
64-query mix once (the reference's shared_buffers steady state), then
every sweep step dispatches queries-per-client searches to the first N
replicas concurrently and reports aggregate QPS and per-query p50/p95.

Usage: python tools/serve_concurrency.py [index_path]
       [--clients 1,2,4,8,16] [--queries-per-client 200]
Prints one JSON line; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_INDEX = "/tmp/pgts_mega_idx_reordered"


def query_mix() -> list[str]:
    """64 deterministic queries over the mega corpus vocabulary."""
    base = ["search index", "merge segments fast", "data point cluster",
            "machine learn model", "importantly trending", "query plan",
            "vector distance", "table scan", "join order", "hash bucket"]
    words = ["search", "index", "merge", "segment", "data", "point",
             "cluster", "machine", "learn", "model", "query", "plan",
             "vector", "distance", "table", "scan", "join", "order"]
    out = list(base)
    i = 0
    while len(out) < 64:
        a = words[i % len(words)]
        b = words[(i * 7 + 3) % len(words)]
        if a != b:
            out.append(f"{a} {b}")
        i += 1
    return out[:64]


def _replica_main(conn, index_path: str, queries: list[str], ci: int,
                  k: int) -> None:
    """One serving replica: open the artifacts, warm the term cache on
    the query mix, then serve 'run <n>' commands until 'stop'."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pg_textsearch_spark.index.serve import LocalSearcher
    srv = LocalSearcher(index_path)
    for q in queries:
        srv.search(q, k=k)
    conn.send("warm")
    while True:
        msg = conn.recv()
        if msg == "stop":
            return
        n = int(msg)
        lat = []
        for j in range(n):
            q = queries[(j * (ci + 3) + ci) % len(queries)]
            t0 = time.perf_counter()
            srv.search(q, k=k)
            lat.append(time.perf_counter() - t0)
        conn.send(lat)


def main() -> int:
    index_path = sys.argv[1] if len(sys.argv) > 1 and \
        not sys.argv[1].startswith("--") else DEFAULT_INDEX
    clients = [1, 2, 4, 8, 16]
    if "--clients" in sys.argv:
        clients = [int(c) for c in
                   sys.argv[sys.argv.index("--clients") + 1].split(",")]
    qpc = 200
    if "--queries-per-client" in sys.argv:
        qpc = int(sys.argv[sys.argv.index("--queries-per-client") + 1])
    qs = query_mix()

    ctx = mp.get_context("fork")
    procs, conns = [], []
    for ci in range(max(clients)):
        a, b = ctx.Pipe()
        p = ctx.Process(target=_replica_main,
                        args=(b, index_path, qs, ci, 10), daemon=True)
        p.start()
        procs.append(p)
        conns.append(a)
    for c in conns:
        assert c.recv() == "warm"

    import numpy as np
    out = {"index": index_path, "query_mix": len(qs),
           "queries_per_client": qpc, "sweep": []}
    for n in clients:
        t0 = time.perf_counter()
        for c in conns[:n]:
            c.send(qpc)
        lats = [c.recv() for c in conns[:n]]
        wall = time.perf_counter() - t0
        allq = np.sort(np.concatenate([np.asarray(x) for x in lats]))
        m = allq.size
        out["sweep"].append({
            "clients": n, "queries": int(m), "wall_sec": round(wall, 3),
            "qps": round(m / wall, 2),
            "p50_ms": round(float(allq[m // 2]) * 1e3, 3),
            "p95_ms": round(float(allq[int(m * 0.95)]) * 1e3, 3),
            "p99_ms": round(float(allq[int(m * 0.99)]) * 1e3, 3)})
    for c in conns:
        c.send("stop")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
