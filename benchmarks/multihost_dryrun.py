"""REAL multi-process validation of the multi-host DCN layout.

Spawns N_PROC actual processes, brings up jax.distributed (Gloo over
loopback — the same control/collective plane a CPU/GPU fleet uses, and
the same JAX API surface as a TPU pod), stages each process's OWNED
document shards only (parallel/distributed.stage_for_process), forms the
global arrays with jax.make_array_from_process_local_data, and runs the
2-D ("h" x "d") sharded build + query with the ICI-first top-k combine.
Every process must produce the identical replicated result.

    python benchmarks/multihost_dryrun.py            # parent: spawn + check
    python benchmarks/multihost_dryrun.py --proc i   # worker (internal)
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
LOCAL_DEVICES = 2


def _pick_port() -> int:
    # a free TCP port for the coordinator: fixed ports collide across
    # concurrent runs / leftover workers
    env = os.environ.get("DOCODO_MH_PORT")
    if env:
        return int(env)
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]

TEXTS = [
    "the pickwick club met at noon and the club adjourned for dinner",
    "mr pickwick spoke to the club about travels and adventures abroad",
    "travels through kent were recounted by the club members at length",
    "noon came and went while pickwick pondered the proposed club rules",
    "the lady smiled at the club members who wandered through the town",
    "dinner was served at noon and the members of the club were pleased",
    "kent roads carried the club carriage through villages and fields",
    "adventures abroad were rare but the club pondered them at dinner",
]


def worker(pid: int, port: int) -> int:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from docodo_tpu.parallel import distributed as dd

    dd.init_distributed(f"127.0.0.1:{port}", num_processes=N_PROC,
                        process_id=pid)
    assert jax.process_count() == N_PROC
    assert len(jax.local_devices()) == LOCAL_DEVICES
    mesh = dd.make_global_mesh()
    assert mesh.devices.shape == (N_PROC, LOCAL_DEVICES)

    # tokenize (identical metadata everywhere; a real fleet would read
    # only owned docs — simulated by dropping un-owned token arrays)
    from docodo_tpu.lang.tokenizer import tokenize

    term_to_id: dict = {}
    doc_tids, doc_coords, doc_pages = [], [], []
    for text in TEXTS:
        words, starts = tokenize(text)
        tid, cs = [], []
        for w, p in zip(words, starts):
            if not 3 <= len(w) <= 32:
                continue
            tid.append(term_to_id.setdefault(w, len(term_to_id)))
            cs.append(int(p))
        doc_tids.append(np.asarray(tid, dtype=np.int32))
        doc_coords.append(np.asarray(cs, dtype=np.int32))
        doc_pages.append([len(text)])

    S = N_PROC * LOCAL_DEVICES
    assign = dd.plan_document_assignment(
        [t.size for t in doc_tids], [p[-1] for p in doc_pages], S
    )
    own_docs = {
        i for s in range(pid * LOCAL_DEVICES, (pid + 1) * LOCAL_DEVICES)
        for i in assign[s]
    }
    nloc = max(sum(doc_tids[i].size for i in a) for a in assign) or 1
    ploc = max(sum(len(doc_pages[i]) for i in a) for a in assign) or 1
    local_tids = [t if i in own_docs else None
                  for i, t in enumerate(doc_tids)]
    local_coords = [c if i in own_docs else None
                    for i, c in enumerate(doc_coords)]
    rows = dd.stage_for_process(
        local_tids, local_coords, doc_pages, assign,
        N_PROC, LOCAL_DEVICES, pid, nloc=nloc, ploc=ploc,
        page_counts=[len(p) for p in doc_pages],
    )

    # global [H*D, ...] arrays from process-LOCAL rows — the real-fleet
    # staging path (assemble_global is the single-process stand-in)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh2 = NamedSharding(mesh, P(("h", "d"), None))
    sh1 = NamedSharding(mesh, P(("h", "d")))

    def globalize(local, spec):
        return jax.make_array_from_process_local_data(
            spec, local, (S,) + local.shape[1:]
        )

    g_tids = globalize(rows.term_ids, sh2)
    g_coords = globalize(rows.coords, sh2)
    g_bounds = globalize(rows.bounds, sh2)
    g_pdoc = globalize(rows.page_doc, sh2)
    g_pbase = globalize(rows.page_base, sh1)

    st, sc, off = dd.distributed_build(mesh, g_tids, g_coords,
                                       len(term_to_id))

    import jax.numpy as jnp

    qs = [
        [("pickwick", -12), ("club", -8)],
        [("club", 40), ("members", 40)],
        [("noon", 25)],
        [("travels", 30), ("kent", 30)],
    ]
    terms = np.full((4, 2), -1, dtype=np.int32)
    rs = np.ones((4, 2), dtype=np.int32)
    for i, q in enumerate(qs):
        for j, (w, r) in enumerate(q):
            terms[i, j] = term_to_id.get(w, -1)
            rs[i, j] = r
    pages, ranks, counts = dd.distributed_query(
        mesh, off, sc, g_bounds, g_pdoc, g_pbase,
        jnp.asarray(terms), jnp.asarray(rs), cap=16, topk=8,
    )
    pages = np.asarray(jax.device_get(pages))
    ranks = np.asarray(jax.device_get(ranks))
    assert (pages[0] >= 0).any(), "phrase query must hit across the fleet"
    checksum = float(ranks.sum())
    print(f"proc {pid}: devices={len(jax.devices())} "
          f"pages0={sorted(p for p in pages[0] if p >= 0)} "
          f"checksum={checksum:.4f}", flush=True)
    return 0


def main() -> int:
    if "--proc" in sys.argv:
        return worker(int(sys.argv[sys.argv.index("--proc") + 1]),
                      int(sys.argv[sys.argv.index("--port") + 1]))
    port = _pick_port()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--proc", str(i),
             "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO,
        )
        for i in range(N_PROC)
    ]
    outs = []
    ok = True
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()  # a hung worker must not outlive the run
            out, _ = p.communicate()
            ok = False
        outs.append(out)
        ok &= p.returncode == 0
    sums = set()
    for i, out in enumerate(outs):
        line = next((ln for ln in out.splitlines() if "checksum=" in ln), "")
        print(line or f"proc {i}: NO RESULT\n{out[-2000:]}")
        sums.add(line.split("checksum=")[-1] if line else f"missing{i}")
    if not ok or len(sums) != 1:
        print("MULTIHOST DRYRUN FAILED")
        return 1
    print(f"multihost dryrun OK: {N_PROC} processes x {LOCAL_DEVICES} "
          f"devices, identical replicated results")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
