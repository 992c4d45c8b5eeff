"""Tokenizer ceiling decomposition (VERDICT r4 weak #4): the 1 GB build
is pinned at ~38-40 MB/s by the single-threaded host tokenize — but
"tokenize" as measured is a CHAIN: Python str -> .encode("utf-16-le")
-> C one-pass tokenize+intern+pack -> output .copy(). This probe times
each link in isolation on a synthetic corpus so the ceiling has an
owner: either the C scan loop has headroom (then SIMD/branch-reduction
is the next lever) or the Python-side encode/copy dominates (then the
lever is feeding the C pass raw bytes).

    python benchmarks/probe_tokenize.py [--mb 64]
"""

from __future__ import annotations

import argparse
import ctypes
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from benchmarks.scale_build import synth_corpus
    from docodo_tpu.native import pipeline as npipe
    from docodo_tpu.native.pipeline import _tables

    lib = npipe.get_lib()
    assert lib is not None, "native lib required for the ceiling probe"

    text = synth_corpus(args.mb)
    mb = len(text) / 1e6
    log(f"corpus: {mb:.0f} MB (str)")
    results = {}

    def timed(name, fn, reps=args.reps):
        best, out = None, None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = best
        log(f"  {name:28s} {best:7.3f}s  ({mb/best:7.1f} MB/s)")
        return out

    # link 1: Python str -> UTF-16 bytes (CPython's C encoder)
    raw16 = timed("encode utf-16-le", lambda: text.encode("utf-16-le"))
    units = np.frombuffer(raw16, dtype="<u2")
    n = units.size

    # link 2: the C one-pass tokenize+intern+pack alone (GIL released),
    # fresh interner per rep so intern cost is the realistic mixed
    # hit/miss profile of a growing vocabulary
    fold, cls = _tables()
    cap = n // 3 + n // 4095 + 2
    out = np.empty(cap, dtype=np.uint32)

    def c_pass():
        intr = npipe.NativeInterner()
        cnt = lib.docodo_tokenize_intern_packed(
            intr._ptr,
            units.ctypes.data_as(ctypes.c_void_p), n,
            fold.ctypes.data_as(ctypes.c_void_p),
            cls.ctypes.data_as(ctypes.c_void_p),
            3, 32,
            out.ctypes.data_as(ctypes.c_void_p), cap,
        )
        intr.close()
        return cnt

    cnt = timed("C tokenize+intern+pack", c_pass)
    log(f"  tokens: {cnt}")

    # link 2b: tokenize WITHOUT interning (the scan loop's own ceiling)
    st = np.empty(cap, dtype=np.int32)
    ln = np.empty(cap, dtype=np.int32)

    def c_scan():
        return lib.docodo_tokenize(
            units.ctypes.data_as(ctypes.c_void_p), n,
            cls.ctypes.data_as(ctypes.c_void_p), 3, 32,
            st.ctypes.data_as(ctypes.c_void_p),
            ln.ctypes.data_as(ctypes.c_void_p), cap,
        )

    timed("C scan only (no intern)", c_scan)

    # link 3: the output copy the wrapper pays
    timed("out[:cnt].copy()", lambda: out[:cnt].copy())

    # the full production path for reference
    def full():
        intr = npipe.make_interner()
        p = npipe.tokenize_intern_packed(text, intr)
        intr.close()
        return p

    timed("full producer path", full)

    total_links = (results["encode utf-16-le"]
                   + results["C tokenize+intern+pack"]
                   + results["out[:cnt].copy()"])
    log(f"links sum {total_links:.3f}s vs full path "
        f"{results['full producer path']:.3f}s")
    import json

    print(json.dumps({
        k: {"s": round(v, 3), "mb_s": round(mb / v, 1)}
        for k, v in results.items()
    }, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
