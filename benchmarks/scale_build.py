"""Sharded index-build throughput benchmark (BASELINE.md config:
"1 GB Wikipedia dump sharded build" — no dump ships with this image, so
the corpus is synthetic Zipf-distributed text of the requested size).

Measures the full pipeline: native tokenize+intern -> shard staging ->
per-device sort-build over the mesh. Usage:

    python benchmarks/scale_build.py [--mb 64] [--shards 8] [--platform cpu]

Throughput is reported end-to-end and per stage; peak host RSS is
printed to show the streaming properties.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_corpus(mb: int, seed: int = 0) -> str:
    """Zipf-ish word stream, ~`mb` megabytes of text."""
    rng = np.random.default_rng(seed)
    vocab_size = 200_000
    # word lengths 3..12, deterministic per id
    words = np.array(
        ["w" + np.base_repr(i * 2654435761 % (36 ** 8), 36).lower()
         for i in range(vocab_size)],
        dtype=object,
    )
    target = mb * 1_000_000
    out = []
    size = 0
    block = 2_000_000
    while size < target:
        ids = (rng.zipf(1.3, size=block) - 1) % vocab_size
        chunk = " ".join(words[ids])
        out.append(chunk)
        size += len(chunk) + 1
    return " ".join(out)[:target]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=64)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--platform", default=os.environ.get("DOCODO_BENCH_PLATFORM"))
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--tok-workers", type=int, default=0,
                    help="tokenizer threads (0 = one per core)")
    ap.add_argument("--no-overlap", action="store_true",
                    help="disable the tokenize/device pipeline overlap "
                         "(single-chip path)")
    ap.add_argument("--prefetch-h2d", action="store_true",
                    help="stage the H2D transfer of chunk i+1 from the "
                         "producer thread (double-buffered through the "
                         "queue) instead of on the dispatch thread — "
                         "the r4 overlap experiment")
    ap.add_argument("--json-out", default=None,
                    help="also write the BENCH-style JSON line to a file "
                         "(the committed BUILD_r*.json artifact)")
    args = ap.parse_args()

    def emit(mb, total_s, device_s, tok_s):
        line = json.dumps({
            "metric": "build_mb_s",
            "value": round(mb / total_s, 2),
            "unit": "MB/s",
            "detail": {
                "corpus_mb": round(mb, 1),
                "end_to_end_s": round(total_s, 2),
                "device_only_mb_s": (
                    round(mb / device_s, 2) if device_s else None
                ),
                "tokenize_mb_s": round(mb / tok_s, 2) if tok_s else None,
            },
        })
        print(line)
        if args.json_out:
            with open(args.json_out, "w") as f:
                f.write(line + "\n")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{args.shards}"
            ).strip()
    devices = jax.devices()
    print(f"devices: {len(devices)} x {devices[0].platform}", file=sys.stderr)
    n_shards = min(args.shards, len(devices)) if len(devices) > 1 else 1

    t0 = time.perf_counter()
    text = synth_corpus(args.mb)
    mb = len(text) / 1e6
    t_synth = time.perf_counter() - t0
    print(f"corpus: {mb:.0f} MB synthesized in {t_synth:.1f}s", file=sys.stderr)

    from docodo_tpu.native import pipeline as npipe

    # ---- device build --------------------------------------------------
    import jax.numpy as jnp

    from docodo_tpu.ops.device_index import (
        PACK_PAD_ROW,
        PACK_SENTINEL,
        build_postings,
        build_postings_packed,
        split_packed,
    )
    from docodo_tpu.ops.seqops import INF32

    slice_chars = 8_000_000
    parts = [text[off: off + slice_chars]
             for off in range(0, len(text), slice_chars)]
    doc_pages = [[len(p)] for p in parts]

    if n_shards == 1 and not args.no_overlap:
        # ---- pipelined single chip: tokenize slice i+1 on a producer
        # thread (the native call releases the GIL) WHILE the device
        # sorts slice i — end-to-end ~= max(host, device), not the sum.
        # Every chunk pads to ONE static shape (a compile per shape is
        # minutes over a TPU tunnel); executions are chained through a
        # zero scalar so one closing readback bounds the wall time.
        import queue as _queue
        import threading

        interner = npipe.make_interner()
        # warm compile at a cap sized from slice 0 (synchronous).
        # Tokens ship PACKED (one uint32 per token: 12-bit coord delta |
        # 20-bit term id, device_index.pack_tokens) — host->device
        # transfer is the pipelined build's bound over a remote device
        # link, and packing halves its bytes.
        t_first0 = time.perf_counter()
        packed0 = npipe.tokenize_intern_packed(parts[0], interner)
        n_tok0 = int(np.count_nonzero(
            (packed0 & np.uint32(PACK_SENTINEL)) != PACK_SENTINEL
        ))
        first_tok = time.perf_counter() - t_first0
        cap = 1
        while cap < packed0.size * 5 // 4:
            cap <<= 1

        def pad(packed):
            pt = np.full(cap, PACK_PAD_ROW, dtype=np.uint32)
            pt[: packed.size] = packed
            return jnp.asarray(pt)

        def n_tokens(packed) -> int:
            return int(np.count_nonzero(
                (packed & np.uint32(PACK_SENTINEL)) != PACK_SENTINEL
            ))

        # estimate T up front: term count stabilizes fast under Zipf; a
        # fixed T keeps the build shape static. Interning is global
        # and monotonic, so pad T generously and assert at the end.
        T = max(2 * len(interner), 1 << 18)
        build = jax.jit(build_postings_packed,
                        static_argnames=("num_terms",))
        pt0 = pad(packed0)
        st, sc, off = build(pt0, num_terms=T)
        assert int(off[T]) == n_tok0  # warm + force compile

        q: "_queue.Queue" = _queue.Queue(maxsize=4)
        tok_busy = [first_tok]

        prefetch = args.prefetch_h2d

        def producer():
            for p in parts[1:]:
                t1 = time.perf_counter()
                packed = npipe.tokenize_intern_packed(p, interner)
                packed_parts = split_packed(packed, cap)
                tok_busy.append(time.perf_counter() - t1)
                for pp in packed_parts:
                    if prefetch:
                        # stage + enqueue the async H2D HERE: the
                        # transfer rides the link while the dispatch
                        # thread feeds the device sorts (the r4
                        # double-buffer experiment; queue depth 4
                        # bounds in-flight device buffers)
                        q.put((pad(pp), n_tokens(pp)))
                    else:
                        q.put(pp)
            q.put(None)

        t0 = time.perf_counter()
        th = threading.Thread(target=producer, daemon=True)
        th.start()
        chain = jnp.uint32(0)
        tot = last_nreal = n_tok0
        st, sc, off = build(pt0 + chain, num_terms=T)
        chain = (off[T] * 0).astype(jnp.uint32)
        n_chunks = 1
        while True:
            item = q.get()
            if item is None:
                break
            if prefetch:
                pt, nreal = item
            else:
                pt, nreal = pad(item), n_tokens(item)
            st, sc, off = build(pt + chain, num_terms=T)
            chain = (off[T] * 0).astype(jnp.uint32)
            tot += nreal
            last_nreal = nreal
            n_chunks += 1
        last = int(off[T])  # single closing readback drains the chain
        th.join()
        t_build = time.perf_counter() - t0
        assert last == last_nreal and len(interner) <= T
        t_tok = sum(tok_busy)
        terms_n = len(interner)
        interner.close()
        total = first_tok + t_build
        host_frac = (t_tok - first_tok) / t_build if t_build else 0.0
        print(
            f"pipelined build: first-slice tokenize {first_tok:.1f}s + "
            f"overlapped {t_build:.1f}s ({n_chunks} chunks, {tot} "
            f"postings, {terms_n} terms); host busy "
            f"{100 * host_frac:.0f}% of the device phase, tokenize "
            f"alone would be {t_tok:.1f}s ({mb / t_tok:.1f} MB/s)",
            file=sys.stderr,
        )
        rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        print(f"peak host RSS: {rss_mb:.0f} MB", file=sys.stderr)
        print(f"END-TO-END: {mb:.0f} MB in {total:.1f}s = "
              f"{mb / total:.1f} MB/s", file=sys.stderr)
        emit(mb, total, t_build, t_tok)
        return 0

    t0 = time.perf_counter()
    # parallel threads — the native call releases the GIL, so
    # tokenize+intern scales on cores
    tid_rows, coord_rows, terms = npipe.parallel_tokenize_intern(
        parts, workers=args.tok_workers
    )
    t_tok = time.perf_counter() - t0
    T = len(terms)
    n_tokens = sum(r.size for r in tid_rows)
    print(f"tokenize+intern: {t_tok:.1f}s -> {mb / t_tok:.1f} MB/s host, "
          f"{n_tokens} postings, {T} terms", file=sys.stderr)

    if n_shards > 1:
        from docodo_tpu.parallel import sharding as sh

        t0 = time.perf_counter()
        corpus = sh.stage_shards_arrays(
            tid_rows, coord_rows, doc_pages, num_shards=n_shards
        )
        t_stage = time.perf_counter() - t0
        mesh = sh.make_mesh(n_shards)
        dt, dc = jnp.asarray(corpus.term_ids), jnp.asarray(corpus.coords)
        st, sc, off = sh.sharded_build(mesh, dt, dc, T)  # compile + warm
        n_built = int(np.asarray(off[:, -1]).sum())
        t0 = time.perf_counter()
        st, sc, off = sh.sharded_build(mesh, dt, dc, T)
        n_built2 = int(np.asarray(off[:, -1]).sum())  # readback closes exec
        t_build = time.perf_counter() - t0
        assert n_built == n_built2
        print(f"stage: {t_stage:.1f}s; sharded build ({n_shards} dev, warm): "
              f"{t_build:.2f}s -> {mb / t_build:.1f} MB/s "
              f"({n_built} postings)", file=sys.stderr)
    else:
        # single chip: every chunk padded to ONE static shape (a compile
        # per shape is minutes over a TPU tunnel), executions chained,
        # a single closing readback
        cap = 1
        while cap < max(r.size for r in tid_rows):
            cap <<= 1
        padded = []
        for ids, starts, pages in zip(tid_rows, coord_rows, doc_pages):
            pt = np.full(cap, int(INF32), dtype=np.int32)
            pc = np.full(cap, int(INF32), dtype=np.int32)
            pt[: ids.size] = ids
            pc[: ids.size] = starts
            padded.append((jnp.asarray(pt), jnp.asarray(pc), ids.size))
        st, sc, off = build_postings(padded[0][0], padded[0][1], T)
        assert int(off[T]) == padded[0][2]  # warm + force compile
        t0 = time.perf_counter()
        chain = jnp.int32(0)
        tot = 0
        for pt, pc, nreal in padded:
            st, sc, off = build_postings(pt + chain, pc, T)
            chain = (off[T] * 0).astype(jnp.int32)
            tot += nreal
        assert int(off[T]) == padded[-1][2]  # closes the chain
        t_build = time.perf_counter() - t0
        print(f"single-chip chunked build: {t_build:.2f}s -> "
              f"{mb / t_build:.1f} MB/s ({tot} postings)", file=sys.stderr)

    # ---- sharded query phase (replicated batch, all_gather top-k) ------
    if n_shards > 1 and args.queries:
        counts = np.zeros(T, dtype=np.int64)
        for ids in tid_rows:
            counts += np.bincount(ids, minlength=T)
        eligible = np.flatnonzero((counts >= 4) & (counts <= 512))
        rng = np.random.default_rng(3)
        qterms = rng.choice(eligible, size=(args.queries, 2)).astype(np.int32)
        qterms[::2, 1] = -1  # half single-word (guaranteed hits)
        qrs = np.full((args.queries, 2), 300, dtype=np.int32)
        t0 = time.perf_counter()
        pages, ranks, cnts = sh.sharded_query(
            mesh, off, sc, jnp.asarray(corpus.bounds),
            jnp.asarray(corpus.page_doc), jnp.asarray(corpus.page_base),
            jnp.asarray(qterms), jnp.asarray(qrs), cap=512, topk=8,
        )
        nhit = int((np.asarray(pages) >= 0).sum())
        t_q = time.perf_counter() - t0
        print(f"sharded query ({n_shards} dev, incl. compile): "
              f"{args.queries} queries in {t_q:.1f}s, {nhit} page hits",
              file=sys.stderr)

    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    total = t_tok + t_build + (t_stage if n_shards > 1 else 0.0)
    print(f"peak host RSS: {rss_mb:.0f} MB", file=sys.stderr)
    print(f"END-TO-END: {mb:.0f} MB in {total:.1f}s = {mb / total:.1f} MB/s",
          file=sys.stderr)
    emit(mb, total, t_build, t_tok)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
