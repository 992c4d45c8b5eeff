"""Decompose the banded paged fetch cost at the ru dominant shape
(cap 1024, 10000 term rows, combined coords||pages tables).

gather_term_paged probes EVERY table covering the cap (base cumulative
+ each band), pads each probe to cap and selects by row validity —
that is ~4 row-gathers per term plus 4 concat+select passes over
[B, 2cap] streams (~1 GB elementwise traffic at this shape). Legs:

  full        the production fetch (vmapped gather_term_paged)
  raw-probes  the 4 row gathers alone at native widths (no pad, no
              select, no mask) — isolates gather latency from the
              combine cost
  one-band    one row gather from the widest band only (the lower
              bound if the band were known per term up front)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("DOCODO_BENCH_REPS", "25"))


def main() -> int:
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    plat = os.environ.get("DOCODO_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    import docodo_tpu
    from docodo_tpu.lang.vocab import Vocab, build_opencorpora_voc
    from docodo_tpu.ops import device_index as di

    print("devices:", jax.devices(), file=sys.stderr)
    tmp = tempfile.mkdtemp(prefix="rugp")
    build_opencorpora_voc(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "Dict", "ru",
            "dict.opcorpora.xml"), tmp + "/ru.voc")
    voc = Vocab(tmp + "/ru.voc")
    raw = open("/root/reference/Test/voyna-i-mir-tom-1.txt",
               encoding="cp1251", errors="replace").read()
    ind = docodo_tpu.Index(path=tmp, in_memory=True, vocs=[voc])
    from docodo_tpu.sources.base import IndexPagedTextFile, ListDataSource
    ind.add_data_source(
        ListDataSource("docs", [IndexPagedTextFile("vim", raw, "")]))
    ind.create()
    dix = di.DeviceIndex.from_index(ind)
    cap = 1024
    tabs = di._fetch_tables(dix.small, cap)
    print("tables:", [(st.w, st.band, st.tab.shape) for st in tabs],
          file=sys.stderr)

    # 10000 term rows with counts <= cap (like the dominant bucket's
    # two operands side by side)
    off_np = np.asarray(dix.term_offsets)
    counts = off_np[1:] - off_np[:-1]
    ok = np.where((counts > 0) & (counts <= cap))[0].astype(np.int32)
    rng = np.random.default_rng(11)
    terms = jnp.asarray(rng.choice(ok, 10_000).astype(np.int32))

    def time_fn(name, fn):
        @jax.jit
        def floop(s0):
            def body(_, s):
                return fn(terms + (s * 0).astype(jnp.int32)) * 1e-9 + s * 0
            return jax.lax.fori_loop(0, REPS, body, s0)

        warm = float(floop(jnp.float32(0)))
        t0 = time.perf_counter()
        final = float(floop(jnp.float32(0)))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        assert abs(final - warm) < 1e-3 * max(abs(final), 1.0)
        print(f"{name:28s} {dt:7.2f} ms", file=sys.stderr)
        return dt

    INF32 = np.int32(np.iinfo(np.int32).max)

    def full(tz):
        v, p, n = jax.vmap(lambda t: di.gather_term_paged(
            dix.coords, dix.page_of, dix.term_offsets, t, cap,
            dix.small))(tz)
        return (jnp.sum(jnp.where(v == INF32, 0, v).astype(jnp.float32))
                + jnp.sum(jnp.where(p == INF32, 0, p).astype(jnp.float32))
                + jnp.sum(n.astype(jnp.float32)))

    def raw_probes(tz):
        s = jnp.float32(0)
        for st in tabs:
            row = st.row_map[tz]
            g = st.tab[jnp.maximum(row, 0)]
            s = s + jnp.sum(
                jnp.where(row[:, None] >= 0, g, 0).astype(jnp.float32))
        return s

    def one_band(tz):
        st = tabs[-1]
        row = st.row_map[tz] % st.tab.shape[0]
        g = st.tab[jnp.maximum(row, 0)]
        return jnp.sum(g.astype(jnp.float32))

    time_fn("full gather_term_paged", full)
    time_fn("raw 4-band probes", raw_probes)
    time_fn("one widest-band gather", one_band)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
