"""15-bit varint delta codec for posting coordinate lists.

Wire format identical to the reference posting storage (ref:
Docodo.NET/IndexSequence.cs:13-16, 63-84): an ascending u64 coordinate list
is delta-coded; each delta is split into little-endian 15-bit chunks stored
in u16 words, MSB set = continuation (more chunks follow for this delta).

Cost: 2 bytes per coordinate for deltas < 2^15, which sets the "equal index
memory" bar. The reference encodes/decodes element-at-a-time inside an
enumerator; here encode/decode are vectorized NumPy passes (and the decode
has a device-side twin in ops/ for HBM-resident compressed postings).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

BITS = 15
OVERFLOW = np.uint16(1 << BITS)     # continuation flag
MASK = np.uint16(OVERFLOW - 1)      # 15-bit payload mask
DATA_UNIT_SIZE = 2                  # bytes per stored u16

_native = None
_native_tried = False


def _lib():
    """The native C codec, if available: the index save/merge paths call
    encode/decode once per TERM, and on typical posting lists (tens of
    coords) the NumPy passes are pure per-call overhead (~50 us vs ~2 us
    for the C round trip)."""
    global _native, _native_tried
    if not _native_tried:
        _native_tried = True
        try:
            from docodo_tpu.native import get_lib

            _native = get_lib()
        except Exception:  # noqa: BLE001 — fall back to NumPy
            _native = None
    return _native


def chunks_per_delta(deltas: np.ndarray) -> np.ndarray:
    """Number of u16 chunks each delta occupies: max(1, ceil(bitlen/15))."""
    deltas = deltas.astype(np.uint64, copy=False)
    n = np.ones(deltas.shape, dtype=np.int64)
    for j in (15, 30, 45, 60):
        n += deltas >= (np.uint64(1) << np.uint64(j))
    return n


def encode(coords: np.ndarray) -> np.ndarray:
    """Encode ascending uint64 coords into the u16 varint stream."""
    coords = np.asarray(coords, dtype=np.uint64)
    if coords.size == 0:
        return np.zeros(0, dtype=np.uint16)
    lib = _lib()
    if lib is not None:
        coords = np.ascontiguousarray(coords)
        out = np.empty(coords.size * 5, dtype=np.uint16)  # <=5 chunks/u64
        # raw pointer ints: data_as() costs ~5 us/call in marshaling
        w = lib.docodo_varint_encode(
            coords.ctypes.data, coords.size, out.ctypes.data
        )
        return out[:w].copy()
    deltas = np.empty_like(coords)
    deltas[0] = coords[0]
    np.subtract(coords[1:], coords[:-1], out=deltas[1:])
    # fast path: every delta fits one chunk (the overwhelmingly common case)
    if deltas.max() <= np.uint64(MASK):
        return deltas.astype(np.uint16)
    nchunks = chunks_per_delta(deltas)
    total = int(nchunks.sum())
    out = np.zeros(total, dtype=np.uint16)
    starts = np.cumsum(nchunks) - nchunks
    # first chunk of every delta, scattered in one pass
    word0 = (deltas & np.uint64(MASK)).astype(np.uint16)
    word0[nchunks > 1] |= OVERFLOW
    out[starts] = word0
    # continuation chunks (rare): narrow to multi-chunk deltas only
    max_chunks = int(nchunks.max())
    for j in range(1, max_chunks):
        idx = np.flatnonzero(nchunks > j)
        payload = (deltas[idx] >> np.uint64(j * BITS)) & np.uint64(MASK)
        word = payload.astype(np.uint16)
        word[j < nchunks[idx] - 1] |= OVERFLOW
        out[starts[idx] + j] = word
    return out


def _encode_deltas(deltas: np.ndarray,
                   nchunks: Optional[np.ndarray] = None) -> np.ndarray:
    """Vectorized delta-array -> u16 varint stream (the chunked body of
    `encode`, shared by the whole-file block encoder). `nchunks` lets a
    caller that already computed chunks_per_delta skip the recompute."""
    if deltas.size == 0:
        return np.zeros(0, dtype=np.uint16)
    if nchunks is None:
        if deltas.max() <= np.uint64(MASK):
            return deltas.astype(np.uint16)
        nchunks = chunks_per_delta(deltas)
    total = int(nchunks.sum())
    out = np.zeros(total, dtype=np.uint16)
    starts = np.cumsum(nchunks) - nchunks
    word0 = (deltas & np.uint64(MASK)).astype(np.uint16)
    word0[nchunks > 1] |= OVERFLOW
    out[starts] = word0
    max_chunks = int(nchunks.max())
    for j in range(1, max_chunks):
        idx = np.flatnonzero(nchunks > j)
        payload = (deltas[idx] >> np.uint64(j * BITS)) & np.uint64(MASK)
        word = payload.astype(np.uint16)
        word[j < nchunks[idx] - 1] |= OVERFLOW
        out[starts[idx] + j] = word
    return out


def encode_blocks(coords: np.ndarray, offsets: np.ndarray):
    """Encode MANY posting blocks in one vectorized pass.

    coords: all blocks' ascending coords concatenated; offsets[i]:
    offsets[i+1] delimit block i. Each block's first delta is its first
    coordinate (deltas restart per block, matching per-block `encode`).

    Returns (stream u16, word_starts int64[B+1]) — block i's u16 words
    are stream[word_starts[i]: word_starts[i+1]]. Replaces the per-term
    write_block loop (one Python call per term) that dominated the
    facade build's save/merge phases.
    """
    coords = np.asarray(coords, dtype=np.uint64)
    offsets = np.asarray(offsets, dtype=np.int64)
    if coords.size == 0:
        return (np.zeros(0, dtype=np.uint16),
                np.zeros(offsets.size, dtype=np.int64))
    lib = _lib()
    if lib is not None:
        coords = np.ascontiguousarray(coords)
        offsets = np.ascontiguousarray(offsets)
        out = np.empty(coords.size * 5, dtype=np.uint16)  # <=5 chunks/u64
        wstarts = np.empty(offsets.size, dtype=np.int64)
        w = lib.docodo_varint_encode_blocks(
            coords.ctypes.data, offsets.ctypes.data, offsets.size - 1,
            out.ctypes.data, wstarts.ctypes.data,
        )
        return out[:w].copy(), wstarts
    deltas = np.empty_like(coords)
    deltas[0] = coords[0]
    np.subtract(coords[1:], coords[:-1], out=deltas[1:])
    starts = offsets[:-1][offsets[:-1] < offsets[1:]]
    deltas[starts] = coords[starts]  # per-block reset to absolute
    if deltas.max() <= np.uint64(MASK):
        # ubiquitous fast path: 1 chunk per delta, spans = offsets
        return deltas.astype(np.uint16), offsets.copy()
    nchunks = chunks_per_delta(deltas)
    cum = np.concatenate([[0], np.cumsum(nchunks)])
    return _encode_deltas(deltas, nchunks), cum[offsets]


def decode_deltas(stream: np.ndarray) -> np.ndarray:
    """Decode a u16 varint stream into raw deltas (no prefix sum)."""
    stream = np.asarray(stream, dtype=np.uint16)
    if stream.size == 0:
        return np.zeros(0, dtype=np.uint64)
    cont = (stream & OVERFLOW) != 0
    if not cont.any():
        return stream.astype(np.uint64)
    starts = np.empty(stream.shape, dtype=bool)
    starts[0] = True
    np.logical_not(cont[:-1], out=starts[1:])
    start_idx = np.flatnonzero(starts)
    glen = np.diff(np.append(start_idx, stream.size))
    payload = (stream & MASK).astype(np.uint64)
    deltas = payload[start_idx]
    for j in range(1, int(glen.max())):
        sel = glen > j
        deltas[sel] |= payload[start_idx[sel] + j] << np.uint64(j * BITS)
    return deltas


def decode(stream: np.ndarray) -> np.ndarray:
    """Decode a u16 varint stream back into ascending uint64 coords."""
    stream = np.asarray(stream, dtype=np.uint16)
    if stream.size == 0:
        return np.zeros(0, dtype=np.uint64)
    lib = _lib()
    if lib is not None:
        stream = np.ascontiguousarray(stream)
        out = np.empty(stream.size, dtype=np.uint64)  # >=1 word/coord
        n = lib.docodo_varint_decode(
            stream.ctypes.data, stream.size, out.ctypes.data
        )
        return out[:n].copy()
    cont = (stream & OVERFLOW) != 0
    if not cont.any():
        return np.cumsum(stream, dtype=np.uint64)
    # a chunk starts a new delta iff it is the first or the previous chunk
    # was final (continuation flag clear)
    starts = np.empty(stream.shape, dtype=bool)
    starts[0] = True
    np.logical_not(cont[:-1], out=starts[1:])
    start_idx = np.flatnonzero(starts)
    glen = np.diff(np.append(start_idx, stream.size))
    payload = (stream & MASK).astype(np.uint64)
    deltas = payload[start_idx]
    max_len = int(glen.max())
    for j in range(1, max_len):
        sel = glen > j
        deltas[sel] |= payload[start_idx[sel] + j] << np.uint64(j * BITS)
    return np.cumsum(deltas, dtype=np.uint64)


def encoded_len(coords: np.ndarray) -> int:
    """Number of u16 words `encode` would produce (used as the popularity
    proxy in suggestions ordering, matching the reference's `.Count`)."""
    coords = np.asarray(coords, dtype=np.uint64)
    if coords.size == 0:
        return 0
    lib = _lib()
    if lib is not None:
        coords = np.ascontiguousarray(coords)
        return int(lib.docodo_varint_encode(
            coords.ctypes.data, coords.size, None
        ))
    deltas = np.empty_like(coords)
    deltas[0] = coords[0]
    np.subtract(coords[1:], coords[:-1], out=deltas[1:])
    return int(chunks_per_delta(deltas).sum())


def write_block(f, coords: np.ndarray) -> None:
    """Write a posting block: i32 count of u16 words, then the raw words.
    Layout matches the reference block framing (ref IndexSequence.cs:167-173)."""
    enc = encode(coords)
    f.write(np.int32(enc.size).tobytes())
    f.write(enc.tobytes())


def read_block(f) -> np.ndarray:
    """Read one posting block written by `write_block`."""
    raw = f.read(4)
    if len(raw) < 4:
        raise EOFError
    n = int(np.frombuffer(raw, dtype=np.int32)[0])
    data = f.read(2 * n)
    return decode(np.frombuffer(data, dtype=np.uint16))
