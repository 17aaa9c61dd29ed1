"""Gorilla-style time-series chunk compression as Arrow-vectorized UDFs.

Per the north rule: delta-of-delta timestamps + XOR float values stored
as one ``binary`` chunk column per (conv_id, bucket) partition, with
encode/decode running as pandas/Arrow batch UDFs — **no per-point
Python**. Inside a chunk every per-point operation is a numpy kernel
(diff/cumsum for timestamps, ``bitwise_xor.accumulate`` for the XOR
prefix scan, ``packbits/unpackbits`` for the bitstream).

Codec layout (``GORB`` v1): Facebook Gorilla's per-value variable-length
control codes (Pelkonen et al., VLDB 2015) make *decoding* inherently
sequential, which would force a per-point Python loop here. Instead the
two Gorilla streams are packed in fixed-width **blocks of 128 values**
(the miniblock idea parquet's DELTA_BINARY_PACKED uses): each block
stores one width byte = bits needed by its widest value, then the
values' low ``width`` bits back-to-back. Smooth series still compress
to a few bits/point (all-equal timestamps deltas -> dod==0 -> width 0
-> the whole block costs 1 byte) and both directions are vectorizable.

Chunk binary format (little-endian):

    magic   4s  = b"GORB"
    version u8  = 1
    n       u32 points
    first_ts i64 micros
    first_val u64 (raw IEEE bits; NaN-safe)
    [ts stream]   first_delta i64, then block-packed zigzag(dod[2:])
    [val stream]  block-packed xor(v[i], v[i-1]) for i >= 1
    each stream:  u32 count, u16 n_blocks, widths u8[n_blocks],
                  u32 payload_len, payload
"""

from __future__ import annotations

import datetime as dt
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .timeutils import micros

from ..plans.rollup import bucket_expr

MAGIC = b"GORB"
VERSION = 1
BLOCK = 128

# ---------------------------------------------------------------- bits


def _bit_width(vals: np.ndarray) -> int:
    """Bits needed for the widest value in a uint64 array."""
    if len(vals) == 0:
        return 0
    m = int(vals.max())
    return m.bit_length()


def _pack_bits(vals: np.ndarray, width: int) -> bytes:
    """Concatenate the low ``width`` bits of each uint64, MSB-first."""
    if width == 0 or len(vals) == 0:
        return b""
    be = vals.astype(">u8").reshape(-1, 1).view(np.uint8)
    bits = np.unpackbits(be, axis=1)[:, 64 - width:]
    return np.packbits(bits.ravel()).tobytes()


def _unpack_bits(data: bytes, n: int, width: int) -> np.ndarray:
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), count=n * width).reshape(n, width)
    # left-pad each row to 64 bits and repack to big-endian uint64 — a
    # CONSTANT number of numpy dispatches. (The old per-bit shift-or
    # loop was up to 64 dispatches; on the tiny 2-3-point chunks a
    # (conv, day) tier produces it cost ~180us per chunk and was 80% of
    # the whole decode wall — measured r6, tools/gorilla_split.json.)
    padded = np.zeros((n, 64), dtype=np.uint8)
    padded[:, 64 - width:] = bits
    return np.packbits(padded, axis=1).view(">u8").ravel().astype(np.uint64)


def _zigzag(v: np.ndarray) -> np.ndarray:
    s = v.astype(np.int64)
    return ((s << np.int64(1)) ^ (s >> np.int64(63))).astype(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)) ^ (-(u & np.uint64(1))).astype(np.uint64)).astype(np.int64)


# ------------------------------------------------------------- streams


def _encode_stream(vals: np.ndarray) -> bytes:
    """Block-packed uint64 stream."""
    n = len(vals)
    n_blocks = (n + BLOCK - 1) // BLOCK
    widths = np.zeros(n_blocks, dtype=np.uint8)
    payloads: list[bytes] = []
    for b in range(n_blocks):  # per-block loop (n/128), kernels inside
        blk = vals[b * BLOCK : (b + 1) * BLOCK]
        w = _bit_width(blk)
        widths[b] = w
        payloads.append(_pack_bits(blk, w))
    payload = b"".join(payloads)
    return (
        struct.pack("<IH", n, n_blocks)
        + widths.tobytes()
        + struct.pack("<I", len(payload))
        + payload
    )


def _decode_stream(buf: bytes, offset: int) -> tuple[np.ndarray, int]:
    n, n_blocks = struct.unpack_from("<IH", buf, offset)
    offset += 6
    widths = np.frombuffer(buf, dtype=np.uint8, count=n_blocks, offset=offset)
    offset += n_blocks
    (payload_len,) = struct.unpack_from("<I", buf, offset)
    offset += 4
    out = np.zeros(n, dtype=np.uint64)
    pos = offset
    for b in range(n_blocks):
        w = int(widths[b])
        cnt = min(BLOCK, n - b * BLOCK)
        nbytes = (cnt * w + 7) // 8
        out[b * BLOCK : b * BLOCK + cnt] = _unpack_bits(buf[pos : pos + nbytes], cnt, w)
        pos += nbytes
    assert pos - offset == payload_len
    return out, pos


# -------------------------------------------------------------- codec


def encode_series(ts_micros: np.ndarray, values: np.ndarray) -> bytes:
    """Encode one chunk. ``ts_micros`` must be sorted non-decreasing."""
    n = len(ts_micros)
    if n == 0:
        return struct.pack("<4sBIqQ", MAGIC, VERSION, 0, 0, 0)
    ts = ts_micros.astype(np.int64)
    vals = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    head = struct.pack("<4sBIqQ", MAGIC, VERSION, n, int(ts[0]), int(vals[0]))
    if n == 1:
        return head
    deltas = np.diff(ts)
    dod = np.diff(deltas) if n > 2 else np.zeros(0, dtype=np.int64)
    ts_stream = struct.pack("<q", int(deltas[0])) + _encode_stream(_zigzag(dod))
    xor = vals[1:] ^ vals[:-1]
    val_stream = _encode_stream(xor)
    return head + ts_stream + val_stream


def _skip_stream(buf: bytes, offset: int) -> int:
    """Advance past one block-packed stream WITHOUT unpacking it — the
    header carries n_blocks and payload_len, so skipping is O(1)."""
    _n, n_blocks = struct.unpack_from("<IH", buf, offset)
    offset += 6 + n_blocks
    (payload_len,) = struct.unpack_from("<I", buf, offset)
    return offset + 4 + payload_len


def decode_series(
    buf: bytes, need_ts: bool = True, need_values: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Decode a chunk. ``need_ts``/``need_values`` enable column-pruned
    decoding: an unneeded stream is SKIPPED via its header (O(1)), not
    unpacked — the codec-level counterpart of parquet column pruning
    (a value-only read never pays the delta-of-delta cumsums; a
    timestamp-only read never pays the XOR prefix scan). A skipped
    side returns an empty array."""
    magic, version, n, first_ts, first_val = struct.unpack_from("<4sBIqQ", buf, 0)
    if magic != MAGIC or version != VERSION:
        raise ValueError("not a GORB v1 chunk")
    empty_ts = np.zeros(0, dtype=np.int64)
    empty_vals = np.zeros(0, dtype=np.float64)
    if n == 0:
        return empty_ts, empty_vals
    offset = struct.calcsize("<4sBIqQ")
    if n == 1:
        return (
            np.array([first_ts], dtype=np.int64) if need_ts else empty_ts,
            np.array([first_val], dtype=np.uint64).view(np.float64)
            if need_values
            else empty_vals,
        )
    (first_delta,) = struct.unpack_from("<q", buf, offset)
    offset += 8
    if need_ts:
        dod_z, offset = _decode_stream(buf, offset)
        dod = _unzigzag(dod_z)
        deltas = (
            np.concatenate(([first_delta], first_delta + np.cumsum(dod)))
            if n > 2
            else np.array([first_delta], dtype=np.int64)
        )
        ts = (first_ts + np.concatenate(([0], np.cumsum(deltas)))).astype(np.int64)
    else:
        offset = _skip_stream(buf, offset)
        ts = empty_ts
    if need_values:
        xor, _ = _decode_stream(buf, offset)
        val_bits = np.concatenate(([np.uint64(first_val)], xor.astype(np.uint64)))
        vals = np.bitwise_xor.accumulate(val_bits).view(np.float64)
    else:
        vals = empty_vals
    return ts, vals


# ----------------------------------------- vectorized batch codec (r8)
#
# Tier chunks are TINY (a (conv, day) bucket holds a handful of points:
# measured median 2 at sf1.0), so per-chunk Python — ~15 numpy dispatches
# plus struct.pack per chunk in encode_series / decode_series — dominated
# the wall (~4.5us x 400k chunks per pass). The vectorized paths below
# group chunks by (n, stream widths): within a group every chunk has an
# IDENTICAL byte layout, so whole groups encode/decode as 2-D numpy
# kernels and the only per-chunk Python left is one bytes() slice.
# Byte output is bit-identical to encode_series (asserted in tests);
# chunks longer than _VEC_MAX_N (multi-block streams) take the legacy
# per-chunk path unchanged.

_VEC_MAX_N = BLOCK + 1  # dod (n-2) and xor (n-1) both fit one block


def _bit_widths_rows(mat: np.ndarray) -> np.ndarray:
    """Per-row bit width of the max value of a (m, L) uint64 matrix —
    exact (no float log2): unpack the row maxima to bits and locate the
    highest set bit."""
    m = mat.shape[0]
    if mat.shape[1] == 0:
        return np.zeros(m, dtype=np.uint8)
    mx = mat.max(axis=1)
    bits = np.unpackbits(mx.astype(">u8").reshape(-1, 1).view(np.uint8), axis=1)
    any_set = bits.any(axis=1)
    first = bits.argmax(axis=1)  # index of highest set bit (0 = bit 63)
    return np.where(any_set, 64 - first, 0).astype(np.uint8)


def _pack_rows(mat: np.ndarray, width: int) -> np.ndarray:
    """(m, L) uint64 -> (m, ceil(L*width/8)) uint8; per row identical to
    ``_pack_bits(row, width)`` (MSB-first low ``width`` bits, zero-padded
    to the byte boundary)."""
    m, L = mat.shape
    if width == 0 or L == 0:
        return np.zeros((m, 0), dtype=np.uint8)
    be = mat.astype(">u8").view(np.uint8).reshape(m, L, 8)
    bits = np.unpackbits(be, axis=2).reshape(m, L, 64)[:, :, 64 - width :]
    return np.packbits(bits.reshape(m, L * width), axis=1)


def _unpack_rows(pay: np.ndarray, L: int, width: int) -> np.ndarray:
    """(m, nbytes) uint8 payload -> (m, L) uint64; per row identical to
    ``_unpack_bits(row_bytes, L, width)``."""
    m = pay.shape[0]
    if width == 0 or L == 0:
        return np.zeros((m, L), dtype=np.uint64)
    bits = np.unpackbits(pay, axis=1)[:, : L * width].reshape(m, L, width)
    padded = np.zeros((m, L, 64), dtype=np.uint8)
    padded[:, :, 64 - width :] = bits
    return np.packbits(padded.reshape(m, L * 64), axis=1).view(">u8").reshape(m, L).astype(np.uint64)


_HEAD_DTYPE = np.dtype(
    {"names": ["magic", "ver", "n", "first_ts", "first_val"],
     "formats": ["S4", "u1", "<u4", "<i8", "<u8"],
     "offsets": [0, 4, 5, 9, 17], "itemsize": 25}
)


def _head_rows(n: int, first_ts: np.ndarray, first_val: np.ndarray) -> np.ndarray:
    """(m,) first_ts/first_val -> (m, 25) uint8 chunk headers."""
    m = len(first_ts)
    head = np.empty(m, dtype=_HEAD_DTYPE)
    head["magic"] = MAGIC
    head["ver"] = VERSION
    head["n"] = n
    head["first_ts"] = first_ts
    head["first_val"] = first_val
    return head.view(np.uint8).reshape(m, 25)


def _const_rows(m: int, payload: bytes) -> np.ndarray:
    return np.broadcast_to(np.frombuffer(payload, dtype=np.uint8), (m, len(payload)))


def _i64_rows(vals: np.ndarray) -> np.ndarray:
    return vals.astype("<i8").reshape(-1, 1).view(np.uint8)


def _decode_blobs(
    blobs: list, need_ts: bool, need_values: bool
) -> tuple[np.ndarray, "np.ndarray | None", "np.ndarray | None"]:
    """Decode a batch of chunk blobs, preserving blob order. Returns
    (points-per-blob, ts µs concat | None, values concat | None).
    Per-blob results are bit-identical to ``decode_series``; blobs whose
    layout the vectorized path does not cover (n > _VEC_MAX_N, or a
    foreign multi-block layout) fall back to it."""
    m = len(blobs)
    ns = np.empty(m, dtype=np.int64)
    for i, b in enumerate(blobs):
        if b[:4] != MAGIC or b[4] != VERSION:
            raise ValueError("not a GORB v1 chunk")
        ns[i] = int.from_bytes(b[5:9], "little")
    offs = np.concatenate(([0], np.cumsum(ns)))
    total = int(offs[-1])
    ts_all = np.zeros(total, dtype=np.int64) if need_ts else None
    val_all = np.zeros(total, dtype=np.float64) if need_values else None

    idx1 = np.flatnonzero(ns == 1)
    if len(idx1):
        heads = np.frombuffer(
            b"".join(blobs[i][:25] for i in idx1), dtype=_HEAD_DTYPE
        )
        if need_ts:
            ts_all[offs[idx1]] = heads["first_ts"]
        if need_values:
            val_all[offs[idx1]] = np.ascontiguousarray(
                heads["first_val"], dtype=np.uint64
            ).view(np.float64)

    groups: dict[tuple, list[int]] = {}
    legacy: list[int] = []
    for i in np.flatnonzero(ns >= 2):
        b, n = blobs[i], int(ns[i])
        if n > _VEC_MAX_N:
            legacy.append(i)
            continue
        if n > 2:
            wt = b[39]
            ts_pay = ((n - 2) * wt + 7) >> 3
            voff = 44 + ts_pay
        else:
            wt = 0
            voff = 43
        wv = b[voff + 6]
        val_pay = ((n - 1) * wv + 7) >> 3
        if len(b) != voff + 11 + val_pay:
            legacy.append(i)  # foreign layout (e.g. multi-block widths)
            continue
        groups.setdefault((n, wt, wv), []).append(i)

    for (n, wt, wv), lst in groups.items():
        m2 = len(lst)
        ts_paylen = ((n - 2) * wt + 7) >> 3 if n > 2 else 0
        voff = 44 + ts_paylen if n > 2 else 43
        val_paylen = ((n - 1) * wv + 7) >> 3
        L = voff + 11 + val_paylen
        mat = np.frombuffer(b"".join(blobs[i] for i in lst), dtype=np.uint8).reshape(
            m2, L
        )
        pos = offs[np.asarray(lst)]
        gather = pos[:, None] + np.arange(n)[None, :]
        if need_ts:
            first_ts = mat[:, 9:17].copy().view("<i8").ravel()
            first_delta = mat[:, 25:33].copy().view("<i8").ravel()
            if n > 2:
                zz = _unpack_rows(np.ascontiguousarray(mat[:, 44 : 44 + ts_paylen]), n - 2, int(wt))
                dod = _unzigzag(zz.reshape(-1)).reshape(zz.shape)
                deltas = np.hstack(
                    [first_delta[:, None], first_delta[:, None] + np.cumsum(dod, axis=1)]
                )
            else:
                deltas = first_delta[:, None]
            ts_mat = first_ts[:, None] + np.hstack(
                [np.zeros((m2, 1), dtype=np.int64), np.cumsum(deltas, axis=1)]
            )
            ts_all[gather] = ts_mat
        if need_values:
            first_val = mat[:, 17:25].copy().view("<u8").ravel()
            xor = _unpack_rows(
                np.ascontiguousarray(mat[:, voff + 11 : voff + 11 + val_paylen]),
                n - 1,
                int(wv),
            )
            bits = np.hstack([first_val[:, None], xor]).astype(np.uint64)
            val_all[gather] = np.bitwise_xor.accumulate(bits, axis=1).view(np.float64)

    for i in legacy:
        ts, vals = decode_series(bytes(blobs[i]), need_ts=need_ts, need_values=need_values)
        lo = offs[i]
        if need_ts:
            ts_all[lo : lo + len(ts)] = ts
        if need_values:
            val_all[lo : lo + len(vals)] = vals
    return ns, ts_all, val_all


def _encode_vectorized(
    n: int, ts_mat: np.ndarray, val_mat: np.ndarray, out: list, idx: np.ndarray
) -> None:
    """Encode all chunks of length ``n`` (2 <= n <= _VEC_MAX_N) given as
    (m, n) matrices; writes bytes into ``out`` at positions ``idx``."""
    vm = np.ascontiguousarray(val_mat, dtype=np.float64).view(np.uint64)
    heads = _head_rows(n, ts_mat[:, 0], vm[:, 0])
    deltas = np.diff(ts_mat, axis=1)
    first_delta = deltas[:, 0]
    dod = np.diff(deltas, axis=1) if n > 2 else np.zeros((len(ts_mat), 0), np.int64)
    zz = _zigzag(dod.reshape(-1)).reshape(dod.shape) if n > 2 else dod.astype(np.uint64)
    xor = vm[:, 1:] ^ vm[:, :-1]
    w_ts = _bit_widths_rows(zz)
    w_val = _bit_widths_rows(xor)
    key = w_ts.astype(np.int32) * 65 + w_val
    for k in np.unique(key):
        sel = np.flatnonzero(key == k)
        wt, wv = int(k) // 65, int(k) % 65
        m = len(sel)
        ts_pay = _pack_rows(zz[sel], wt) if n > 2 else np.zeros((m, 0), np.uint8)
        val_pay = _pack_rows(xor[sel], wv)
        if n > 2:
            ts_hdr = (
                struct.pack("<IH", n - 2, 1)
                + bytes([wt])
                + struct.pack("<I", ts_pay.shape[1])
            )
        else:
            ts_hdr = struct.pack("<IH", 0, 0) + struct.pack("<I", 0)
        val_hdr = (
            struct.pack("<IH", n - 1, 1)
            + bytes([wv])
            + struct.pack("<I", val_pay.shape[1])
        )
        full = np.hstack(
            [
                heads[sel],
                _i64_rows(first_delta[sel]),
                _const_rows(m, ts_hdr),
                ts_pay,
                _const_rows(m, val_hdr),
                val_pay,
            ]
        )
        for j, row in zip(sel, full):
            out[idx[j]] = row.tobytes()


# ------------------------------------------------------------ spark API

CHUNK_SCHEMA = (
    "conv_id string, chunk_start long, n_points int, raw_bytes long, chunk binary"
)


def _encode_group_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """Encode every (conv_id, chunk_start) group in an already-sorted
    pandas frame. Grouping via numpy boundary detection (no pandas
    groupby-apply per-group machinery); chunks are encoded in
    (n, widths)-grouped numpy batches (see the vectorized codec above),
    falling back to per-chunk ``encode_series`` for n > _VEC_MAX_N.
    Output rows and bytes are identical to the per-chunk path."""
    if pdf.empty:
        return pd.DataFrame(
            {"conv_id": [], "chunk_start": [], "n_points": [], "raw_bytes": [], "chunk": []}
        )
    conv = pdf["conv_id"].to_numpy()
    start = pdf["chunk_start"].to_numpy(dtype=np.int64)
    ts = pdf["__ts_micros"].to_numpy(dtype=np.int64)
    vals = pdf["__value"].to_numpy(dtype=np.float64)
    boundary = np.flatnonzero((conv[1:] != conv[:-1]) | (start[1:] != start[:-1])) + 1
    edges = np.concatenate(([0], boundary, [len(pdf)]))
    lens = np.diff(edges)
    starts = edges[:-1]
    n_chunks = len(lens)
    chunks: list = [None] * n_chunks
    for n in np.unique(lens):
        idx = np.flatnonzero(lens == n)
        n = int(n)
        if n == 1:
            heads = _head_rows(
                1,
                ts[starts[idx]],
                np.ascontiguousarray(vals[starts[idx]]).view(np.uint64),
            )
            for j, row in zip(idx, heads):
                chunks[j] = row.tobytes()
        elif n <= _VEC_MAX_N:
            gather = starts[idx][:, None] + np.arange(n)[None, :]
            _encode_vectorized(n, ts[gather], vals[gather], chunks, idx)
        else:
            for j in idx:
                lo, hi = starts[j], starts[j] + n
                chunks[j] = encode_series(ts[lo:hi], vals[lo:hi])
    return pd.DataFrame(
        {
            "conv_id": conv[starts],
            "chunk_start": start[starts],
            "n_points": lens.astype(np.int32),
            "raw_bytes": (lens * 16).astype(np.int64),
            "chunk": chunks,
        }
    )


def encode_chunks(
    df: DataFrame,
    value_col: str,
    tier: str = "1h",
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    order_col: str | None = "turn_idx",
    target_partitions: int | None = None,
) -> DataFrame:
    """(entity, ts, value) rows -> one Gorilla chunk row per
    (entity, tier bucket).

    Shape: repartition by chunk key + sortWithinPartitions, then ONE
    ``mapInPandas`` pass that encodes every group in each Arrow batch
    (carrying the possibly-split tail group across batch boundaries).
    ``groupBy().applyInPandas`` would be simpler but pays per-group
    serializer overhead — measured ~7x slower with small chunks
    (40k groups x 2.5 points: 16s vs 2s).

    ``target_partitions`` sizes the encode shuffle. Default = the
    cluster's defaultParallelism, NOT spark.sql.shuffle.partitions:
    every partition pays a Python-worker handshake + Arrow stream
    setup, so oversplitting a Pandas-UDF stage costs real time
    (96 vs 32 partitions on the same 100k rows measured 5.3s vs 2.2s).
    At cluster scale pass an explicit value sized so partitions stay
    within executor memory (~1-5M points each).
    """
    bucketed = df.select(
        F.col(entity_col).alias("conv_id"),
        bucket_expr(F.col(ts_col), tier).alias("chunk_start"),
        micros(F.col(ts_col)).alias("__ts_micros"),
        F.col(value_col).cast("double").alias("__value"),
        *([F.col(order_col).alias("__ord")] if order_col else []),
    )
    sort_cols = ["conv_id", "chunk_start", "__ts_micros"] + (["__ord"] if order_col else [])
    n_parts = target_partitions or df.sparkSession.sparkContext.defaultParallelism
    arranged = bucketed.repartition(n_parts, "conv_id", "chunk_start").sortWithinPartitions(
        *sort_cols
    )

    def enc_stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if pdf.empty:
                carry = None
                continue
            # hold back the final group: it may continue in the next batch
            last_conv = pdf["conv_id"].iloc[-1]
            last_start = pdf["chunk_start"].iloc[-1]
            tail_mask = (pdf["conv_id"] == last_conv) & (pdf["chunk_start"] == last_start)
            carry = pdf[tail_mask]
            done = pdf[~tail_mask]
            if len(done):
                yield _encode_group_frame(done)
        if carry is not None and len(carry):
            yield _encode_group_frame(carry)

    return arranged.mapInPandas(enc_stream, CHUNK_SCHEMA)


def decode_chunks(
    chunks: DataFrame,
    value_col: str = "value",
    time_range: "tuple | None" = None,
    tier: str | None = None,
    columns: "list[str] | None" = None,
) -> DataFrame:
    """Chunk rows -> (conv_id, ts, value) points. ``mapInPandas``; the
    loop is per *chunk* (thousands of points each), numpy per point.

    ``time_range=(lo, hi)`` (datetimes, half-open ``[lo, hi)``) prunes
    BEFORE decoding: with ``tier`` given, chunk pruning is exact on
    ``chunk_start`` (a chunk spans ``[chunk_start, chunk_start+tier)``
    by construction) — at 100 TB serving a window touches only the
    chunks that intersect it, never the full binary column; point-level
    trimming then finishes inside the decoder. Without ``tier``, only
    the lower bound can prune chunks (an unknown chunk width leaves the
    upper extent open) and point-level trimming does the rest.

    ``columns`` prunes at the CODEC level: a subset of
    ``["conv_id", "ts", value_col]`` decodes only the needed Gorilla
    stream(s) — the other stream is header-skipped, never unpacked
    (parquet column pruning's counterpart inside the chunk). A
    ``time_range`` forces timestamp decoding for trimming even when
    ``ts`` is not in the output.
    """
    columns = list(columns) if columns is not None else ["conv_id", "ts", value_col]
    bad = [c for c in columns if c not in ("conv_id", "ts", value_col)]
    if bad:
        raise ValueError(f"unknown decode columns {bad}")
    want_ts = "ts" in columns
    want_vals = value_col in columns
    need_ts = want_ts or time_range is not None
    type_of = {"conv_id": "string", "ts": "timestamp", value_col: "double"}
    out_schema = ", ".join(f"{c} {type_of[c]}" for c in columns)
    lo_us = hi_us = None
    if time_range is not None:
        from .timeutils import micros  # local import avoids cycle at module load

        lo, hi = time_range

        def _to_us(b) -> int:
            # Encoded micros are UTC wall-clock (session tz pinned UTC).
            # Naive datetimes must be read as UTC too — datetime.timestamp()
            # would apply the OS-local zone and shift the pruning window.
            if hasattr(b, "timestamp"):
                if b.tzinfo is None:
                    b = b.replace(tzinfo=dt.timezone.utc)
                return int(b.timestamp() * 1_000_000)
            return int(b)

        lo_us, hi_us = _to_us(lo), _to_us(hi)
        # chunk-level pruning on the chunk_start metadata column — this
        # filter reaches the parquet scan (PushedFilters), so untouched
        # chunks are never read, let alone decoded
        if tier is not None:
            width = {"1m": 60, "1h": 3600, "1d": 86400}[tier] * 1_000_000
            chunks = chunks.filter(
                (F.col("chunk_start") < F.lit(hi_us))
                & (F.col("chunk_start") > F.lit(lo_us - width))
            )
        else:
            chunks = chunks.filter(F.col("chunk_start") < F.lit(hi_us))

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # batch-vectorized decode (r8): chunks grouped by (n, widths)
        # decode as 2-D numpy kernels in _decode_blobs — the per-chunk
        # Python loop (~4.5us x chunk count per pass) is gone; row
        # order and values are identical to the per-chunk path.
        for pdf in batches:
            blobs = [bytes(b) for b in pdf["chunk"]]
            sizes, ts_arr, val_arr = _decode_blobs(blobs, need_ts, want_vals)
            conv = np.repeat(pdf["conv_id"].to_numpy(), sizes)
            if lo_us is not None:
                mask = (ts_arr >= lo_us) & (ts_arr < hi_us)
                conv = conv[mask]
                ts_arr = ts_arr[mask]
                if want_vals:
                    val_arr = val_arr[mask]
            n = len(conv)
            if not n:
                yield pd.DataFrame({c: [] for c in columns})
                continue
            data = {}
            if "conv_id" in columns:
                data["conv_id"] = conv
            if want_ts:
                data["ts"] = pd.to_datetime(ts_arr, unit="us")
            if want_vals:
                data[value_col] = val_arr
            yield pd.DataFrame(data)[columns]

    return chunks.mapInPandas(dec, out_schema)
