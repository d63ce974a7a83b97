"""First-class checkpoint / resume (a capability the reference lacks).

The reference's counter-based RNG makes a run logically resumable from
(lattice, iteration, seed) but it never implements reload (SURVEY.md §5:
optimized/utils.c:97-107 — Fread is never called). Here it is first-class:
with any counter rng mode, resuming a checkpoint continues the *exact*
trajectory bit-for-bit, because every future draw is a pure function of
(seed, site, step, color).

Format (version 2, streamed): a single file holding

    magic "ISINGCK2" | u32 header_len | header JSON | body

where the body is row chunks in order; each chunk is the bit-packed
(np.packbits, axis=1) black plane rows followed by the white plane rows.
One bit per spin on disk. Both save and load stream one row chunk at a
time, so host memory stays O(chunk_rows * ncols) even at shapes whose
decoded byte planes would dominate host RAM (524288 x 65536 = 34 GB of
uint8 planes; this file is 4 GB and the host transient is ~256 MB).
"""

from __future__ import annotations

import json

import numpy as np

from .config import SimConfig

MAGIC = b"ISINGCK2"
FORMAT_VERSION = 2


def _chunk_schedule(nrows: int, chunk_rows: int):
    c = max(2, min(chunk_rows, nrows) & ~1)  # even-height chunks (parity)
    return [(r, min(nrows, r + c)) for r in range(0, nrows, c)], c


def _pack_rows(bits):
    """(n, ch) {0,1} plane -> (n, ceil(ch/8)) packed bytes, np.packbits
    byte order (MSB-first). Device arrays pack ON DEVICE so only the packed
    bytes cross the host link — 8x less traffic, which matters through a
    remote-TPU tunnel (34 GB -> 4.3 GB at the 524288x65536 flagship shape).
    """
    if isinstance(bits, np.ndarray):
        return np.packbits(bits, axis=1)
    import jax.numpy as jnp
    n, ch = bits.shape
    pad = (-ch) % 8
    if pad:
        bits = jnp.pad(bits, ((0, 0), (0, pad)))
    g = bits.reshape(n, (ch + pad) // 8, 8).astype(jnp.uint8)
    out = jnp.zeros(g.shape[:2], jnp.uint8)
    for z in range(8):
        out = out | (g[:, :, z] << (7 - z))
    return np.asarray(out)  # device_get of the packed bytes only


def _unpack_rows_device(packed_np, ch: int):
    """(n, nb) packed bytes -> (n, ch) device uint8 plane, unpacking ON
    DEVICE (upload the bytes, not the decoded plane)."""
    import jax.numpy as jnp
    d = jnp.asarray(packed_np)
    cols = [(d >> (7 - z)) & 1 for z in range(8)]
    return jnp.stack(cols, axis=2).reshape(d.shape[0], 8 * d.shape[1])[:, :ch]


def save_checkpoint_streamed(path: str, decode_rows, nrows: int, ncols: int,
                             *, step: int, temp: float, cfg: SimConfig,
                             chunk_rows: int = 8192,
                             packed_rows=None) -> None:
    """Stream a checkpoint to disk, one row chunk at a time.

    decode_rows(r0, r1) -> (black, white) compact uint8 bit planes for rows
    [r0, r1) — typically a chunked backend decode of the device state, so
    neither the full decoded planes nor the full packed file body ever
    materialize on the host.

    packed_rows(r0, r1) -> (pb, pw) ALREADY-PACKED byte planes in
    np.packbits order (device or host) — the storage-domain fast path for
    backends whose storage is 1 bit/spin (bit1 writes its words straight
    through a word-domain shuffle; same file bytes, no decode round trip).
    When given it replaces decode_rows entirely.
    """
    ch = ncols // 2
    row_bytes = (ch + 7) // 8
    schedule, c = _chunk_schedule(nrows, chunk_rows)
    header = json.dumps({
        "version": FORMAT_VERSION,
        "nrows": nrows,
        "ncols": ncols,
        "chunk_rows": c,
        "step": int(step),
        "temp": float(temp),
        "config": cfg.to_json(),
    }).encode()
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(np.uint32(len(header)).tobytes())
        f.write(header)
        for r0, r1 in schedule:
            if packed_rows is not None:
                pb, pw = packed_rows(r0, r1)
                pb, pw = np.asarray(pb), np.asarray(pw)
                for name, p in (("black", pb), ("white", pw)):
                    if p.shape != (r1 - r0, row_bytes):
                        raise ValueError(
                            f"packed_rows({r0},{r1}) returned {name} bytes "
                            f"of shape {p.shape}, expected "
                            f"{(r1 - r0, row_bytes)}")
                f.write(pb.tobytes())
                f.write(pw.tobytes())
                continue
            b, w = decode_rows(r0, r1)
            for name, p in (("black", b), ("white", w)):
                if p.shape != (r1 - r0, ch):
                    raise ValueError(
                        f"decode_rows({r0},{r1}) returned {name} plane of "
                        f"shape {p.shape}, expected {(r1 - r0, ch)}")
            f.write(_pack_rows(b).tobytes())
            f.write(_pack_rows(w).tobytes())


def save_checkpoint(path: str, black, white, *, step: int, temp: float,
                    cfg: SimConfig) -> None:
    """Convenience wrapper for in-memory compact uint8 bit planes."""
    b = np.asarray(black, dtype=np.uint8)
    w = np.asarray(white, dtype=np.uint8)
    save_checkpoint_streamed(
        path, lambda r0, r1: (b[r0:r1], w[r0:r1]),
        b.shape[0], 2 * b.shape[1], step=step, temp=temp, cfg=cfg)


def read_checkpoint_meta(path: str) -> dict:
    """Header only: {'nrows', 'ncols', 'chunk_rows', 'step', 'temp', 'cfg'}."""
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            if magic[:4] == b"PK\x03\x04":
                # The v1 (pre-0.3) format was an .npz archive; no migration
                # path is kept (v1 shipped in no tagged release), but the
                # error should say what the file is rather than "bad magic".
                raise ValueError(
                    f"{path!r} is a v1 (.npz) checkpoint; the v1 format is "
                    "no longer supported — re-save it from a 0.2.x tree "
                    "or regenerate the run")
            raise ValueError(
                f"{path!r} is not an ising-tpu v{FORMAT_VERSION} checkpoint "
                f"(bad magic {magic!r})")
        (hlen,) = np.frombuffer(f.read(4), np.uint32)
        meta = json.loads(f.read(int(hlen)).decode())
    if meta["version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {meta['version']}")
    meta["cfg"] = SimConfig.from_json(meta.pop("config"))
    if (meta["nrows"], meta["ncols"]) != (meta["cfg"].nrows,
                                          meta["cfg"].ncols):
        raise ValueError(
            f"checkpoint {path!r} is inconsistent: stored planes are "
            f"{meta['nrows']}x{meta['ncols']} but the embedded config says "
            f"{meta['cfg'].nrows}x{meta['cfg'].ncols} (edited file?)")
    meta["_body_offset"] = len(MAGIC) + 4 + int(hlen)
    return meta


def load_checkpoint_state(path: str, encode=None, encode_packed=None):
    """Stream the body back; returns ((black, white), meta).

    With encode (a backend's bit-planes -> storage transform), each row
    chunk is encoded as it is read and only the backend STORAGE accumulates
    on device — the resume-side mirror of save_checkpoint_streamed. Without
    encode, returns full uint8 bit planes (small shapes / inspection).

    encode_packed(pb, pw) -> storage chunk takes the raw packed FILE bytes
    instead (the bit1 resume fast path: upload bytes, word-shuffle on
    device, never an unpacked byte plane). Takes precedence over encode;
    it may return None (unsupported geometry) to fall back to encode.
    """
    import jax
    import jax.numpy as jnp

    meta = read_checkpoint_meta(path)
    nrows, ncols, c = meta["nrows"], meta["ncols"], meta["chunk_rows"]
    ch = ncols // 2
    row_bytes = (ch + 7) // 8
    schedule, _ = _chunk_schedule(nrows, c)
    header_len = meta["_body_offset"]
    expect = header_len + 2 * nrows * row_bytes
    import os
    actual = os.path.getsize(path)
    if actual != expect:
        raise ValueError(
            f"checkpoint {path!r} is inconsistent: file is {actual} bytes "
            f"but the header implies {expect} (truncated or edited file?)")

    bs, ws = [], []
    with open(path, "rb") as f:
        f.seek(header_len)
        for r0, r1 in schedule:
            n = r1 - r0
            pb = np.frombuffer(f.read(n * row_bytes), np.uint8
                               ).reshape(n, row_bytes)
            pw = np.frombuffer(f.read(n * row_bytes), np.uint8
                               ).reshape(n, row_bytes)
            packed_pair = None if encode_packed is None \
                else encode_packed(pb, pw)
            if packed_pair is not None:
                eb, ew = packed_pair
                jax.block_until_ready((eb, ew))
                bs.append(eb)
                ws.append(ew)
            elif encode is not None:
                # Upload the packed BYTES and unpack on device (8x less
                # host-link traffic; see _pack_rows).
                eb, ew = encode(_unpack_rows_device(pb, ch),
                                _unpack_rows_device(pw, ch))
                jax.block_until_ready((eb, ew))  # bound live transients
                bs.append(eb)
                ws.append(ew)
            else:
                bs.append(np.unpackbits(pb, axis=1)[:, :ch])
                ws.append(np.unpackbits(pw, axis=1)[:, :ch])
    if encode is not None or encode_packed is not None:
        black = bs[0] if len(bs) == 1 else jnp.concatenate(bs, axis=0)
        white = ws[0] if len(ws) == 1 else jnp.concatenate(ws, axis=0)
    else:
        black = jnp.asarray(np.concatenate(bs, axis=0))
        white = jnp.asarray(np.concatenate(ws, axis=0))
    return (black, white), meta


def load_checkpoint(path: str):
    """Returns (black, white, step, temp, cfg) with bit planes as jnp
    arrays (decoded domain). For scale-safe resume use
    load_checkpoint_state(path, backend.encode) instead."""
    (black, white), meta = load_checkpoint_state(path)
    return black, white, meta["step"], meta["temp"], meta["cfg"]
