"""Hand-rolled minimal HDF5 writer for test fixtures.

Emits the OLD-style layout (superblock v0, v1 object headers, symbol-
table groups with a v1 B-tree + SNOD + local heap, contiguous data,
v1 attributes) — the complement of the reference's GOES files, which
use v2 headers + fractal-heap dense links. Between the two, every
group/header path in ``sources/hdf5lite.py`` gets exercised without
committing any reference-derived binary.

Format layout follows the public HDF5 File Format Specification v3.
"""

from __future__ import annotations

import struct

UNDEF = 0xFFFFFFFFFFFFFFFF


def _pad8(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 8)


def _msg(mtype: int, body: bytes) -> bytes:
    body = _pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def _ohdr_v1(msgs: list[bytes]) -> bytes:
    blob = b"".join(msgs)
    return struct.pack("<BxHII4x", 1, len(msgs), 1, len(blob)) + blob


def _dataspace_1d(n: int) -> bytes:
    return struct.pack("<BBB5x", 1, 1, 0) + struct.pack("<Q", n)


def _dt_f64() -> bytes:
    # class 1 (float) v1; bitfield/properties per IEEE LE f64
    return struct.pack("<B3BI", 0x11, 0x20, 0x3F, 0x00, 8) + struct.pack(
        "<HHBBBBI", 0, 64, 52, 11, 0, 52, 0
    )


def _dt_str(n: int) -> bytes:
    return struct.pack("<B3BI", 0x13, 0, 0, 0, n)


def _attr_v1(name: str, dt: bytes, ds: bytes, data: bytes) -> bytes:
    nm = _pad8(name.encode() + b"\x00")
    return (
        struct.pack("<BxHHH", 1, len(name) + 1, len(dt), len(ds))
        + nm
        + _pad8(dt)
        + _pad8(ds)
        + data
    )


def write_minimal_hdf5(
    variables: dict[str, list[float]], units: dict[str, str]
) -> bytes:
    """Serialize float64 1-D variables (+ optional per-var ``units``
    string attribute) as an old-style HDF5 file."""
    names = list(variables)

    # ---- plan data blobs last; headers reference them by offset ----
    # file = superblock(96) | root ohdr | heap | btree | snod |
    #        per-var ohdrs | data blobs
    chunks: list[bytes] = []
    off = 96

    def reserve(b: bytes) -> int:
        nonlocal off
        chunks.append(b)
        start = off
        off += len(b)
        return start

    # root object header: one symbol-table message (patched later)
    root_ohdr = _ohdr_v1([_msg(0x11, struct.pack("<QQ", 0, 0))])
    root_at = reserve(root_ohdr)

    # local heap: name strings ("\0" first, convention)
    heap_data = bytearray(b"\x00" * 8)
    name_off = {}
    for n in names:
        name_off[n] = len(heap_data)
        heap_data += n.encode() + b"\x00"
    heap_data = bytearray(_pad8(bytes(heap_data)))
    heap_hdr_at = reserve(b"")  # placeholder, patched in below
    heap_blob = (
        b"HEAP"
        + struct.pack("<B3xQQQ", 0, len(heap_data), UNDEF, heap_hdr_at + 32)
        + bytes(heap_data)
    )
    chunks[-1] = heap_blob
    off += len(heap_blob)

    # v1 group B-tree: one leaf entry pointing at one SNOD
    snod_at = off + 48
    btree = (
        b"TREE"
        + struct.pack("<BBHQQ", 0, 0, 1, UNDEF, UNDEF)
        + struct.pack("<QQQ", 0, snod_at, name_off[names[-1]])
    )
    reserve(btree)

    # SNOD with one 40-byte entry per dataset (ohdr addrs patched later)
    snod = bytearray(b"SNOD" + struct.pack("<BxH", 1, len(names)))
    entry_pos = {}
    for n in sorted(names):  # symbol nodes store entries name-ordered
        entry_pos[n] = len(snod)
        snod += struct.pack("<QQII16x", name_off[n], 0, 0, 0)
    snod_start = reserve(bytes(snod))
    assert snod_start == snod_at

    # dataset object headers
    data_addr_patches = []  # (chunk_idx, body_offset_in_chunk, var)
    ohdr_at = {}
    for n in names:
        vals = variables[n]
        msgs = [
            _msg(0x01, _dataspace_1d(len(vals))),
            _msg(0x03, _dt_f64()),
            _msg(
                0x08,
                struct.pack("<BBQQ", 3, 1, 0, 8 * len(vals)),  # patched
            ),
        ]
        if n in units:
            u = units[n]
            msgs.append(
                _msg(
                    0x0C,
                    _attr_v1(
                        "units",
                        _dt_str(len(u)),
                        struct.pack("<BBB5x", 1, 0, 0),  # scalar
                        u.encode(),
                    ),
                )
            )
        blob = _ohdr_v1(msgs)
        ohdr_at[n] = reserve(blob)

    # data blobs
    data_at = {}
    for n in names:
        data_at[n] = reserve(
            struct.pack(f"<{len(variables[n])}d", *variables[n])
        )

    body = bytearray(b"".join(chunks))

    def patch(file_off: int, data: bytes):
        body[file_off - 96 : file_off - 96 + len(data)] = data

    # patch root symbol-table message (btree addr, heap addr)
    bt_at = heap_hdr_at + len(heap_blob)
    patch(root_at + 16 + 8, struct.pack("<QQ", bt_at, heap_hdr_at))
    # patch SNOD entry ohdr addrs
    for n in names:
        patch(snod_start + entry_pos[n] + 8, struct.pack("<Q", ohdr_at[n]))
    # patch layout message data addresses (3rd message of each ohdr):
    # prefix 16 + dataspace msg (8+16) + datatype msg (8+24) + msg hdr 8
    # + layout version/class bytes 2
    for n in names:
        lay_body = ohdr_at[n] + 16 + 24 + 32 + 8 + 2
        patch(lay_body, struct.pack("<Q", data_at[n]))

    eof = 96 + len(body)
    superblock = (
        b"\x89HDF\r\n\x1a\n"
        + struct.pack("<BBBxB BB x HHI", 0, 0, 0, 0, 8, 8, 4, 16, 0)
        + struct.pack("<QQQQ", 0, UNDEF, eof, UNDEF)
        + struct.pack("<QQII16x", 0, 96, 0, 0)
    )
    assert len(superblock) == 96, len(superblock)
    return bytes(superblock) + bytes(body)
