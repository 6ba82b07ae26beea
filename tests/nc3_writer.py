"""Minimal classic NetCDF-3 *writer* — test-side counterpart of
``sources/netcdf3.py``, implemented independently from the same public
Unidata spec so reader bugs can't cancel writer bugs.

Supports what the satellite fixtures need: fixed and record (unlimited)
dimensions, numeric + char variables, variable attributes, v1 and v2
(64-bit offset) headers, and the optional single-record-var unpadded
packing. Used by tests and by ``make_fixture.py`` to produce the
committed ``tests/fixtures/*.nc`` files.
"""

from __future__ import annotations

import struct

_TYPES = {1: (1, "b"), 2: (1, "c"), 3: (2, "h"), 4: (4, "i"), 5: (4, "f"), 6: (8, "d")}


def _pad(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name(s: str) -> bytes:
    e = s.encode()
    return struct.pack(">I", len(e)) + _pad(e)


def _vals(nc_type: int, values) -> bytes:
    width, fmt = _TYPES[nc_type]
    if nc_type == 2:
        raw = values.encode() if isinstance(values, str) else bytes(values)
        return _pad(raw)
    return _pad(struct.pack(f">{len(values)}{fmt}", *values))


def _att_list(attrs: dict) -> bytes:
    if not attrs:
        return struct.pack(">II", 0, 0)
    out = struct.pack(">II", 0x0C, len(attrs))
    for nm, (nc_type, values) in attrs.items():
        n = len(values) if nc_type != 2 else len(values.encode())
        out += _name(nm) + struct.pack(">II", nc_type, n) + _vals(nc_type, values)
    return out


def write_nc3(
    dims: list[tuple[str, int]],
    variables: list[dict],
    numrecs: int = 0,
    global_attrs: dict | None = None,
    version: int = 1,
) -> bytes:
    """``dims``: (name, size) with size 0 = record dim. Each variable:
    ``{name, dims: [dim indices], type: nc_type, attrs: {n: (t, v)},
    data: flat list (record vars: numrecs × per-record slab)}``."""
    hdr = b"CDF" + bytes([version]) + struct.pack(">I", numrecs)
    hdr += struct.pack(">II", 0x0A, len(dims)) if dims else struct.pack(">II", 0, 0)
    for nm, size in dims:
        hdr += _name(nm) + struct.pack(">I", size)
    hdr += _att_list(global_attrs or {})

    def is_rec(v):
        return bool(v["dims"]) and dims[v["dims"][0]][1] == 0

    def slab_elems(v):
        n = 1
        for d in v["dims"][1 if is_rec(v) else 0 :]:
            n *= dims[d][1]
        return n

    rec_vars = [v for v in variables if is_rec(v)]

    def slab_bytes(v, padded: bool) -> int:
        raw = slab_elems(v) * _TYPES[v["type"]][0]
        return (raw + 3) // 4 * 4 if padded else raw

    single_rec = len(rec_vars) == 1
    recsize = sum(slab_bytes(v, padded=not single_rec) for v in rec_vars)

    # layout: header, then fixed vars, then the record section
    begin_w = ">Q" if version == 2 else ">I"
    var_hdr_len = 0
    for v in variables:
        var_hdr_len += len(_name(v["name"])) + 4 + 4 * len(v["dims"])
        var_hdr_len += len(_att_list(v.get("attrs") or {}))
        var_hdr_len += 8 + (8 if version == 2 else 4)
    data_at = len(hdr) + struct.pack(">II", 0x0B, len(variables)).__len__() + var_hdr_len

    begins, fixed_payload = {}, b""
    for v in variables:
        if not is_rec(v):
            begins[v["name"]] = data_at + len(fixed_payload)
            fixed_payload += _pad(_encode(v, slab_elems(v)))
    rec_at = data_at + len(fixed_payload)
    off = 0
    for v in rec_vars:
        begins[v["name"]] = rec_at + off
        off += slab_bytes(v, padded=not single_rec)

    out = hdr + struct.pack(">II", 0x0B, len(variables)) if variables else hdr + struct.pack(">II", 0, 0)
    for v in variables:
        out += _name(v["name"]) + struct.pack(">I", len(v["dims"]))
        out += struct.pack(f">{len(v['dims'])}I", *v["dims"]) if v["dims"] else b""
        out += _att_list(v.get("attrs") or {})
        out += struct.pack(">II", v["type"], slab_bytes(v, padded=True))
        out += struct.pack(begin_w, begins[v["name"]])
    out += fixed_payload

    # record section: records interleave every record var's slab
    for rec in range(numrecs):
        for v in rec_vars:
            n = slab_elems(v)
            chunk = _encode(v, n, offset=rec * n)
            out += chunk if single_rec else _pad(chunk)
    return out


def _encode(v: dict, n: int, offset: int = 0) -> bytes:
    width, fmt = _TYPES[v["type"]]
    if v["type"] == 2:
        data = v["data"]
        raw = (data if isinstance(data, str) else "".join(data)).encode()
        return raw[offset * width : (offset + n) * width].ljust(n, b"\x00")
    return struct.pack(f">{n}{fmt}", *v["data"][offset : offset + n])
