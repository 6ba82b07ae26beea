"""Pure-Python reader for the classic NetCDF-3 binary format.

The flagship satellite-ingest path (SURVEY §2.1 S3) must decode real
NetCDF bytes; this container has no netCDF4/h5py, so HDF5-backed NetCDF-4
stays behind an import gate (``netcdf.py``) — but classic NetCDF-3
(magic ``CDF\\x01`` / ``CDF\\x02``) is a simple, fully public format
(Unidata's "NetCDF Classic Format Specification") that needs no library:
a big-endian header describing dims / attrs / vars, then fixed-size data
slabs at recorded offsets, with record variables interleaved per record.

Scope: everything the satellite files use — N-D numeric variables
(flattened row-major), char variables (decoded to strings), variable and
global attributes, both fixed and record (unlimited-dimension)
variables, v1 (32-bit offsets) and v2 (64-bit offsets) headers, and the
``0xFFFFFFFF`` streaming record count (inferred from file size).

Reference parity: decoded output feeds the same flattener as the
netCDF4-backed path — ``variables`` maps name → list of values exactly
like ``ds.variables[k][:].tolist()`` (goes_satellite_etl.py:218-238),
and ``units`` comes from the time variable's attribute with the
reference's ``'unknown'`` default (goes_satellite_etl.py:199).
"""

from __future__ import annotations

import struct

from data_pipeline_with_big_data_stack_spark.serde import pickle_by_value

pickle_by_value(__name__)  # runs inside the mapInPandas parser on workers

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

# nc_type → (byte width, struct format char); NC_CHAR handled as text
_TYPES = {1: (1, "b"), 2: (1, "c"), 3: (2, "h"), 4: (4, "i"), 5: (4, "f"), 6: (8, "d")}
_STREAMING = 0xFFFFFFFF


class _Reader:
    def __init__(self, content: bytes):
        self.b = content
        self.pos = 0

    def u32(self) -> int:
        (v,) = struct.unpack_from(">I", self.b, self.pos)
        self.pos += 4
        return v

    def i64(self) -> int:
        (v,) = struct.unpack_from(">q", self.b, self.pos)
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.u32()
        s = self.b[self.pos : self.pos + n].decode("utf-8")
        self.pos += (n + 3) // 4 * 4  # names pad to a 4-byte boundary
        return s

    def values(self, nc_type: int, nelems: int):
        width, fmt = _TYPES[nc_type]
        raw = self.b[self.pos : self.pos + width * nelems]
        self.pos += (width * nelems + 3) // 4 * 4  # values pad too
        if nc_type == 2:  # NC_CHAR → text
            return raw.decode("utf-8", "replace").rstrip("\x00")
        return list(struct.unpack(f">{nelems}{fmt}", raw))

    def tagged_count(self, expect_tag: int) -> int:
        """ABSENT (two zero words) or ``expect_tag count``."""
        tag = self.u32()
        count = self.u32()
        if tag == 0 and count == 0:
            return 0
        if tag != expect_tag:
            raise ValueError(f"bad NetCDF-3 header tag {tag:#x}, want {expect_tag:#x}")
        return count

    def att_list(self) -> dict:
        out = {}
        for _ in range(self.tagged_count(_NC_ATTRIBUTE)):
            nm = self.name()
            nc_type = self.u32()
            nelems = self.u32()
            v = self.values(nc_type, nelems)
            out[nm] = v[0] if isinstance(v, list) and len(v) == 1 else v
        return out


def parse_netcdf3(content: bytes):
    """Decode classic NetCDF-3 bytes.

    Returns ``(variables, var_attrs, global_attrs)`` where ``variables``
    maps each variable name to a flat row-major list (strings for char
    variables with a trailing string dimension), mirroring the netCDF4
    ``.tolist()`` shape the flattener consumes.
    """
    if content[:3] != b"CDF" or content[3] not in (1, 2):
        raise ValueError("not a classic NetCDF-3 file")
    version = content[3]
    r = _Reader(content)
    r.pos = 4
    numrecs = r.u32()

    dims: list[tuple[str, int]] = []
    for _ in range(r.tagged_count(_NC_DIMENSION)):
        dims.append((r.name(), r.u32()))
    global_attrs = r.att_list()

    headers = []
    for _ in range(r.tagged_count(_NC_VARIABLE)):
        nm = r.name()
        ndims = r.u32()
        dimids = [r.u32() for _ in range(ndims)]
        attrs = r.att_list()
        nc_type = r.u32()
        r.u32()  # vsize: redundant (recomputed below; writers disagree
        #          on the single-record-var padding exception)
        begin = r.i64() if version == 2 else r.u32()
        headers.append((nm, dimids, attrs, nc_type, begin))

    def shape_of(dimids):
        return [dims[d][1] for d in dimids]

    def is_record(dimids):
        return bool(dimids) and dims[dimids[0]][1] == 0

    def slab_elems(dimids):
        n = 1
        for d in dimids[1:] if is_record(dimids) else dimids:
            n *= dims[d][1]
        return n

    # record interleave: each record holds every record-var's per-record
    # slab, padded to 4 — except when there is exactly ONE record
    # variable, which packs unpadded (spec note 2)
    rec_vars = [h for h in headers if is_record(h[1])]
    slabs = {}
    for nm, dimids, _a, nc_type, _b in rec_vars:
        width = _TYPES[nc_type][0]
        raw = slab_elems(dimids) * width
        slabs[nm] = (raw, (raw + 3) // 4 * 4)
    recsize = (
        slabs[rec_vars[0][0]][0]
        if len(rec_vars) == 1
        else sum(p for _raw, p in slabs.values())
    )
    if numrecs == _STREAMING and rec_vars:
        first = min(h[4] for h in rec_vars)
        numrecs = (len(content) - first) // recsize if recsize else 0

    def decode(nc_type, dimids, at: int):
        width, fmt = _TYPES[nc_type]
        n = slab_elems(dimids)
        if nc_type == 2:
            shape = shape_of(dimids)
            strlen = shape[-1] if len(shape) > 1 or is_record(dimids) else n
            strlen = max(strlen, 1)  # 1-D record char: one char per record
            raw = content[at : at + n * width]
            if strlen == n and not is_record(dimids) and len(shape) == 1:
                return [raw.decode("utf-8", "replace").rstrip("\x00")]
            return [
                raw[i : i + strlen].decode("utf-8", "replace").rstrip("\x00")
                for i in range(0, len(raw), strlen)
            ]
        return list(struct.unpack_from(f">{n}{fmt}", content, at))

    variables: dict[str, list] = {}
    var_attrs: dict[str, dict] = {}
    for nm, dimids, attrs, nc_type, begin in headers:
        var_attrs[nm] = attrs
        if is_record(dimids):
            vals: list = []
            for rec in range(numrecs):
                vals.extend(decode(nc_type, dimids, begin + rec * recsize))
            variables[nm] = vals
        else:
            variables[nm] = decode(nc_type, dimids, begin)
    return variables, var_attrs, global_attrs
