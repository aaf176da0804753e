"""Minimal FlatBuffers builder + reader (the subset FlatGeobuf needs).

Implemented from the public FlatBuffers binary format specification
(google/flatbuffers internals docs): buffers are built back-to-front;
tables start with an int32 soffset to their vtable; vtables are uint16
arrays [vtable_bytes, table_bytes, field0_off, field1_off, ...] where
field offsets are relative to the table start (0 = field absent);
vectors are a uint32 count followed by elements; strings are a uint32
length + bytes + NUL; all scalars little-endian, aligned to their size.

The environment has no ``flatbuffers`` package, so this stands in for
it — only what sources/fgb.py uses: scalar/offset table fields, scalar
vectors, string fields, vectors of table offsets.
"""

from __future__ import annotations

import struct


class Builder:
    """Back-to-front FlatBuffers builder. ``self.data`` holds the TAIL
    of the final buffer; object 'locations' are distances from the
    buffer end (grow as data is prepended)."""

    def __init__(self):
        self.data = bytearray()
        self.minalign = 1
        self._vtable = None
        self._object_end = 0

    # -- low-level ----------------------------------------------------

    def _pos(self) -> int:
        return len(self.data)

    def _pad(self, n: int) -> None:
        if n:
            self.data[:0] = b"\x00" * n

    def _prep(self, size: int, additional: int) -> None:
        """Pad so the next ``size``-byte scalar written after
        ``additional`` more bytes lands size-aligned (relative to the
        buffer end; finish() aligns the total so front-relative
        positions align too)."""
        if size > self.minalign:
            self.minalign = size
        need = (-(len(self.data) + additional)) % size
        self._pad(need)

    def _place(self, fmt: str, value) -> None:
        self.data[:0] = struct.pack("<" + fmt, value)

    def prepend_scalar(self, fmt: str, size: int, value) -> None:
        self._prep(size, 0)
        self._place(fmt, value)

    def prepend_uoffset(self, loc: int) -> None:
        """Write a uoffset32 pointing at an object previously finished
        at location ``loc``."""
        self._prep(4, 0)
        if loc > self._pos():
            raise ValueError("offset target not yet written")
        self._place("I", self._pos() - loc + 4)

    # -- strings / vectors ---------------------------------------------

    def create_string(self, s) -> int:
        raw = s.encode("utf-8") if isinstance(s, str) else bytes(s)
        self._prep(4, len(raw) + 1)
        self.data[:0] = raw + b"\x00"
        self._place("I", len(raw))
        return self._pos()

    def create_scalar_vector(self, fmt: str, size: int, values) -> int:
        """Vector of same-size scalars (doubles, uint32s, bytes...)."""
        n = len(values)
        self._prep(4, size * n)
        self._prep(size, size * n)
        if fmt == "B":
            self.data[:0] = bytes(values)
        else:
            self.data[:0] = struct.pack(f"<{n}{fmt}", *values)
        self._place("I", n)
        return self._pos()

    def create_offset_vector(self, locs) -> int:
        """Vector of uoffsets to already-finished tables."""
        self._prep(4, 4 * len(locs))
        for loc in reversed(locs):
            self.prepend_uoffset(loc)
        self._place("I", len(locs))
        return self._pos()

    # -- tables ---------------------------------------------------------

    def start_table(self, num_fields: int) -> None:
        if self._vtable is not None:
            raise RuntimeError("nested table construction")
        self._vtable = [0] * num_fields
        self._object_end = self._pos()

    def _slot(self, idx: int) -> None:
        self._vtable[idx] = self._pos()

    def add_scalar(self, idx: int, fmt: str, size: int, value, default) -> None:
        if value == default:
            return
        self.prepend_scalar(fmt, size, value)
        self._slot(idx)

    def add_offset(self, idx: int, loc) -> None:
        if loc is None:
            return
        self.prepend_uoffset(loc)
        self._slot(idx)

    def end_table(self) -> int:
        vtable, self._vtable = self._vtable, None
        # placeholder soffset, patched below
        self._prep(4, 0)
        self._place("i", 0)
        table_pos = self._pos()
        # trim trailing absent fields
        while vtable and vtable[-1] == 0:
            vtable.pop()
        for off in reversed(vtable):
            self.prepend_scalar("H", 2, (table_pos - off) if off else 0)
        self.prepend_scalar("H", 2, table_pos - self._object_end)
        self.prepend_scalar("H", 2, (len(vtable) + 2) * 2)
        vt_pos = self._pos()
        # patch the table's soffset: reader does vtable = table - soffset
        i = len(self.data) - table_pos
        self.data[i : i + 4] = struct.pack("<i", vt_pos - table_pos)
        return table_pos

    # -- finish -----------------------------------------------------------

    def finish(self, root_loc: int, size_prefixed: bool = False) -> bytes:
        extra = 8 if size_prefixed else 4
        self._prep(self.minalign, extra)
        self.prepend_uoffset(root_loc)
        if size_prefixed:
            self._place("I", len(self.data))
        return bytes(self.data)


class Table:
    """Reader for one table inside a buffer."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos

    def _field_pos(self, slot: int):
        soffset = struct.unpack_from("<i", self.buf, self.pos)[0]
        vt = self.pos - soffset
        vt_size = struct.unpack_from("<H", self.buf, vt)[0]
        entry = 4 + 2 * slot
        if entry + 2 > vt_size:
            return None
        off = struct.unpack_from("<H", self.buf, vt + entry)[0]
        return self.pos + off if off else None

    def scalar(self, slot: int, fmt: str, default):
        p = self._field_pos(slot)
        if p is None:
            return default
        return struct.unpack_from("<" + fmt, self.buf, p)[0]

    def _indirect(self, p: int) -> int:
        return p + struct.unpack_from("<I", self.buf, p)[0]

    def string(self, slot: int):
        p = self._field_pos(slot)
        if p is None:
            return None
        sp = self._indirect(p)
        n = struct.unpack_from("<I", self.buf, sp)[0]
        return self.buf[sp + 4 : sp + 4 + n].decode("utf-8")

    def scalar_vector(self, slot: int, fmt: str, size: int):
        p = self._field_pos(slot)
        if p is None:
            return None
        vp = self._indirect(p)
        n = struct.unpack_from("<I", self.buf, vp)[0]
        return list(struct.unpack_from(f"<{n}{fmt}", self.buf, vp + 4))

    def bytes_vector(self, slot: int):
        p = self._field_pos(slot)
        if p is None:
            return None
        vp = self._indirect(p)
        n = struct.unpack_from("<I", self.buf, vp)[0]
        return self.buf[vp + 4 : vp + 4 + n]

    def table(self, slot: int):
        p = self._field_pos(slot)
        if p is None:
            return None
        return Table(self.buf, self._indirect(p))

    def table_vector(self, slot: int):
        p = self._field_pos(slot)
        if p is None:
            return None
        vp = self._indirect(p)
        n = struct.unpack_from("<I", self.buf, vp)[0]
        out = []
        for i in range(n):
            ep = vp + 4 + 4 * i
            out.append(Table(self.buf, self._indirect(ep)))
        return out


def root_table(buf: bytes, size_prefixed: bool = False) -> Table:
    base = 4 if size_prefixed else 0
    root = base + struct.unpack_from("<I", buf, base)[0]
    return Table(buf, root)
