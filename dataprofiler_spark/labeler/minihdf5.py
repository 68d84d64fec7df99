"""Minimal read-only HDF5 parser — just enough to load Keras weight files.

The environment has no h5py/pytables/TensorFlow, but the reference ships
its trained CNN labeler as a ``model.keras`` zip whose ``model.weights.h5``
is an ordinary HDF5 file (superblock v0, symbol-table groups, contiguous
little-endian float32 datasets — the exact subset h5py writes by default).
This module implements that subset of the public HDF5 File Format
Specification (HDF Group, "HDF5 File Format Specification Version 2.0"):

* superblock v0/v1 (v2/v3 not needed for h5py-default files)
* v1 object headers incl. continuation messages
* v1 group B-trees + SNOD symbol-table nodes + local heaps
* dataspace (v1/v2), datatype (fixed-point + IEEE float, little-endian),
  data layout v3 (contiguous and compact; chunked unsupported)

Out of scope (raises): chunked/filtered datasets, big-endian types,
v2 B-trees / fractal heaps ("new-style" groups), external storage.

Returns numpy arrays keyed by absolute path, e.g.
``/layers/conv1d/vars/0``.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_UNDEF = 0xFFFFFFFFFFFFFFFF


@dataclass
class _Dataset:
    shape: tuple
    dtype: np.dtype
    data_offset: int
    data_size: int
    compact_data: bytes | None = None


class MiniHDF5:
    def __init__(self, data: bytes):
        self.b = data
        if data[:8] != b"\x89HDF\r\n\x1a\n":
            raise ValueError("not an HDF5 file")
        sb_ver = data[8]
        if sb_ver > 1:
            raise NotImplementedError(f"superblock v{sb_ver}")
        self.off_size = data[13]
        self.len_size = data[14]
        if (self.off_size, self.len_size) != (8, 8):
            raise NotImplementedError("non-8-byte offsets/lengths")
        # superblock v0: root symbol-table entry at byte 24 + 4*8
        root_entry_off = 24 + 32 + (4 if sb_ver == 1 else 0)
        self.root_header = struct.unpack_from("<Q", data, root_entry_off + 8)[0]
        self.datasets: dict[str, _Dataset] = {}
        self._walk_group(self.root_header, "")

    # -- low-level readers --------------------------------------------------

    def _u(self, off: int, size: int) -> int:
        return int.from_bytes(self.b[off:off + size], "little")

    # -- object headers -----------------------------------------------------

    def _messages(self, header_addr: int):
        """Yield (msg_type, body_offset, body_size) for a v1 object header,
        following continuation messages."""
        ver = self.b[header_addr]
        if ver != 1:
            raise NotImplementedError(f"object header v{ver} at {header_addr}")
        nmsgs = struct.unpack_from("<H", self.b, header_addr + 2)[0]
        hdr_size = struct.unpack_from("<I", self.b, header_addr + 8)[0]
        blocks = [(header_addr + 16, hdr_size)]
        seen = 0
        while blocks and seen < nmsgs:
            off, size = blocks.pop(0)
            end = off + size
            while off + 8 <= end and seen < nmsgs:
                mtype, msize, _flags = struct.unpack_from("<HHB", self.b, off)
                body = off + 8
                if mtype == 0x0010:  # continuation
                    c_off = struct.unpack_from("<Q", self.b, body)[0]
                    c_len = struct.unpack_from("<Q", self.b, body + 8)[0]
                    blocks.append((c_off, c_len))
                else:
                    yield mtype, body, msize
                seen += 1
                off = body + msize

    # -- groups -------------------------------------------------------------

    def _walk_group(self, header_addr: int, path: str) -> None:
        btree = heap = None
        for mtype, body, _size in self._messages(header_addr):
            if mtype == 0x0011:  # symbol table message
                btree = struct.unpack_from("<Q", self.b, body)[0]
                heap = struct.unpack_from("<Q", self.b, body + 8)[0]
        if btree is None or btree == _UNDEF:
            return
        heap_data = self._local_heap_data(heap)
        for name_off, obj_addr in self._btree_entries(btree):
            name = self._heap_string(heap_data, name_off)
            child_path = f"{path}/{name}"
            if self._is_dataset(obj_addr):
                ds = self._read_dataset_meta(obj_addr)
                if ds is not None:
                    self.datasets[child_path] = ds
            else:
                self._walk_group(obj_addr, child_path)

    def _local_heap_data(self, heap_addr: int) -> int:
        if self.b[heap_addr:heap_addr + 4] != b"HEAP":
            raise ValueError("bad local heap signature")
        return struct.unpack_from("<Q", self.b, heap_addr + 24)[0]

    def _heap_string(self, heap_data: int, off: int) -> str:
        start = heap_data + off
        end = self.b.index(b"\x00", start)
        return self.b[start:end].decode("utf-8")

    def _btree_entries(self, addr: int):
        """Yield (heap_name_offset, object_header_addr) from a v1 group
        B-tree (internal nodes recurse, leaves point at SNOD nodes)."""
        sig = self.b[addr:addr + 4]
        if sig == b"SNOD":
            nsyms = struct.unpack_from("<H", self.b, addr + 6)[0]
            off = addr + 8
            for _ in range(nsyms):
                name_off = struct.unpack_from("<Q", self.b, off)[0]
                obj_addr = struct.unpack_from("<Q", self.b, off + 8)[0]
                yield name_off, obj_addr
                off += 40  # symbol table entry size (8+8+4+4+16)
            return
        if sig != b"TREE":
            raise ValueError(f"bad btree signature {sig!r} at {addr}")
        node_type = self.b[addr + 4]
        if node_type != 0:
            raise NotImplementedError("non-group btree")
        entries = struct.unpack_from("<H", self.b, addr + 6)[0]
        # keys/children: key0, child0, key1, child1, ... key_n
        off = addr + 8 + 16  # skip left/right sibling
        off += self.len_size  # key 0
        for _ in range(entries):
            child = struct.unpack_from("<Q", self.b, off)[0]
            off += self.off_size + self.len_size  # child + next key
            yield from self._btree_entries(child)

    # -- datasets -----------------------------------------------------------

    def _is_dataset(self, header_addr: int) -> bool:
        return any(m == 0x0008 for m, _b, _s in self._messages(header_addr))

    def _read_dataset_meta(self, header_addr: int) -> _Dataset | None:
        shape: tuple | None = None
        dtype: np.dtype | None = None
        layout: tuple | None = None
        compact: bytes | None = None
        for mtype, body, size in self._messages(header_addr):
            if mtype == 0x0001:  # dataspace
                ver = self.b[body]
                rank = self.b[body + 1]
                if ver == 1:
                    dims_off = body + 8
                else:  # v2
                    dims_off = body + 4
                shape = tuple(
                    struct.unpack_from("<Q", self.b, dims_off + 8 * i)[0]
                    for i in range(rank))
            elif mtype == 0x0003:  # datatype
                cls_ver = self.b[body]
                dt_class = cls_ver & 0x0F
                bits0 = self.b[body + 1]
                dt_size = struct.unpack_from("<I", self.b, body + 4)[0]
                if bits0 & 0x01:
                    raise NotImplementedError("big-endian datatype")
                if dt_class == 1:  # IEEE float
                    dtype = np.dtype(f"<f{dt_size}")
                elif dt_class == 0:  # fixed-point
                    signed = bool(self.b[body + 1] & 0x08)
                    dtype = np.dtype(f"<{'i' if signed else 'u'}{dt_size}")
                else:
                    raise NotImplementedError(f"datatype class {dt_class}")
            elif mtype == 0x0008:  # data layout
                ver = self.b[body]
                if ver != 3:
                    raise NotImplementedError(f"layout v{ver}")
                lclass = self.b[body + 1]
                if lclass == 1:  # contiguous
                    addr = struct.unpack_from("<Q", self.b, body + 2)[0]
                    dsize = struct.unpack_from("<Q", self.b, body + 10)[0]
                    layout = (addr, dsize)
                elif lclass == 0:  # compact
                    dsize = struct.unpack_from("<H", self.b, body + 2)[0]
                    compact = self.b[body + 4:body + 4 + dsize]
                    layout = (0, dsize)
                else:
                    raise NotImplementedError("chunked layout")
        if shape is None or dtype is None or layout is None:
            return None
        return _Dataset(shape=shape, dtype=dtype, data_offset=layout[0],
                        data_size=layout[1], compact_data=compact)

    def array(self, path: str) -> np.ndarray:
        ds = self.datasets[path]
        if ds.compact_data is not None:
            raw = ds.compact_data
        else:
            if ds.data_offset == _UNDEF:
                raise ValueError(f"dataset {path} has no allocated data")
            raw = self.b[ds.data_offset:ds.data_offset + ds.data_size]
        return np.frombuffer(raw, dtype=ds.dtype).reshape(ds.shape).copy()

    def arrays(self) -> dict[str, np.ndarray]:
        return {p: self.array(p) for p in self.datasets}


def load_weights(h5_bytes: bytes) -> dict[str, np.ndarray]:
    """All datasets in the file as {absolute_path: ndarray}."""
    return MiniHDF5(h5_bytes).arrays()
