"""First-party LMDB file-format reader/writer (no liblmdb dependency).

The OC20 datasets ship as LMDB files (reference
oc20/trainer/lmdb_dataset.py:46-177 reads them via the ``lmdb`` wheel, which
is not in this image).  LMDB's on-disk format is a memory-mapped copy-on-write
B+tree (symas.com/lmdb, mdb.c); this module implements the subset needed to
*read* standard single-file ("subdir=False") databases and to *write* valid
read-optimized ones for tests and offline conversion:

* meta pages 0/1 (``MDB_meta``; the live one has the larger txnid),
* branch/leaf pages with the ``MDB_node`` layout,
* ``F_BIGDATA`` values on contiguous overflow-page chains.

Format constants match lmdb.h / mdb.c (LMDB 0.9.x data-format version 1).
Only the default flags used by the OCP writers are supported: byte-ordered
keys, no dupsort, no named sub-databases.
"""

from __future__ import annotations

import io
import os
import struct
from typing import Iterator, Optional, Tuple

MAGIC = 0xBEEFC0DE
DATA_VERSION = 1
PAGEHDRSZ = 16

P_BRANCH = 0x01
P_LEAF = 0x02
P_OVERFLOW = 0x04
P_META = 0x08
P_LEAF2 = 0x20

F_BIGDATA = 0x01

P_INVALID = 0xFFFFFFFFFFFFFFFF

# MDB_db: md_pad u32, md_flags u16, md_depth u16, md_branch_pages u64,
# md_leaf_pages u64, md_overflow_pages u64, md_entries u64, md_root u64
_DB = struct.Struct("<IHHQQQQQ")
# MDB_meta: magic u32, version u32, address u64, mapsize u64, dbs[2],
# last_pg u64, txnid u64
_META_HEAD = struct.Struct("<IIQQ")
_META_TAIL = struct.Struct("<QQ")
# MDB_page header: pgno u64, pad u16, flags u16, lower u16, upper u16
_PAGE = struct.Struct("<QHHHH")
# MDB_node header: lo u16, hi u16, flags u16, ksize u16
_NODE = struct.Struct("<HHHH")


class LmdbError(ValueError):
    pass


class LmdbReader:
    """Read-only access to a single-file LMDB main database.

    ``get(key)`` and ``items()`` mirror the tiny surface the OC20 dataset
    needs (``txn.get`` / ``txn.stat()['entries']``).
    """

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        self._size = os.fstat(self._f.fileno()).st_size
        meta0 = self._read_meta(0, psize_guess=4096)
        # psize comes from mm_dbs[0].md_pad (mdb.c: #define mm_psize)
        self.psize = meta0["psize"]
        m0 = self._read_meta(0, self.psize)
        m1 = self._read_meta(1, self.psize)
        self.meta = m0 if m0["txnid"] >= m1["txnid"] else m1
        self.entries = self.meta["main"]["entries"]
        if self.meta["main"]["flags"] & 0x04:  # MDB_DUPSORT
            raise LmdbError("dupsort databases are not supported")

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    # ------------------------------------------------------------- internals
    def _read_meta(self, pgno: int, psize_guess: int):
        self._f.seek(pgno * psize_guess)
        raw = self._f.read(psize_guess)
        if len(raw) < PAGEHDRSZ + _META_HEAD.size + 2 * _DB.size + _META_TAIL.size:
            raise LmdbError(f"{self.path}: truncated meta page {pgno}")
        _, _, flags, _, _ = _PAGE.unpack_from(raw, 0)
        if not flags & P_META:
            raise LmdbError(f"{self.path}: page {pgno} is not a meta page")
        off = PAGEHDRSZ
        magic, version, _addr, mapsize = _META_HEAD.unpack_from(raw, off)
        if magic != MAGIC:
            raise LmdbError(f"{self.path}: bad LMDB magic {magic:#x}")
        if version != DATA_VERSION:
            raise LmdbError(f"{self.path}: unsupported data version {version}")
        off += _META_HEAD.size
        free = _DB.unpack_from(raw, off)
        off += _DB.size
        main = _DB.unpack_from(raw, off)
        off += _DB.size
        last_pg, txnid = _META_TAIL.unpack_from(raw, off)
        def db(t):
            return dict(
                pad=t[0], flags=t[1], depth=t[2], branch=t[3], leaf=t[4],
                overflow=t[5], entries=t[6], root=t[7],
            )
        return dict(
            psize=free[0] or 4096, txnid=txnid, mapsize=mapsize,
            last_pg=last_pg, free=db(free), main=db(main),
        )

    def _page(self, pgno: int) -> bytes:
        if pgno == P_INVALID:
            raise LmdbError("invalid page reference")
        self._f.seek(pgno * self.psize)
        return self._f.read(self.psize)

    @staticmethod
    def _numkeys(page: bytes) -> int:
        lower = _PAGE.unpack_from(page, 0)[3]
        return (lower - PAGEHDRSZ) >> 1

    @staticmethod
    def _node_at(page: bytes, i: int) -> Tuple[int, bytes, int, int]:
        """-> (flags, key, lo|hi<<16 value-size-or-pgno-lo, node offset)"""
        (ptr,) = struct.unpack_from("<H", page, PAGEHDRSZ + 2 * i)
        lo, hi, flags, ksize = _NODE.unpack_from(page, ptr)
        key = page[ptr + 8 : ptr + 8 + ksize]
        return flags, key, lo | (hi << 16), ptr

    def _branch_child(self, page: bytes, i: int) -> int:
        (ptr,) = struct.unpack_from("<H", page, PAGEHDRSZ + 2 * i)
        lo, hi, flags, _ = _NODE.unpack_from(page, ptr)
        return lo | (hi << 16) | (flags << 32)  # 48-bit pgno (mdb.c NODEPGNO)

    def _leaf_value(self, page: bytes, i: int) -> bytes:
        flags, key, dsize, ptr = self._node_at(page, i)
        data_off = ptr + 8 + len(key)
        if flags & F_BIGDATA:
            # value lives on a contiguous overflow-page chain; data starts
            # after the first page's header and runs across page boundaries
            (ovpg,) = struct.unpack_from("<Q", page, data_off)
            self._f.seek(ovpg * self.psize + PAGEHDRSZ)
            return self._f.read(dsize)
        return page[data_off : data_off + dsize]

    # ------------------------------------------------------------------ API
    def get(self, key: bytes) -> Optional[bytes]:
        root = self.meta["main"]["root"]
        if root == P_INVALID:
            return None
        page = self._page(root)
        while _PAGE.unpack_from(page, 0)[2] & P_BRANCH:
            n = self._numkeys(page)
            child_i = n - 1
            for i in range(1, n):  # node 0 has an empty separator key
                _, k, _, _ = self._node_at(page, i)
                if key < k:
                    child_i = i - 1
                    break
            else:
                child_i = n - 1
            page = self._page(self._branch_child(page, child_i))
        for i in range(self._numkeys(page)):
            flags, k, _, _ = self._node_at(page, i)
            if k == key:
                return self._leaf_value(page, i)
        return None

    def items(self) -> Iterator[Tuple[bytes, bytes]]:
        root = self.meta["main"]["root"]
        if root == P_INVALID:
            return
        stack = [root]
        # depth-first, left-to-right = key order
        while stack:
            page = self._page(stack.pop())
            flags = _PAGE.unpack_from(page, 0)[2]
            if flags & P_BRANCH:
                kids = [
                    self._branch_child(page, i)
                    for i in range(self._numkeys(page))
                ]
                stack.extend(reversed(kids))
            elif flags & P_LEAF:
                for i in range(self._numkeys(page)):
                    _, k, _, _ = self._node_at(page, i)
                    yield k, self._leaf_value(page, i)
            else:
                raise LmdbError(f"unexpected page flags {flags:#x} in tree")


def _even(n: int) -> int:
    return n + (n & 1)


class LmdbWriter:
    """Bulk writer: builds a read-optimized LMDB file from sorted items.

    Produces the exact on-disk structure LmdbReader (and liblmdb) parses:
    meta pages 0/1, packed leaf pages, a branch hierarchy, and overflow
    chains for large values.  Intended for tests and offline dataset
    conversion — not for incremental transactional use.
    """

    def __init__(self, path: str, psize: int = 4096):
        self.path = path
        self.psize = psize
        self._nodemax = (psize - PAGEHDRSZ) // 4  # values above go to overflow

    def write(self, items):
        """items: iterable of (key: bytes, value: bytes); keys are sorted
        bytewise (memcmp order) like LMDB's default comparator."""
        items = sorted(items, key=lambda kv: kv[0])
        psize = self.psize
        pages = {}  # pgno -> bytearray
        next_pg = 2  # 0/1 are the meta pages

        def alloc(n=1):
            nonlocal next_pg
            pg = next_pg
            next_pg += n
            return pg

        n_overflow = 0
        # ---- leaf level: pack nodes (ptrs grow up, node data grows down)
        leaf_entries = []  # (first_key, pgno)
        cur_nodes = []  # (key, node_bytes)
        cur_used = 0

        def flush_leaf():
            nonlocal cur_nodes, cur_used
            if not cur_nodes:
                return
            pg = alloc()
            page = bytearray(psize)
            upper = psize
            ptrs = []
            for _, nb in cur_nodes:
                upper -= _even(len(nb))
                page[upper : upper + len(nb)] = nb
                ptrs.append(upper)
            lower = PAGEHDRSZ + 2 * len(cur_nodes)
            _PAGE.pack_into(page, 0, pg, 0, P_LEAF, lower, upper)
            for i, p in enumerate(ptrs):
                struct.pack_into("<H", page, PAGEHDRSZ + 2 * i, p)
            pages[pg] = page
            leaf_entries.append((cur_nodes[0][0], pg))
            cur_nodes = []
            cur_used = 0

        for key, val in items:
            if len(val) > self._nodemax:
                ovpages = -(-(len(val) + PAGEHDRSZ) // psize)
                ovpg = alloc(ovpages)
                n_overflow += ovpages
                buf = bytearray(ovpages * psize)
                _PAGE.pack_into(buf, 0, ovpg, 0, P_OVERFLOW, ovpages & 0xFFFF,
                                (ovpages >> 16) & 0xFFFF)
                buf[PAGEHDRSZ : PAGEHDRSZ + len(val)] = val
                pages[ovpg] = buf
                node = bytearray(_NODE.size + len(key) + 8)
                _NODE.pack_into(node, 0, len(val) & 0xFFFF, len(val) >> 16,
                                F_BIGDATA, len(key))
                node[8 : 8 + len(key)] = key
                struct.pack_into("<Q", node, 8 + len(key), ovpg)
            else:
                node = bytearray(_NODE.size + len(key) + len(val))
                _NODE.pack_into(node, 0, len(val) & 0xFFFF, len(val) >> 16,
                                0, len(key))
                node[8 : 8 + len(key)] = key
                node[8 + len(key) :] = val
            need = _even(len(node)) + 2
            if cur_nodes and PAGEHDRSZ + cur_used + need > psize:
                flush_leaf()
            cur_nodes.append((bytes(key), bytes(node)))
            cur_used += need
        flush_leaf()

        # ---- branch levels
        n_branch = 0
        level = leaf_entries
        depth = 1
        while len(level) > 1:
            next_level = []
            i = 0
            while i < len(level):
                pg = alloc()
                n_branch += 1
                page = bytearray(psize)
                upper = psize
                ptrs = []
                taken = []
                used = 0
                while i < len(level):
                    key, child = level[i]
                    k = b"" if not taken else key  # first separator is empty
                    node = bytearray(_NODE.size + len(k))
                    _NODE.pack_into(
                        node, 0, child & 0xFFFF, (child >> 16) & 0xFFFF,
                        (child >> 32) & 0xFFFF, len(k),
                    )
                    node[8:] = k
                    need = _even(len(node)) + 2
                    if taken and PAGEHDRSZ + used + need > psize:
                        break
                    upper -= _even(len(node))
                    page[upper : upper + len(node)] = node
                    ptrs.append(upper)
                    taken.append(level[i])
                    used += need
                    i += 1
                lower = PAGEHDRSZ + 2 * len(ptrs)
                _PAGE.pack_into(page, 0, pg, 0, P_BRANCH, lower, upper)
                for j, p in enumerate(ptrs):
                    struct.pack_into("<H", page, PAGEHDRSZ + 2 * j, p)
                pages[pg] = page
                next_level.append((taken[0][0], pg))
            level = next_level
            depth += 1

        root = level[0][1] if level else P_INVALID
        n_leaf = len(leaf_entries)
        entries = len(items)

        # ---- metas
        def meta_page(pgno, txnid):
            page = bytearray(psize)
            _PAGE.pack_into(page, 0, pgno, 0, P_META, 0, 0)
            off = PAGEHDRSZ
            _META_HEAD.pack_into(page, off, MAGIC, DATA_VERSION, 0,
                                 max(next_pg * psize, 1 << 20))
            off += _META_HEAD.size
            # free db: empty; md_pad of the free db carries the page size
            _DB.pack_into(page, off, psize, 0, 0, 0, 0, 0, 0, P_INVALID)
            off += _DB.size
            _DB.pack_into(page, off, 0, 0, depth if entries else 0, n_branch,
                          n_leaf, n_overflow, entries, root)
            off += _DB.size
            _META_TAIL.pack_into(page, off, next_pg - 1, txnid)
            return page

        with open(self.path, "wb") as f:
            f.write(meta_page(0, 0))
            f.write(meta_page(1, 1))
            pg = 2
            while pg < next_pg:
                if pg in pages:
                    buf = bytes(pages[pg])
                    f.write(buf)
                    pg += len(buf) // psize  # overflow chains span pages
                else:
                    f.write(b"\0" * psize)
                    pg += 1
