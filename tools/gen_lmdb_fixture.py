"""Generate golden LMDB fixtures for tests/test_lmdb.py, independently of
equiformer_tpu/data/lmdb_format.py.

The container has neither the ``lmdb`` wheel nor liblmdb (verified: no
liblmdb*.so, no lmdb.h, no file on disk with the 0xBEEFC0DE magic), so a
real-liblmdb-produced file cannot be generated here.  Instead this script
assembles LMDB files **byte by byte from the published on-disk format**
(lmdb.h / mdb.c, LMDB 0.9.x data-format version 1) with page layouts that
liblmdb produces in real incremental use but the repo's bulk ``LmdbWriter``
never emits:

* pages physically out of key order (liblmdb allocates pages in dirty order,
  so a right-most leaf can have a lower pgno than the left-most),
* node data within a page placed in non-monotone physical order (liblmdb
  keeps only the pointer array sorted; heap placement follows insertion
  history),
* meta page 1 as the live meta (txnid 2 > 1) with meta 0 pointing at a STALE
  root from an earlier txn — a reader that picks the wrong meta sees old data,
* an overflow chain sitting *between* leaf pages,
* a non-4096 page size (8192) carried in the free-DB md_pad field,
* an empty value, duplicate-length keys, and a value exactly at the
  overflow threshold boundary.

Every struct offset is written from the spec independently of lmdb_format.py
(grep: this file shares no helpers with it).  The fixtures are committed as
hex in tests/fixtures/ so the test suite parses bytes it did not produce.

Field layout used (little-endian, 64-bit, from lmdb.h):
  MDB_page hdr (16B): pgno u64 | pad u16 | flags u16 | lower u16 | upper u16
                      (overflow pages reuse lower|upper<<16 as the page count)
  MDB_meta (after hdr): magic u32 | version u32 | fixed-addr u64 | mapsize u64
                      | MDB_db free | MDB_db main | last_pg u64 | txnid u64
  MDB_db (48B): pad u32 | flags u16 | depth u16 | branch u64 | leaf u64
                | overflow u64 | entries u64 | root u64
  MDB_node (8B + key + data): lo u16 | hi u16 | flags u16 | ksize u16
                      branch: lo|hi<<16|flags<<32 = child pgno, data absent
                      leaf:   lo|hi<<16 = data size; F_BIGDATA -> data is
                              a u64 overflow pgno
"""

import os
import struct

MAGIC = 0xBEEFC0DE
VERSION = 1
HDR = 16
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
INVALID = 0xFFFFFFFFFFFFFFFF


def page_hdr(pgno, flags, lower, upper):
    return struct.pack("<QHHHH", pgno, 0, flags, lower, upper)


def leaf_node(key, val, bigdata_pgno=None):
    if bigdata_pgno is not None:
        return (
            struct.pack("<HHHH", len(val) & 0xFFFF, len(val) >> 16, F_BIGDATA,
                        len(key))
            + key
            + struct.pack("<Q", bigdata_pgno)
        )
    return (
        struct.pack("<HHHH", len(val) & 0xFFFF, len(val) >> 16, 0, len(key))
        + key
        + val
    )


def branch_node(key, child_pgno):
    return (
        struct.pack("<HHHH", child_pgno & 0xFFFF, (child_pgno >> 16) & 0xFFFF,
                    (child_pgno >> 32) & 0xFFFF, len(key))
        + key
    )


def build_page(pgno, flags, nodes, psize, order=None):
    """Pack nodes into one page.  ``order`` permutes the *physical* heap
    placement (liblmdb's heap follows insertion history, not key order);
    the pointer array stays in key order as required."""
    order = order or list(range(len(nodes)))
    page = bytearray(psize)
    upper = psize
    offsets = {}
    for i in order:
        nb = nodes[i]
        sz = len(nb) + (len(nb) & 1)
        upper -= sz
        page[upper : upper + len(nb)] = nb
        offsets[i] = upper
    lower = HDR + 2 * len(nodes)
    page[:HDR] = page_hdr(pgno, flags, lower, upper)
    for i in range(len(nodes)):
        struct.pack_into("<H", page, HDR + 2 * i, offsets[i])
    return bytes(page)


def overflow_chain(pgno, val, psize):
    npages = -(-(len(val) + HDR) // psize)
    buf = bytearray(npages * psize)
    buf[:HDR] = page_hdr(pgno, P_OVERFLOW, npages & 0xFFFF, npages >> 16)
    buf[HDR : HDR + len(val)] = val
    return bytes(buf), npages


def db_record(pad, flags, depth, branch, leaf, overflow, entries, root):
    return struct.pack("<IHHQQQQQ", pad, flags, depth, branch, leaf, overflow,
                       entries, root)


def meta_page(pgno, psize, txnid, main_db, last_pg):
    body = (
        struct.pack("<IIQQ", MAGIC, VERSION, 0, max((last_pg + 1) * psize, 1 << 20))
        + db_record(psize, 0, 0, 0, 0, 0, 0, INVALID)  # free DB (md_pad=psize)
        + main_db
        + struct.pack("<QQ", last_pg, txnid)
    )
    return page_hdr(pgno, P_META, 0, 0) + body + b"\0" * (psize - HDR - len(body))


def build_fixture_main(psize=8192):
    """Three leaves + one branch + one 2-page overflow value, pages laid out
    physically as 2=branch(root), 3=leaf C(third), 4..5=overflow, 6=leaf A
    (first), 7=leaf B(second) — i.e. *not* in key order."""
    items_a = [
        (b"a-key", b"alpha" * 10),
        (b"b", b""),  # empty value
        (b"b0", b"x" * ((psize - HDR) // 4)),  # exactly at the nodemax bound
    ]
    big_val = bytes((i * 7 + 3) % 251 for i in range(psize + psize // 2))
    items_b = [
        (b"c-big", big_val),  # overflow (2 pages)
        (b"d\x00nul", b"value-with-nul-key"),
    ]
    items_c = [
        (b"e-key", b"echo"),
        (b"f-key-longer-than-others", b"foxtrot"),
    ]
    ROOT, LEAF_C, OV, LEAF_A, LEAF_B = 2, 3, 4, 6, 7

    ov_bytes, ov_n = overflow_chain(OV, big_val, psize)
    assert ov_n == 2

    leaf_a = build_page(
        LEAF_A, P_LEAF, [leaf_node(k, v) for k, v in items_a], psize,
        order=[2, 0, 1],  # heap placement not in key order
    )
    leaf_b = build_page(
        LEAF_B, P_LEAF,
        [leaf_node(items_b[0][0], items_b[0][1], bigdata_pgno=OV),
         leaf_node(*items_b[1])],
        psize,
        order=[1, 0],
    )
    leaf_c = build_page(
        LEAF_C, P_LEAF, [leaf_node(k, v) for k, v in items_c], psize
    )
    root = build_page(
        ROOT, P_BRANCH,
        [branch_node(b"", LEAF_A),  # first separator key is empty
         branch_node(items_b[0][0], LEAF_B),
         branch_node(items_c[0][0], LEAF_C)],
        psize,
        order=[2, 1, 0],
    )

    entries = len(items_a) + len(items_b) + len(items_c)
    main_live = db_record(0, 0, 2, 1, 3, 2, entries, ROOT)
    # stale meta 0: an "earlier txn" whose root was leaf A alone
    main_stale = db_record(0, 0, 1, 0, 1, 0, len(items_a), LEAF_A)

    blob = bytearray((LEAF_B + 1) * psize)
    blob[0:psize] = meta_page(0, psize, 1, main_stale, LEAF_A)
    blob[psize : 2 * psize] = meta_page(1, psize, 2, main_live, LEAF_B)
    for pgno, data in ((ROOT, root), (LEAF_C, leaf_c), (LEAF_A, leaf_a),
                      (LEAF_B, leaf_b)):
        blob[pgno * psize : pgno * psize + psize] = data
    blob[OV * psize : OV * psize + len(ov_bytes)] = ov_bytes

    expected = dict(items_a + items_b + items_c)
    return bytes(blob), expected


def build_fixture_4k():
    """psize=4096 single-leaf file where meta 0 is the live one (txnid 5>4)
    and the dead meta 1 points at an invalid root."""
    psize = 4096
    items = [(b"k%03d" % i, b"v" * (i * 7)) for i in range(6)]
    LEAF = 2
    leaf = build_page(LEAF, P_LEAF, [leaf_node(k, v) for k, v in items], psize,
                      order=[3, 1, 5, 0, 4, 2])
    main_live = db_record(0, 0, 1, 0, 1, 0, len(items), LEAF)
    main_dead = db_record(0, 0, 0, 0, 0, 0, 0, INVALID)
    blob = bytearray((LEAF + 1) * psize)
    blob[0:psize] = meta_page(0, psize, 5, main_live, LEAF)
    blob[psize : 2 * psize] = meta_page(1, psize, 4, main_dead, LEAF)
    blob[LEAF * psize :] = leaf
    return bytes(blob), dict(items)


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
    os.makedirs(out_dir, exist_ok=True)
    for name, (blob, expected) in (
        ("lmdb_golden_8k", build_fixture_main(8192)),
        ("lmdb_golden_4k", build_fixture_4k()),
    ):
        path = os.path.join(out_dir, name + ".hex")
        with open(path, "w") as f:
            hx = blob.hex()
            f.write("\n".join(hx[i : i + 120] for i in range(0, len(hx), 120)))
            f.write("\n")
        print(name, len(blob), "bytes,", len(expected), "entries ->", path)


if __name__ == "__main__":
    main()
