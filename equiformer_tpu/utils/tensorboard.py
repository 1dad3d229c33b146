"""Self-contained TensorBoard event-file writer (no tensorboard dependency).

The analog of the reference's TensorboardLogger
(oc20 ocpmodels logger registry, base_trainer_oc20.py:225-236): training
metrics are exported in the TFEvents format TensorBoard reads natively.

The format is public and stable: a TFRecord stream of serialized
``tensorflow.Event`` protos —

  record  := uint64-LE length | uint32-LE masked_crc32c(length)
           | data | uint32-LE masked_crc32c(data)
  Event   := 1: wall_time (double)  2: step (int64)
             3: file_version (string, first record only)
             5: Summary
  Summary := 1: repeated Value { 1: tag (string), 2: simple_value (float) }

Both the protobuf wire encoding and the CRC32C (Castagnoli) checksum are
implemented here from the public specs, so the exporter needs neither
tensorflow nor the tensorboard wheel.  The output is validated against the
real consumer: tests/test_oc20.py::test_tensorboard_real_consumer parses
files written here with tensorboard's own EventFileLoader (which verifies
the masked CRC32C of every record).

Also usable as a CLI to export an existing metrics.jsonl run directory:

  python -m equiformer_tpu.utils.tensorboard runs/qm9  # -> runs/qm9/tb/
"""

from __future__ import annotations

import json
import os
import socket
import struct
import time
from typing import Dict, Optional

from ..train.registry import register_logger

# ---------------------------------------------------------------- crc32c ---

_CRC_TABLE = []


def _crc_table():
    global _CRC_TABLE
    if not _CRC_TABLE:
        poly = 0x82F63B78  # Castagnoli, reflected
        table = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            table.append(c)
        _CRC_TABLE = table
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------------- protobuf ----


def _varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1  # int64 two's complement for negatives
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field_double(num: int, value: float) -> bytes:
    return _varint(num << 3 | 1) + struct.pack("<d", value)


def _field_float(num: int, value: float) -> bytes:
    return _varint(num << 3 | 5) + struct.pack("<f", value)


def _field_varint(num: int, value: int) -> bytes:
    return _varint(num << 3 | 0) + _varint(value)


def _field_bytes(num: int, value: bytes) -> bytes:
    return _varint(num << 3 | 2) + _varint(len(value)) + value


def _scalar_event(step: int, wall_time: float, scalars: Dict[str, float]) -> bytes:
    summary = b"".join(
        _field_bytes(
            1,
            _field_bytes(1, tag.encode()) + _field_float(2, float(val)),
        )
        for tag, val in scalars.items()
    )
    return (
        _field_double(1, wall_time)
        + _field_varint(2, int(step))
        + _field_bytes(5, summary)
    )


def _version_event(wall_time: float) -> bytes:
    return _field_double(1, wall_time) + _field_bytes(3, b"brain.Event:2")


# --------------------------------------------------------------- writer ----


@register_logger("tensorboard")
class TensorboardWriter:
    """Append scalar events to an events.out.tfevents file in ``logdir``."""

    def __init__(self, logdir: str, enabled: bool = True):
        self.enabled = enabled
        self._fh = None
        if not enabled:
            return
        os.makedirs(logdir, exist_ok=True)
        fname = "events.out.tfevents.%010d.%s" % (
            int(time.time()),
            socket.gethostname(),
        )
        self._fh = open(os.path.join(logdir, fname), "wb")
        self._write_record(_version_event(time.time()))

    def _write_record(self, data: bytes):
        header = struct.pack("<Q", len(data))
        self._fh.write(header)
        self._fh.write(struct.pack("<I", _masked_crc(header)))
        self._fh.write(data)
        self._fh.write(struct.pack("<I", _masked_crc(data)))

    def add_scalars(self, step: int, scalars: Dict[str, float], wall_time: Optional[float] = None):
        if not self.enabled or not scalars:
            return
        clean = {k: float(v) for k, v in scalars.items()
                 if isinstance(v, (int, float))}
        if clean:
            self._write_record(_scalar_event(step, wall_time or time.time(), clean))
            self._fh.flush()

    def add_scalar(self, tag: str, value: float, step: int):
        self.add_scalars(step, {tag: value})

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_events(path: str):
    """Parse a TFEvents file back into (step, wall_time, {tag: value}) tuples.

    Used by tests to round-trip the writer, and handy for debugging runs
    without a tensorboard install."""
    out = []
    with open(path, "rb") as fh:
        while True:
            header = fh.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", fh.read(4))
            if hcrc != _masked_crc(header):
                raise ValueError("corrupt TFRecord header crc")
            data = fh.read(length)
            (dcrc,) = struct.unpack("<I", fh.read(4))
            if dcrc != _masked_crc(data):
                raise ValueError("corrupt TFRecord data crc")
            out.append(_parse_event(data))
    return out


def _read_varint(buf: bytes, i: int):
    shift = n = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def _parse_fields(buf: bytes):
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        num, wire = key >> 3, key & 7
        if wire == 0:
            val, i = _read_varint(buf, i)
        elif wire == 1:
            val = buf[i : i + 8]
            i += 8
        elif wire == 5:
            val = buf[i : i + 4]
            i += 4
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            val = buf[i : i + ln]
            i += ln
        else:  # pragma: no cover
            raise ValueError(f"unsupported wire type {wire}")
        yield num, wire, val


def _parse_event(data: bytes):
    step = 0
    wall = 0.0
    scalars = {}
    for num, wire, val in _parse_fields(data):
        if num == 1 and wire == 1:
            (wall,) = struct.unpack("<d", val)
        elif num == 2 and wire == 0:
            step = val
        elif num == 5 and wire == 2:
            for vnum, vwire, vval in _parse_fields(val):
                if vnum == 1 and vwire == 2:
                    tag = None
                    sval = None
                    for wnum, wwire, wval in _parse_fields(vval):
                        if wnum == 1 and wwire == 2:
                            tag = wval.decode()
                        elif wnum == 2 and wwire == 5:
                            (sval,) = struct.unpack("<f", wval)
                    if tag is not None and sval is not None:
                        scalars[tag] = sval
    return step, wall, scalars


def export_jsonl(run_dir: str, out_dir: Optional[str] = None) -> str:
    """Convert a run directory's metrics.jsonl into a TFEvents file."""
    src = os.path.join(run_dir, "metrics.jsonl") if os.path.isdir(run_dir) else run_dir
    out_dir = out_dir or os.path.join(os.path.dirname(src), "tb")
    with TensorboardWriter(out_dir) as tb:
        with open(src) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                step = int(rec.pop("step", 0))
                rec.pop("time", None)
                tb.add_scalars(step, rec)
    return out_dir


if __name__ == "__main__":
    import sys

    print(export_jsonl(*sys.argv[1:]))
