"""Torch-free reader for PyTorch zip-format checkpoints (``.pt``/``.pth``).

``torch.save`` (the default format since torch 1.6) writes a ZIP archive

    <stem>/data.pkl     pickle stream of the saved object; every tensor is a
                        ``torch._utils._rebuild_tensor_v2`` REDUCE whose
                        storage argument is the persistent-id tuple
                        ``('storage', <torch.XStorage class>, key, location,
                        numel)``
    <stem>/data/<key>   the raw little-endian storage bytes
    <stem>/version, <stem>/byteorder, ...

Both formats are public (the pickle protocol is stdlib; the zip layout is
documented by its own reader in torch/serialization.py), so a reference
Equiformer checkpoint (README.md:84-130 pretrained ``.pth`` files,
``{'state_dict': ...}`` saved by main_md17.py:295-312) can be ingested with
no torch installed — closing the converter's last dependency on the
reference's framework (tools/convert_checkpoint.py).

This module deserializes ``data.pkl`` with a *restricted* ``pickle.Unpickler``:

* ``persistent_load`` resolves storage ids to lazy byte handles;
* ``find_class`` admits only the torch rebuild helpers, storage type names
  (mapped to numpy dtypes), and plain containers a checkpoint needs —
  everything else raises.  Unlike ``torch.load`` without ``weights_only``,
  no arbitrary-code unpickling is possible.
* ``_rebuild_tensor_v2`` is emulated in numpy via ``as_strided`` (checkpoints
  may hold non-contiguous views; the result is copied to owned memory).

bfloat16 storages have no numpy dtype and are upconverted to float32
losslessly (the converter targets fp32 parameters anyway).

The pre-1.6 "legacy" tar/pickle stream format is not implemented — every
reference checkpoint postdates it; a clear error is raised.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict

import numpy as np

_STORAGE_DTYPES = {
    "DoubleStorage": np.float64,
    "FloatStorage": np.float32,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "ComplexFloatStorage": np.complex64,
    "ComplexDoubleStorage": np.complex128,
    # no numpy bfloat16: read as uint16, upconvert in _to_numpy
    "BFloat16Storage": np.uint16,
}
_BF16 = "BFloat16Storage"


class _StorageType:
    """Placeholder for ``torch.XStorage`` classes appearing in the pickle."""

    def __init__(self, name: str):
        self.name = name
        if name not in _STORAGE_DTYPES:
            raise pickle.UnpicklingError(f"unsupported torch storage {name!r}")
        self.dtype = np.dtype(_STORAGE_DTYPES[name])
        self.is_bf16 = name == _BF16


class _Storage:
    """Lazy handle to one ``data/<key>`` zip member."""

    def __init__(self, zf: zipfile.ZipFile, member: str, stype: _StorageType,
                 numel: int):
        self._zf = zf
        self._member = member
        self.stype = stype
        self.numel = numel
        self._arr = None

    def array(self) -> np.ndarray:
        if self._arr is None:
            raw = self._zf.read(self._member)
            self._arr = np.frombuffer(raw, dtype=self.stype.dtype)
        return self._arr


def _bf16_to_f32(u16: np.ndarray) -> np.ndarray:
    return (u16.astype(np.uint32) << 16).view(np.float32)


def _rebuild_tensor_v2(storage: _Storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None) -> np.ndarray:
    base = storage.array()
    itemsize = base.dtype.itemsize
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    view = np.lib.stride_tricks.as_strided(
        base[int(storage_offset):],
        shape=size,
        strides=tuple(s * itemsize for s in stride),
    )
    out = np.array(view)  # own the memory; drops the strided aliasing
    if storage.stype.is_bf16:
        out = _bf16_to_f32(out)
    return out


def _rebuild_tensor(storage: _Storage, storage_offset, size, stride):
    return _rebuild_tensor_v2(storage, storage_offset, size, stride)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


_SAFE_GLOBALS = {
    ("collections", "OrderedDict"): dict,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("torch", "Size"): tuple,
    # numpy scalars occasionally ride along in trainer checkpoints
    ("numpy", "dtype"): np.dtype,
    ("numpy", "float64"): np.float64,
    ("numpy", "int64"): np.int64,
}
for _mod in ("numpy.core.multiarray", "numpy._core.multiarray"):
    try:
        _SAFE_GLOBALS[(_mod, "scalar")] = __import__(
            _mod, fromlist=["scalar"]
        ).scalar
    except (ImportError, AttributeError):  # pragma: no cover
        pass


class _Unpickler(pickle.Unpickler):
    def __init__(self, fh, zf: zipfile.ZipFile, prefix: str):
        super().__init__(fh, encoding="utf-8")
        self._zf = zf
        self._prefix = prefix

    def find_class(self, module: str, name: str):
        if (module, name) in _SAFE_GLOBALS:
            return _SAFE_GLOBALS[(module, name)]
        if module == "torch" and name.endswith("Storage"):
            return _StorageType(name)
        if module == "torch" and name == "device":
            return lambda *a, **k: None
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name} (not in the checkpoint "
            "allowlist; this reader loads tensors and containers only)"
        )

    def persistent_load(self, saved_id):
        if not (isinstance(saved_id, tuple) and saved_id
                and saved_id[0] == "storage"):
            raise pickle.UnpicklingError(
                f"unknown persistent id {saved_id!r}")
        _, stype, key, _location, numel = saved_id
        if not isinstance(stype, _StorageType):
            raise pickle.UnpicklingError(
                f"unexpected storage type object {stype!r}")
        member = f"{self._prefix}data/{key}"
        return _Storage(self._zf, member, stype, int(numel))


def load_pt(path: str) -> Any:
    """Load a torch zip-format checkpoint without torch.

    Returns the saved object with every tensor replaced by a numpy array
    (bfloat16 upconverted to float32).  Raises ``ValueError`` for the
    pre-1.6 legacy stream format.
    """
    if not zipfile.is_zipfile(path):
        with open(path, "rb") as fh:
            head = fh.read(8)
        if head[:2] == b"\x80\x02":
            raise ValueError(
                f"{path} is a pre-torch-1.6 legacy-format checkpoint; "
                "re-save it with a modern torch (torch.save(torch.load(p), p))"
            )
        raise ValueError(f"{path} is not a torch zip checkpoint")
    zf = zipfile.ZipFile(path)
    pkl = [n for n in zf.namelist() if n.endswith("data.pkl")]
    if not pkl:
        raise ValueError(f"{path}: no data.pkl member (not a torch.save zip)")
    # records live under '<stem>/'; data.pkl at the root means prefix ''
    prefix = pkl[0][: -len("data.pkl")]
    byteorder = f"{prefix}byteorder"
    if byteorder in zf.namelist() and zf.read(byteorder) not in (b"little",):
        raise ValueError(f"{path}: big-endian checkpoints are unsupported")
    with zf.open(pkl[0]) as fh:
        data = fh.read()
    return _Unpickler(io.BytesIO(data), zf, prefix).load()


def load_state_dict(path: str, state_dict_key: str | None = None
                    ) -> Dict[str, np.ndarray]:
    """Load and unwrap a checkpoint to a flat ``{name: array}`` state_dict.

    Mirrors tools/convert_checkpoint.py's torch path: auto-detects the
    ``state_dict`` / ``model`` / ``model_ema`` wrapper key and strips DDP
    ``module.`` prefixes.
    """
    ckpt = load_pt(path)
    sd = ckpt
    if isinstance(ckpt, dict) and not any(
        hasattr(v, "shape") for v in list(ckpt.values())[:4]
    ):
        for key in ([state_dict_key] if state_dict_key else
                    ["state_dict", "model", "model_ema"]):
            if key and key in ckpt:
                sd = ckpt[key]
                break
    sd = dict(sd)
    if sd and all(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()}
    return sd
