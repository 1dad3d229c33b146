"""Torch-free ``.pt`` reader (utils/pt_reader.py) vs real ``torch.save``
files — the zip+pickle format a reference checkpoint arrives in
(/root/reference/main_md17.py:295-312 saves ``{'state_dict': ...}``).

torch (cpu) is available in this image, so every fixture here is a REAL
torch-serialized byte stream, not a simulation: the reader must reproduce
``torch.load`` exactly (bfloat16 upconverted to fp32)."""

import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from equiformer_tpu.utils.pt_reader import load_pt, load_state_dict


def _assert_tensor_equal(got, ref: "torch.Tensor", key=""):
    want = ref.float().numpy() if ref.dtype == torch.bfloat16 else ref.numpy()
    assert got.dtype == want.dtype, (key, got.dtype, want.dtype)
    np.testing.assert_array_equal(got, want, err_msg=key)


def test_dtype_matrix(tmp_path):
    g = torch.Generator().manual_seed(0)
    sd = {
        "f32": torch.randn(5, 7, generator=g),
        "f64": torch.randn(3, generator=g).double(),
        "f16": torch.randn(4, generator=g).half(),
        "bf16": torch.randn(6, generator=g).bfloat16(),
        "i64": torch.arange(-3, 9),
        "i32": torch.arange(4, dtype=torch.int32),
        "i16": torch.arange(4, dtype=torch.int16),
        "i8": torch.arange(4, dtype=torch.int8),
        "u8": torch.arange(4, dtype=torch.uint8),
        "bool": torch.tensor([True, False, True]),
        "scalar": torch.tensor(2.5),
    }
    p = str(tmp_path / "dtypes.pt")
    torch.save(sd, p)
    got = load_pt(p)
    assert set(got) == set(sd)
    for k, v in sd.items():
        _assert_tensor_equal(got[k], v, k)


def test_views_strides_and_offsets(tmp_path):
    """Checkpoints may hold non-contiguous views into shared storage; the
    as_strided emulation must reproduce offset + stride exactly."""
    base = torch.randn(8, 8, dtype=torch.float64)
    sd = {
        "t": base.t(),                       # transposed (col-major strides)
        "slice": base[2:6, 1:7],             # offset + row slice
        "step": base[::2, ::3],              # strided steps
        "flat_tail": base.reshape(-1)[5:],   # storage offset
        "expanded": base[:1].expand(4, 8).contiguous(),
    }
    p = str(tmp_path / "views.pt")
    torch.save(sd, p)
    got = load_pt(p)
    for k, v in sd.items():
        _assert_tensor_equal(got[k], v, k)


def test_nested_checkpoint_and_unwrap(tmp_path):
    """The full reference checkpoint shape: dict wrapper with metadata, DDP
    'module.' prefixes, nested containers — load_state_dict unwraps it."""
    g = torch.Generator().manual_seed(1)
    inner = {f"module.blocks.{i}.w": torch.randn(3, 3, generator=g)
             for i in range(3)}
    ckpt = {
        "state_dict": inner,
        "epoch": 17,
        "best_err": 0.123,
        "history": [1, 2, 3],
        "meta": {"name": "run", "lr": 5e-4},
    }
    p = str(tmp_path / "ckpt.pth")
    torch.save(ckpt, p)

    got = load_pt(p)
    assert got["epoch"] == 17 and got["meta"]["lr"] == 5e-4
    assert got["history"] == [1, 2, 3]

    sd = load_state_dict(p)
    assert set(sd) == {f"blocks.{i}.w" for i in range(3)}
    for i in range(3):
        _assert_tensor_equal(sd[f"blocks.{i}.w"], inner[f"module.blocks.{i}.w"])


def test_parameter_objects(tmp_path):
    """state_dicts of nn.Module hold plain tensors, but saved *modules* (and
    some trainer checkpoints) hold nn.Parameter — _rebuild_parameter path."""
    lin = torch.nn.Linear(4, 3)
    p = str(tmp_path / "params.pt")
    torch.save({"w": lin.weight, "b": lin.bias}, p)
    got = load_pt(p)
    _assert_tensor_equal(got["w"], lin.weight.detach(), "w")
    _assert_tensor_equal(got["b"], lin.bias.detach(), "b")


def test_rejects_arbitrary_globals(tmp_path):
    """The restricted unpickler must refuse non-allowlisted classes instead
    of importing them (the weights_only safety property)."""

    class Evil:
        def __reduce__(self):
            return (print, ("pwned",))

    p = str(tmp_path / "evil.pt")
    torch.save({"x": torch.zeros(1), "e": Evil()}, p)
    with pytest.raises(pickle.UnpicklingError, match="refusing to unpickle"):
        load_pt(p)


def test_legacy_format_error(tmp_path):
    """Pre-1.6 stream format: clear error, not a crash."""
    p = str(tmp_path / "legacy.pt")
    torch.save({"x": torch.zeros(2)}, p, _use_new_zipfile_serialization=False)
    with pytest.raises(ValueError, match="legacy-format"):
        load_pt(p)


def test_not_a_checkpoint(tmp_path):
    p = str(tmp_path / "junk.pt")
    with open(p, "wb") as fh:
        fh.write(b"\x00" * 64)
    with pytest.raises(ValueError, match="not a torch zip"):
        load_pt(p)


def test_reference_shaped_state_dict_roundtrip(tmp_path):
    """A synthetic reference GraphAttentionTransformer state_dict (the same
    builder the converter tests use) saved by real torch.save and read back
    torch-free: every key and value must match torch.load bit-for-bit."""
    from tests.test_convert import build_synthetic_ref_state_dict
    from equiformer_tpu.models import model_entrypoint

    model = model_entrypoint("graph_attention_transformer_nonlinear_l2")(
        radius=5.0, num_basis=16, max_edges=512, nodes_per_graph=30
    )
    sd = build_synthetic_ref_state_dict(model)
    tsd = {k: torch.tensor(np.asarray(v)) for k, v in sd.items()}
    p = str(tmp_path / "ref.pth")
    torch.save({"state_dict": tsd, "epoch": 3}, p)

    got = load_state_dict(p)
    assert set(got) == set(tsd)
    for k in tsd:
        _assert_tensor_equal(got[k], tsd[k], k)
