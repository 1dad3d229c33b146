"""Reference (PyTorch/e3nn) checkpoint -> equiformer_tpu parameter conversion.

Maps a reference ``state_dict`` (torch tensors or numpy arrays) onto this
framework's flax parameter tree so the converted model computes the *same
function* of atomic positions.  The convention bridge (core/e3nn_compat.py)
reduces the whole conversion to bookkeeping:

* every learned parameter acts on the multiplicity axis, never on irrep
  components, so no Wigner rotation ever touches a weight;
* e3nn-vs-ours Wigner-3j sign differences are absorbed into TP path weights
  via ``path_weight_sign(l1,l2,l3)`` (+1 for every linear (l,0,l) path);
* the reference folds the per-output-slice ``1/sqrt(fan_in)`` rescale into
  the radial MLP's LAST layer (graph_attention_transformer.py:206-208,
  717-721) while this framework applies it at runtime
  (``TensorProduct.apply(scale_weights=True)``) — so converted radial last
  layers are divided element-wise by ``external_weight_scale()``;
* torch ``nn.Linear`` stores ``weight[out,in]``; flax ``Dense`` kernels are
  ``[in,out]`` (transpose);
* feature layout (mul-major vs component-major) affects activations only,
  not weights: TP path weights are indexed [mul1, mul2(, mul_out)] in
  instruction order on both sides (core/tensor_product.py matches e3nn's
  flat layout by construction).

The public entry is :func:`convert_qm9_state_dict` (GraphAttentionTransformer
family — QM9/MD17 flagship); ``tools/convert_checkpoint.py`` wraps it in a
CLI that reads a ``.pt``/``.pth`` file with torch and writes weights-only
``.npz`` loadable by ``train.checkpoint.load_weights_npz``.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from ..core.e3nn_compat import path_weight_sign
from ..core.irreps import Irreps
from ..core.tensor_product import TensorProduct


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float64)


# ---------------------------------------------------------------- low level


def tp_weight_signs(tp: TensorProduct) -> np.ndarray:
    """Flat ±1 vector (len weight_numel) applying e3nn->ours CG sign per path."""
    out = np.ones((tp.weight_numel,), np.float64)
    for ins, off, shape in zip(tp.instructions, tp._offsets, tp._shapes):
        if not ins.has_weight:
            continue
        l1 = tp.irreps_in1[ins.i_in1].ir.l
        l2 = tp.irreps_in2[ins.i_in2].ir.l
        l3 = tp.irreps_out[ins.i_out].ir.l
        n = int(np.prod(shape))
        out[off : off + n] = path_weight_sign(l1, l2, l3)
    return out


def convert_tp_weight(tp: TensorProduct, ref_flat) -> np.ndarray:
    """Internal (shared) TP weight: e3nn flat layout == ours; apply signs."""
    ref = _np(ref_flat).reshape(-1)
    if ref.size != tp.weight_numel:
        raise ValueError(f"weight numel {ref.size} != plan {tp.weight_numel}")
    return ref * tp_weight_signs(tp)


def convert_radial_last_layer(tp: TensorProduct, ref_weight, ref_offset):
    """Radial MLP last layer feeding external TP weights.

    The reference bakes slice sqrt_k into these rows at init; we rescale at
    runtime, so divide it back out (and apply CG signs per row).
    Returns (kernel [in, out], offset [out]) in flax layout.
    """
    w = _np(ref_weight)  # torch [out, in]
    off = _np(ref_offset)
    scale = tp.external_weight_scale()  # per-output-element sqrt_k
    signs = tp_weight_signs(tp)
    row_factor = signs / scale
    return (w * row_factor[:, None]).T, off * row_factor


def convert_linear_rs(
    irreps_in: Irreps, irreps_out: Irreps, ref_tp_weight, ref_biases: Sequence
) -> Dict[str, np.ndarray]:
    """Reference LinearRS (FCTP vs '1x0e') -> IrrepsLinear {w{oi}, b{oi}}.

    e3nn flat weight: per-instruction [mul_in, 1, mul_out] blocks ordered by
    (i_in, i_out); our w{oi} stacks matching input blocks (input order) into
    [fan_in, mul_out].  All (l,0,l) path signs are +1.
    """
    irreps_in = Irreps(irreps_in)
    irreps_out = Irreps(irreps_out)
    flat = _np(ref_tp_weight).reshape(-1)
    # walk e3nn instruction order, collecting blocks per output
    blocks: Dict[int, List[np.ndarray]] = {}
    off = 0
    for ii, (mul_in, ir_in) in enumerate(irreps_in):
        for oi, (mul_out, ir_out) in enumerate(irreps_out):
            if ir_out != ir_in:
                continue
            n = mul_in * mul_out
            blocks.setdefault(oi, []).append(
                flat[off : off + n].reshape(mul_in, mul_out)
            )
            off += n
    if off != flat.size:
        raise ValueError(f"consumed {off} of {flat.size} linear weights")
    out: Dict[str, np.ndarray] = {}
    for oi, blks in blocks.items():
        out[f"w{oi}"] = np.concatenate(blks, axis=0)
    bi = 0
    ref_biases = list(ref_biases)
    for oi, (mul_out, ir_out) in enumerate(irreps_out):
        if ir_out.is_scalar() and oi in blocks and bi < len(ref_biases):
            out[f"b{oi}"] = _np(ref_biases[bi]).reshape(-1)
            bi += 1
    return out


def convert_fctp(tp: TensorProduct, ref_tp_weight, ref_biases: Sequence):
    """Reference FullyConnectedTensorProductRescale -> FCTP {w, bias}."""
    out = {"w": convert_tp_weight(tp, ref_tp_weight)}
    if ref_biases:
        out["bias"] = np.concatenate([_np(b).reshape(-1) for b in ref_biases])
    return out


def convert_scalar_mlp(prefix: str, sd: Dict, tp: TensorProduct = None):
    """Reference RadialProfile ``net``+``offset`` -> ours (flax Dense/LN).

    torch Sequential indices: Linear, LayerNorm, SiLU repeating, last Linear
    bias-free; if ``tp`` is given the last layer is treated as external TP
    weights (rescale undone + signs applied).
    """
    out_net: Dict[str, Dict[str, np.ndarray]] = {}
    di = li = 0
    indices = sorted(
        int(k[len(prefix) + 5 :].split(".")[0])
        for k in sd
        if k.startswith(prefix + ".net.") and k.endswith(".weight")
    )
    for idx in indices:  # activation modules hold no params and are skipped
        w = sd[f"{prefix}.net.{idx}.weight"]
        has_bias = f"{prefix}.net.{idx}.bias" in sd
        is_last = idx == indices[-1]
        wn = _np(w)
        if wn.ndim == 2:  # Linear
            if is_last and tp is not None:
                kernel, offset = convert_radial_last_layer(
                    tp, wn, sd.get(f"{prefix}.offset", np.zeros(wn.shape[0]))
                )
                out_net[f"dense{di}"] = {"kernel": kernel}
                out = {"net": out_net, "offset": offset}
                return out
            d = {"kernel": wn.T}
            if has_bias:
                d["bias"] = _np(sd[f"{prefix}.net.{idx}.bias"])
            out_net[f"dense{di}"] = d
            di += 1
        else:  # LayerNorm
            out_net[f"ln{li}"] = {
                "scale": wn,
                "bias": _np(sd[f"{prefix}.net.{idx}.bias"]),
            }
            li += 1
        idx += 1
    out = {"net": out_net}
    if f"{prefix}.offset" in sd:
        out["offset"] = _np(sd[f"{prefix}.offset"])
    return out


def collect_bias_list(sd: Dict, prefix: str) -> List[np.ndarray]:
    """Gather a torch ParameterList ``{prefix}.bias.{i}`` in index order."""
    out = []
    i = 0
    while f"{prefix}.bias.{i}" in sd:
        out.append(sd[f"{prefix}.bias.{i}"])
        i += 1
    return out


# ------------------------------------------------------------- model level


def convert_qm9_state_dict(sd: Dict, model) -> Dict:
    """Map a reference GraphAttentionTransformer state_dict onto ``model``'s
    parameter tree (models/equiformer.py GraphAttentionTransformer).

    ``model`` supplies the plans (irreps/instructions) needed to interpret
    flat weights.  Returns {"params": {...}} matching ``model.init``'s
    structure.  Unknown reference keys are reported via ValueError so silent
    drops cannot happen.
    """
    from ..core.tensor_product import depthwise_tp, fully_connected_tp
    from ..nn.activation import gate_for, irreps2gate

    sd = {k: _np(v) for k, v in sd.items()}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    def take_biases(prefix):
        out = collect_bias_list(sd, prefix)
        for i in range(len(out)):
            used.add(f"{prefix}.bias.{i}")
        return out

    def take_mlp(prefix, tp=None):
        res = convert_scalar_mlp(prefix, sd, tp)
        for k in list(sd):
            if k.startswith(prefix + ".net.") or k == prefix + ".offset":
                used.add(k)
        return res

    emb = Irreps(model.irreps_node_embedding)
    sh = Irreps(model.irreps_sh)
    feat = Irreps(model.irreps_feature)
    attr = Irreps("1x0e")
    heads = Irreps(model.irreps_head) * model.num_heads
    heads = Irreps(heads).sort_even_first()[0].simplify()
    mlp_mid = Irreps(model.irreps_mlp_mid)

    p: Dict = {}

    # atom embedding (LinearRS with sqrt(max_atom_type) baked in both sides)
    p["atom_embed"] = {"lin": convert_linear_rs(
        Irreps(f"{model.max_atom_type}x0e"), emb,
        take("atom_embed.atom_type_lin.tp.weight"),
        take_biases("atom_embed.atom_type_lin"),
    )}

    # gaussian rbf
    p["GaussianRadialBasis_0"] = {
        "mean": take("rbf.mean").reshape(-1),
        "std": take("rbf.std").reshape(-1),
        "weight": take("rbf.weight").reshape(-1),
        "bias": take("rbf.bias").reshape(-1),
    }

    # edge degree embedding
    dw_plan = depthwise_tp(emb, sh, emb)
    p["edge_deg_embed"] = {
        "exp": convert_linear_rs(Irreps("1x0e"), emb,
                                 take("edge_deg_embed.exp.tp.weight"),
                                 take_biases("edge_deg_embed.exp")),
        "rad": take_mlp("edge_deg_embed.rad", dw_plan),
        "proj": convert_linear_rs(dw_plan.irreps_out, emb,
                                  take("edge_deg_embed.proj.tp.weight"),
                                  take_biases("edge_deg_embed.proj")),
    }

    # transformer blocks
    for i in range(model.num_layers):
        last = i == model.num_layers - 1
        block_out = feat if last else emb
        rp = f"blocks.{i}"
        blk: Dict = {}
        blk["norm_1"] = {
            "affine_weight": take(f"{rp}.norm_1.affine_weight").reshape(-1),
            "affine_bias": take(f"{rp}.norm_1.affine_bias").reshape(-1),
        }
        blk["norm_2"] = {
            "affine_weight": take(f"{rp}.norm_2.affine_weight").reshape(-1),
            "affine_bias": take(f"{rp}.norm_2.affine_bias").reshape(-1),
        }

        # graph attention
        ga: Dict = {}
        ga["merge_src"] = convert_linear_rs(
            emb, emb, take(f"{rp}.ga.merge_src.tp.weight"),
            take_biases(f"{rp}.ga.merge_src"))
        ga["merge_dst"] = convert_linear_rs(
            emb, emb, take(f"{rp}.ga.merge_dst.tp.weight"),
            take_biases(f"{rp}.ga.merge_dst"))
        mul_alpha = sum(mi.mul for mi in heads if mi.ir.is_scalar())
        irreps_alpha = Irreps(f"{mul_alpha}x0e")
        if model.nonlinear_message:
            # sep_act: DTP (radial weights) -> lin -> gate
            scalars, gates, gated = irreps2gate(emb)
            sep_act_lin_out = Irreps(scalars + gates + gated).simplify()
            act_plan = depthwise_tp(emb, sh, emb)
            ga["sep_act"] = {
                "dtp_rad": take_mlp(f"{rp}.ga.sep_act.dtp_rad", act_plan),
                "lin": convert_linear_rs(
                    act_plan.irreps_out, sep_act_lin_out,
                    take(f"{rp}.ga.sep_act.lin.tp.weight"),
                    take_biases(f"{rp}.ga.sep_act.lin")),
            }
            ga["sep_alpha"] = convert_linear_rs(
                act_plan.irreps_out, irreps_alpha,
                take(f"{rp}.ga.sep_alpha.tp.weight"),
                take_biases(f"{rp}.ga.sep_alpha"))
            val_plan = depthwise_tp(emb, sh, heads)
            ga["sep_value"] = {
                "dtp": {"w": convert_tp_weight(
                    val_plan, take(f"{rp}.ga.sep_value.dtp.tp.weight"))},
                "lin": convert_linear_rs(
                    val_plan.irreps_out, heads,
                    take(f"{rp}.ga.sep_value.lin.tp.weight"),
                    take_biases(f"{rp}.ga.sep_value.lin")),
            }
        else:
            attn_all = Irreps(irreps_alpha + heads).simplify()
            sep_plan = depthwise_tp(emb, sh, attn_all)
            ga["sep"] = {
                "dtp_rad": take_mlp(f"{rp}.ga.sep.dtp_rad", sep_plan),
                "lin": convert_linear_rs(
                    sep_plan.irreps_out, attn_all,
                    take(f"{rp}.ga.sep.lin.tp.weight"),
                    take_biases(f"{rp}.ga.sep.lin")),
            }
        ga["alpha_dot"] = take(f"{rp}.ga.alpha_dot").reshape(
            model.num_heads, -1)
        # GA output is always the block INPUT irreps (residual; reference
        # TransBlock passes irreps_node_output=irreps_node_input, :607-610)
        ga["proj"] = convert_linear_rs(
            heads, emb, take(f"{rp}.ga.proj.tp.weight"),
            take_biases(f"{rp}.ga.proj"))
        blk["ga"] = ga

        # FFN: fctp_1 (swish-gated) + fctp_2
        _, gate_in = gate_for(mlp_mid)
        tp1 = fully_connected_tp(emb, attr, gate_in)
        blk["ffn"] = {
            "fctp_1": {"fctp": convert_fctp(
                tp1, take(f"{rp}.ffn.fctp_1.tp.weight"),
                take_biases(f"{rp}.ffn.fctp_1"))},
            "fctp_2": convert_fctp(
                fully_connected_tp(mlp_mid, attr, block_out),
                take(f"{rp}.ffn.fctp_2.tp.weight"),
                take_biases(f"{rp}.ffn.fctp_2")),
        }
        if f"{rp}.ffn_shortcut.tp.weight" in sd:
            blk["ffn_shortcut"] = convert_fctp(
                fully_connected_tp(emb, attr, block_out),
                take(f"{rp}.ffn_shortcut.tp.weight"),
                take_biases(f"{rp}.ffn_shortcut"))
        p[f"block_{i}"] = blk

    # final norm + head
    p["norm"] = {
        "affine_weight": take("norm.affine_weight").reshape(-1),
        "affine_bias": take("norm.affine_bias").reshape(-1),
    }
    p["head_lin1"] = convert_linear_rs(
        feat, feat, take("head.0.tp.weight"), take_biases("head.0"))
    p["head_lin2"] = convert_linear_rs(
        feat, Irreps("1x0e"), take("head.2.tp.weight"), take_biases("head.2"))

    leftovers = [k for k in sd if k not in used and not k.endswith("atomref")]
    if leftovers:
        raise ValueError(f"unmapped reference keys: {sorted(leftovers)[:10]}"
                         f" (+{max(0, len(leftovers) - 10)} more)")
    return {"params": p}
