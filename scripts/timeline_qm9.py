"""Measured per-phase timeline of the QM9 flagship train step (VERDICT r4 #1).

Times, with the true-sync protocol (host materialization, RTT-subtracted),
each phase of the current bench configuration (nonlinear_l2, batch 128,
tight edge caps, bf16, no remat) at its REAL step shapes:

  macro   : train step (number of record), fwd, fwd+grad, optimizer+EMA only
  sections: geometry (graph+SH+RBF), TransBlock f / f+g, GraphAttention f+g,
            FFN f+g, LayerNorm f+g, embed head/readout f+g
  inner GA: merge linears + gather, radial MLP, the three distinct fused
            DTP+linear plans (fwd / fwd+grad each), CSR attention combine,
            proj linear

and prints an occurrence-weighted attribution table whose rows sum against
the measured step, so the non-floor time the roofline identifies
(PERF_ANALYSIS.md: ~18ms DTP floor vs 55ms step) lands on named phases.

Run: PYTHONPATH=.:scripts python scripts/timeline_qm9.py [--n 30] [--fp32]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def timeit(fn, *args, n=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    x = jnp.zeros(())
    _sync(x + 1)
    t0 = time.perf_counter()
    for _ in range(3):
        _sync(x + 1)
    rtt = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return max((time.perf_counter() - t0 - rtt) / n, 0.0) * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--skip-macro", action="store_true",
                    help="only the component micros (faster iteration)")
    args = ap.parse_args()

    import argparse as _ap

    from equiformer_tpu.kernels import dtp_lin_pallas as fo

    recs = []
    orig = fo.DTPLinPlan.__init__

    def patched(self, tp, head_irreps, fold_rescale=True, shared_weights=False,
                needs_dsh=True, tile=128, radial_fold=None):
        orig(self, tp, head_irreps, fold_rescale, shared_weights, needs_dsh,
             tile, radial_fold)
        recs.append((tp, tuple(head_irreps), fold_rescale, shared_weights, tile))

    fo.DTPLinPlan.__init__ = patched
    from bench import build_qm9

    try:
        train_step, state, batches = build_qm9(
            _ap.Namespace(loose_edges=0, smoke=False, fp32=args.fp32,
                          remat=False),
            128,
        )
    finally:
        fo.DTPLinPlan.__init__ = orig

    b = batches[0]
    rng = jax.random.PRNGKey(2)
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    N = b.pos.shape[0]
    G = b.graph_mask.shape[0]

    # rebuild the exact bench model/optimizer (build_qm9 returns only the step)
    from equiformer_tpu.core import Irreps
    from equiformer_tpu.core.spherical import spherical_harmonics_for_irreps
    from equiformer_tpu.graph.radius_graph import edge_vectors
    from equiformer_tpu.models import model_entrypoint
    from equiformer_tpu.nn.radial import make_rbf
    from equiformer_tpu.train import (
        cosine_warmup_schedule, create_optimizer,
    )
    from equiformer_tpu.train.engine import ema_update

    from bench import tight_edge_cap
    from equiformer_tpu.data import qm9_like_dataset

    edge_cap = tight_edge_cap(qm9_like_dataset(512, seed=0), 128, 5.0)
    model = model_entrypoint("graph_attention_transformer_nonlinear_l2")(
        radius=5.0, num_basis=128, max_edges=edge_cap, remat=False,
        nodes_per_graph=30,
        compute_dtype=None if args.fp32 else "bfloat16",
    )
    params = state.params
    opt = create_optimizer(
        cosine_warmup_schedule(5e-4, 100, 100000), weight_decay=5e-3
    )

    print(f"batch 128, N={N}, E={edge_cap}, dtype={dtype.__name__}")
    results = []

    def row(name, ms, count, note=""):
        results.append((name, ms, count, ms * count, note))
        print(f"  {name:34s} {ms:8.3f} ms x{count:3d} = {ms*count:8.2f} ms  {note}")

    # ---------------------------------------------------------------- macro
    def loss_fn(p, batch, r):
        pred = model.apply(p, batch, deterministic=False, rngs={"dropout": r})
        err = pred - batch.y
        return jnp.sum(jnp.where(batch.graph_mask, jnp.abs(err), 0.0)) / jnp.sum(
            batch.graph_mask
        )

    print("== macro anchors")
    grads = None
    if not args.skip_macro:
        sfn = jax.jit(lambda s: train_step(s, b, rng))
        t_step = timeit(sfn, state, n=args.n)
        row("train step (of record)", t_step, 1)
        fwd = jax.jit(
            lambda p: model.apply(p, b, deterministic=False,
                                  rngs={"dropout": rng})
        )
        row("model fwd (dropout active)", timeit(fwd, params, n=args.n), 1)
        gfn = jax.jit(jax.value_and_grad(lambda p: loss_fn(p, b, rng)))
        t_fg = timeit(gfn, params, n=args.n)
        row("model fwd+grad", t_fg, 1)
        grads = gfn(params)[1]

        def opt_only(s, g):
            updates, opt_state = opt.update(g, s.opt_state, s.params)
            import optax

            p2 = optax.apply_updates(s.params, updates)
            ema = ema_update(s.ema_params, p2, 0.999)
            return p2, opt_state, ema

        row("optimizer+EMA only", timeit(jax.jit(opt_only), state, grads,
                                         n=args.n), 1)

    # ------------------------------------------------------------- geometry
    print("== sections")
    sh_irreps = Irreps("1x0e+1x1e+1x2e")
    rbf_mod = make_rbf("gaussian", 128, 5.0)
    rbf_vars = rbf_mod.init(jax.random.PRNGKey(0), jnp.zeros((4,)))

    def geom(pos, batch_idx, node_mask):
        edges = model.build_graph(pos, batch_idx, node_mask)
        vec, length = edge_vectors(pos, edges)
        sh = spherical_harmonics_for_irreps(sh_irreps, vec)
        return edges, sh.astype(dtype), rbf_mod.apply(rbf_vars, length).astype(dtype)

    jgeom = jax.jit(geom)
    row("geometry (graph+SH+RBF)", timeit(jgeom, b.pos, b.batch, b.node_mask,
                                          n=args.n), 1)
    edges, sh, scal = jgeom(b.pos, b.batch, b.node_mask)

    emb = Irreps(model.irreps_node_embedding)
    key = jax.random.PRNGKey(0)
    x_nodes = (0.5 * jax.random.normal(key, (N, emb.dim))).astype(dtype)
    node_attr = jnp.ones((N, 1), dtype)

    # ------------------------------------------------------------ TransBlock
    from equiformer_tpu.models.equiformer import (
        FeedForwardNetwork, GraphAttention, TransBlock,
    )

    fc = (model.number_of_basis,) + tuple(model.fc_neurons)
    blk = TransBlock(
        irreps_node_input=emb, irreps_node_attr=Irreps(model.irreps_node_attr),
        irreps_edge_attr=Irreps(model.irreps_sh), irreps_node_output=emb,
        fc_neurons=fc, irreps_head=Irreps(model.irreps_head),
        num_heads=model.num_heads, irreps_pre_attn=model.irreps_pre_attn,
        rescale_degree=model.rescale_degree,
        nonlinear_message=model.nonlinear_message, alpha_drop=model.alpha_drop,
        proj_drop=model.proj_drop, drop_path_rate=model.drop_path_rate,
        irreps_mlp_mid=Irreps(model.irreps_mlp_mid),
        norm_layer=model.norm_layer, attn_type=model.attn_type,
        avg_degree=model.avg_degree, higher_order_grads=False,
    )
    bargs = (x_nodes, node_attr, edges, sh, scal, b.batch, b.node_mask, G)
    bvars = blk.init(jax.random.PRNGKey(1), *bargs, True)

    def blk_loss(v, x):
        out = blk.apply(v, x, *bargs[1:], False, rngs={"dropout": rng})
        return jnp.sum(jnp.abs(out.astype(jnp.float32)))

    jb_f = jax.jit(lambda v, x: blk.apply(v, x, *bargs[1:], False,
                                          rngs={"dropout": rng}))
    row("TransBlock fwd", timeit(jb_f, bvars, x_nodes, n=args.n), 6)
    jb = jax.jit(jax.grad(blk_loss, argnums=(0, 1)))
    row("TransBlock fwd+grad", timeit(jb, bvars, x_nodes, n=args.n), 6)

    # --------------------------------------------------------- GA / FFN / LN
    ga = GraphAttention(
        irreps_node_input=emb, irreps_node_attr=Irreps(model.irreps_node_attr),
        irreps_edge_attr=Irreps(model.irreps_sh), irreps_node_output=emb,
        fc_neurons=fc, irreps_head=Irreps(model.irreps_head),
        num_heads=model.num_heads, irreps_pre_attn=model.irreps_pre_attn,
        rescale_degree=model.rescale_degree,
        nonlinear_message=model.nonlinear_message, alpha_drop=model.alpha_drop,
        proj_drop=model.proj_drop, higher_order_grads=False,
    )
    gargs = (x_nodes, node_attr, edges, sh, scal)
    gvars = ga.init(jax.random.PRNGKey(1), *gargs, True)

    def ga_loss(v, x):
        out = ga.apply(v, x, *gargs[1:], False, rngs={"dropout": rng})
        return jnp.sum(jnp.abs(out.astype(jnp.float32)))

    jg = jax.jit(jax.grad(ga_loss, argnums=(0, 1)))
    row("GraphAttention fwd+grad", timeit(jg, gvars, x_nodes, n=args.n), 6)

    ffn = FeedForwardNetwork(
        irreps_node_input=emb, irreps_node_attr=Irreps(model.irreps_node_attr),
        irreps_node_output=emb, irreps_mlp_mid=Irreps(model.irreps_mlp_mid),
        proj_drop=model.proj_drop,
    )
    fvars = ffn.init(jax.random.PRNGKey(1), x_nodes, node_attr, True)

    def ffn_loss(v, x):
        out = ffn.apply(v, x, node_attr, False, rngs={"dropout": rng})
        return jnp.sum(jnp.abs(out.astype(jnp.float32)))

    jf = jax.jit(jax.grad(ffn_loss, argnums=(0, 1)))
    row("FFN fwd+grad", timeit(jf, fvars, x_nodes, n=args.n), 6)

    from equiformer_tpu.nn.norms import get_norm_layer

    ln = get_norm_layer(model.norm_layer)(emb)
    lvars = ln.init(jax.random.PRNGKey(1), x_nodes, batch=b.batch,
                    node_mask=b.node_mask, num_graphs=G)

    def ln_loss(v, x):
        out = ln.apply(v, x, batch=b.batch, node_mask=b.node_mask,
                       num_graphs=G)
        return jnp.sum(jnp.abs(out.astype(jnp.float32)))

    jl = jax.jit(jax.grad(ln_loss, argnums=(0, 1)))
    row("LayerNorm(480) fwd+grad", timeit(jl, lvars, x_nodes, n=args.n), 12)

    # ------------------------------------------------------------- inner GA
    print("== inner GraphAttention")
    from equiformer_tpu.graph.segment import gather_add
    from equiformer_tpu.nn.linear import IrrepsLinear

    lin_s = IrrepsLinear(emb, emb, use_bias=True)
    lin_d = IrrepsLinear(emb, emb, use_bias=False)
    ps = lin_s.init(key, x_nodes)
    pd = lin_d.init(key, x_nodes)

    def mg_loss(p1, p2, x):
        m = gather_add(lin_s.apply(p1, x), lin_d.apply(p2, x), edges.src,
                       edges.dst, N, rev=edges.rev, higher_order=False)
        return jnp.sum(jnp.abs(m.astype(jnp.float32)))

    jmg = jax.jit(jax.grad(mg_loss, argnums=(0, 1, 2)))
    row("merge linears + gather f+g", timeit(jmg, ps, pd, x_nodes, n=args.n), 6)

    # radial MLP at [E, 128]
    from equiformer_tpu.nn.radial import RadialProfile

    # distinct fused plans (dedup like kron_micro, including shared flag)
    seen, order = {}, []
    for rec in recs:
        tp, heads, fr, shw, tile = rec
        s = (str(tp.irreps_in1), str(tp.irreps_in2), str(tp.irreps_out),
             tuple(str(h) for h in heads), fr, shw, tile)
        if s not in seen:
            seen[s] = [0, rec]
            order.append(s)
        seen[s][0] += 1

    wn = None
    for s in order:
        cnt, (tp, heads, fr, shw, tile) = seen[s]
        if not shw and wn is None:
            wn = tp.weight_numel
    rad = RadialProfile(features=tuple(fc[1:]) + (wn,))
    rbfv = jax.random.normal(key, (edge_cap, 128), dtype)
    rp = rad.init(key, rbfv)

    def rad_loss(p, r):
        return jnp.sum(jnp.abs(rad.apply(p, r).astype(jnp.float32)))

    jr = jax.jit(jax.grad(rad_loss, argnums=(0, 1)))
    row("radial MLP f+g [E,128]->w", timeit(jr, rp, rbfv, n=args.n), 7,
        "6 sep_act + 1 edge_deg")

    from equiformer_tpu.kernels.dtp_lin_ho import auto_tile
    from equiformer_tpu.kernels.dtp_lin_pallas import make_fused_dtp_lin

    for s in order:
        cnt, (tp, heads, fr, shw, tile) = seen[s]
        plan = fo.DTPLinPlan(tp, heads, fr, shw, needs_dsh=False, tile=tile)
        t = auto_tile(plan, tile, budget=9 * 2**20)
        fma = make_fused_dtp_lin(plan, tile=t)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        x = jax.random.normal(k1, (edge_cap, plan.d_x), dtype)
        shx = jax.random.normal(k2, (edge_cap, plan.d_sh), dtype)
        w = (jax.random.normal(k3, (plan.d_w,), dtype) if shw
             else jax.random.normal(k3, (edge_cap, plan.d_w), dtype))
        Ws = [0.05 * jax.random.normal(jax.random.fold_in(k4, gi),
                                       (g.fan_pad, g.cols), dtype)
              for gi, g in enumerate(plan.groups)]
        nW = len(Ws)

        def f(x, sh_, w_, *Ws_, _fma=fma):
            return _fma(x, sh_, w_, list(Ws_))

        label = f"fused[{'shared' if shw else 'ext'},{len(heads)}h,d{plan.d_out}]"
        jfwd = jax.jit(f)
        row(f"{label} fwd", timeit(jfwd, x, shx, w, *Ws, n=args.n), cnt)
        jgr = jax.jit(jax.grad(
            lambda *a, _f=f: jnp.sum(_f(*a).astype(jnp.float32)),
            argnums=tuple(range(3 + nW)),
        ))
        row(f"{label} fwd+grad", timeit(jgr, x, shx, w, *Ws, n=args.n), cnt)

    # CSR attention combine at real shapes
    from equiformer_tpu.kernels.attn_csr_pallas import csr_attention_combine

    H = model.num_heads
    D = Irreps(model.irreps_head).dim
    alpha = jax.random.normal(key, (edge_cap, H), dtype)
    value = jax.random.normal(key, (edge_cap, H, D), dtype)
    dropmul = (jax.random.bernoulli(key, 0.8, alpha.shape).astype(dtype) / 0.8)

    def csr_loss(a, v):
        out = csr_attention_combine(a, v, edges.dst, N, mask=edges.mask,
                                    dropmul=dropmul)
        return jnp.sum(jnp.abs(out.astype(jnp.float32)))

    jc = jax.jit(jax.grad(csr_loss, argnums=(0, 1)))
    row("CSR attn combine f+g", timeit(jc, alpha, value, n=args.n), 6)

    # proj linear (heads -> emb) on nodes
    from equiformer_tpu.nn.attention_utils import heads_irreps

    hirr = heads_irreps(Irreps(model.irreps_head), H)
    xa = jax.random.normal(key, (N, hirr.dim), dtype)
    proj = IrrepsLinear(hirr, emb)
    pp = proj.init(key, xa)
    jp = jax.jit(jax.grad(
        lambda p, x: jnp.sum(jnp.abs(proj.apply(p, x).astype(jnp.float32))),
        argnums=(0, 1),
    ))
    row("proj linear f+g [N,480]", timeit(jp, pp, xa, n=args.n), 6)

    # ------------------------------------------------------------- summary
    print("\n== attribution summary (ms/step)")
    for name, ms, count, tot, note in results:
        print(f"  {name:34s} {tot:8.2f}  ({ms:.3f} x{count}) {note}")


if __name__ == "__main__":
    main()
