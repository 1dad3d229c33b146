"""Batched-radial A/B (EQUIFORMER_TPU_BATCH_RADIAL): one nn.vmap-stacked
pass computes every TransBlock's attention radial-MLP weights.

Equivalence is exact by construction — the stacked path evaluates the same
RadialProfile on the same edge scalars with the same per-block parameters —
so the test transplants the per-block ``dtp_rad`` params from a flag-OFF
init into the flag-ON ``radial_stack`` layout and asserts identical model
outputs (both message paths), plus finite nonzero grads through the stack.

Reference semantics being preserved: the per-block radial of
/root/reference/nets/graph_attention_transformer.py:447-466 (fc_neurons ->
DepthwiseTensorProduct weights); batching across blocks is a pure
TPU-scheduling change.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.core import unfreeze

from tests.test_models import _batch, _tiny_model


def _transplant(params_off, num_layers, sep_name):
    """flag-OFF param tree -> flag-ON tree: pop each block's dtp_rad and
    stack them (leading axis = block) under top-level ``radial_stack``."""
    po = jax.tree_util.tree_map(lambda x: x, unfreeze(params_off))
    rads = []
    for i in range(num_layers):
        sep = po["params"][f"block_{i}"]["ga"][sep_name]
        rads.append(sep.pop("dtp_rad"))
    po["params"]["radial_stack"] = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, 0), *rads
    )
    return po


@pytest.mark.parametrize("nonlinear", [False, True])
def test_batch_radial_equivalence(monkeypatch, nonlinear):
    monkeypatch.delenv("EQUIFORMER_TPU_BATCH_RADIAL", raising=False)
    model = _tiny_model(nonlinear_message=nonlinear, alpha_drop=0.0,
                        proj_drop=0.0, drop_path_rate=0.0)
    b = _batch()
    params_off = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    out_off = np.asarray(model.apply(params_off, b, deterministic=True))

    monkeypatch.setenv("EQUIFORMER_TPU_BATCH_RADIAL", "1")
    sep_name = "sep_act" if nonlinear else "sep"
    params_on = _transplant(params_off, model.num_layers, sep_name)

    # the transplanted tree must match what a flag-ON init produces
    init_on = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    want = jax.tree_util.tree_map(np.shape, unfreeze(init_on))
    got = jax.tree_util.tree_map(np.shape, params_on)
    assert jax.tree_util.tree_structure(want) == jax.tree_util.tree_structure(got)
    assert want == got

    out_on = np.asarray(model.apply(params_on, b, deterministic=True))
    np.testing.assert_allclose(out_on, out_off, rtol=1e-6, atol=1e-9)


def test_batch_radial_equivalence_oc20(monkeypatch):
    """Same transplant equivalence on the OC20 model (own block loop; the
    attn/aux heads' radials stay per-module and are untouched)."""
    from tests.test_oc20 import _oc20_batch, _tiny_oc20

    monkeypatch.delenv("EQUIFORMER_TPU_BATCH_RADIAL", raising=False)
    model = _tiny_oc20(nonlinear_message=True, use_atom_edge_attr=True)
    b = _oc20_batch()
    params_off = model.init(jax.random.PRNGKey(0), b, deterministic=True)
    out_off = np.asarray(model.apply(params_off, b, deterministic=True))

    monkeypatch.setenv("EQUIFORMER_TPU_BATCH_RADIAL", "1")
    params_on = _transplant(params_off, model.num_layers, "sep_act")
    out_on = np.asarray(model.apply(params_on, b, deterministic=True))
    np.testing.assert_allclose(out_on, out_off, rtol=1e-6, atol=1e-9)


def test_batch_radial_grads_finite(monkeypatch):
    monkeypatch.setenv("EQUIFORMER_TPU_BATCH_RADIAL", "1")
    model = _tiny_model(nonlinear_message=True)
    b = _batch()
    params = model.init(jax.random.PRNGKey(1), b, deterministic=True)
    assert "radial_stack" in unfreeze(params)["params"]

    def loss(p):
        out = model.apply(p, b, deterministic=True)
        return jnp.sum(jnp.where(b.graph_mask, out, 0.0) ** 2)

    g = jax.grad(loss)(params)
    stack_g = unfreeze(g)["params"]["radial_stack"]
    leaves = jax.tree_util.tree_leaves(stack_g)
    assert leaves and all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)
