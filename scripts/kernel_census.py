"""Count fused-kernel primitive binds in the MD17 e+f-grad step (trace-only,
runs on CPU): which leg variants dominate the double-backward jaxpr, to guide
consolidation (the reference's dominant training cost is this pass,
graph_attention_transformer_md17.py:318-325).

Run: PYTHONPATH=. python scripts/kernel_census.py [--batch 8]
"""

import argparse
import collections

import jax


def _walk(obj, counter, seen):
    if id(obj) in seen:
        return
    seen.add(id(obj))
    if hasattr(obj, "eqns"):
        census(obj, counter, seen)
    elif hasattr(obj, "jaxpr"):
        _walk(obj.jaxpr, counter, seen)
    elif isinstance(obj, (list, tuple)):
        for x in obj:
            _walk(x, counter, seen)
    elif isinstance(obj, dict):
        for x in obj.values():
            _walk(x, counter, seen)


def census(jaxpr, counter, seen=None):
    if seen is None:
        seen = set()
    for eqn in jaxpr.eqns:
        name = str(eqn.primitive)
        if name.startswith("equiformer"):
            key = name
            if name == "equiformer_dtplin_leg":
                key += f"[{eqn.params.get('out_leg')}]"
            counter[key] += 1
        _walk(dict(eqn.params), counter, seen)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from equiformer_tpu.models.md17_models import energy_and_forces
    from profile_md17 import build

    model, params, batch = build(args.batch, True, False)

    def ef_loss(p, b):
        e, f = energy_and_forces(model, p, b)
        return jnp.sum(jnp.abs(e)) + 80.0 * jnp.sum(jnp.abs(f))

    for label, fn in (
        ("fwd", lambda p, b: model.apply(p, b, deterministic=True)),
        ("forces", lambda p, b: energy_and_forces(model, p, b)[1]),
        ("e+f-grad", jax.grad(ef_loss)),
    ):
        jaxpr = jax.make_jaxpr(fn)(params, batch)
        counter = collections.Counter()
        census(jaxpr.jaxpr, counter)
        total = sum(counter.values())
        print(f"== {label}: {total} fused-primitive eqns")
        for k, v in sorted(counter.items(), key=lambda kv: -kv[1]):
            print(f"  {k:45s} {v}")


if __name__ == "__main__":
    main()
