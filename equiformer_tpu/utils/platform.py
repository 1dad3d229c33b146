"""Platform selection helper for CLI entrypoints.

Some deployments pin the jax platform at interpreter start (a
sitecustomize-level ``jax.config.update('jax_platforms', ...)``), which the
plain ``JAX_PLATFORMS`` environment variable can NOT override — the config
value wins.  ``EQUIFORMER_TPU_PLATFORM`` is this framework's explicit knob:
every CLI entrypoint calls :func:`apply_platform_env` first, so

  EQUIFORMER_TPU_PLATFORM=cpu python -m equiformer_tpu.cli.train_qm9 ...

always runs where the user asked, pinned sitecustomize or not.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("EQUIFORMER_TPU_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
