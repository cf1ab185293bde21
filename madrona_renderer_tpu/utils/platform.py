"""Make ``JAX_PLATFORMS=cpu`` actually mean CPU under the axon plugin.

The axon TPU plugin ignores the ``JAX_PLATFORMS`` environment variable;
only the ``jax_platforms`` *config flag* wins. Without this, a
``JAX_PLATFORMS=cpu`` CLI/example invocation silently picks the TPU —
and the one real chip sits behind a single-client tunnel, so such a
process becomes a second client (mutual-deadlock risk), and any wrapper
timeout that kills it mid-execution wedges the tunnel for the next
30–90 minutes (CLAUDE.md, hard-won).

Library code never mutates global jax config on import; every CLI
``main()`` (runners, examples) calls :func:`honor_jax_platforms_env`
explicitly before first device use instead.

No reference analog: the reference picks its GPU by ordinal
(``src/headless.cpp:37``) and has no second execution platform.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """If ``JAX_PLATFORMS`` names platforms, mirror it into the jax
    config flag (which the axon plugin respects). No-op when unset, or
    when jax already initialized its backends (too late to matter)."""
    plats = os.environ.get("JAX_PLATFORMS", "").strip()
    if not plats:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plats.lower())
    except Exception:
        # Backends already initialized — the env var either worked or
        # it is too late; never break a CLI over it.
        pass
