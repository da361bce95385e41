"""cli subpackage."""

import os

__all__ = ["apply_platform_env"]


def apply_platform_env() -> None:
    """Make ``JAX_PLATFORMS`` authoritative for the CLI tools.

    Some environments force-register an out-of-tree TPU plugin at interpreter
    start, which overrides the ``JAX_PLATFORMS`` environment variable; only
    the config API wins over it.  Every CLI main() calls this first so
    ``JAX_PLATFORMS=cpu of2-demo ...`` reliably runs on CPU (the subprocess
    entry-point tests depend on it; on stock installs this is a no-op
    re-statement of the env var).
    """
    plat = os.environ.get("JAX_PLATFORMS", "").strip()
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
