"""Global impl dispatch: 'xla' (pure jnp, any backend) or 'pallas' (TPU kernels).

Default resolves to 'pallas' when the default JAX backend is TPU, else 'xla'.
"""

from __future__ import annotations

import jax

_DEFAULT_IMPL = None


def set_default_impl(impl: str | None):
    global _DEFAULT_IMPL
    assert impl in (None, "xla", "pallas"), impl
    _DEFAULT_IMPL = impl


def get_default_impl() -> str:
    if _DEFAULT_IMPL is not None:
        return _DEFAULT_IMPL
    try:
        platform = jax.default_backend()
    except Exception:
        platform = "cpu"
    return "pallas" if platform == "tpu" else "xla"


def resolve(impl: str | None) -> str:
    return impl if impl is not None else get_default_impl()
