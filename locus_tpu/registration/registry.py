"""Registration method registry (reference:
multithreaded_gicp/include/registration_settings.h — string -> method
dispatch used by both odometry and localization SetupICP)."""
from __future__ import annotations

from typing import Callable

from locus_tpu.config import RegistrationConfig

_METHODS = {}


def register_method(name: str):
    def deco(fn: Callable):
        _METHODS[name] = fn
        return fn
    return deco


def make_registrar(cfg: RegistrationConfig) -> Callable:
    """Returns align(source, target, guess) -> GICPResult for the
    configured method."""
    name = cfg.registration_method
    if name not in _METHODS:
        # late imports so modules self-register
        import locus_tpu.registration.gicp  # noqa: F401
        try:
            import locus_tpu.registration.ndt  # noqa: F401
        except ImportError:
            pass
    if name not in _METHODS:
        raise ValueError(
            f"Unknown registration method {name!r}; available: {sorted(_METHODS)}"
        )
    fn = _METHODS[name]

    def align(source, target, guess=None, **kw):
        return fn(source, target, guess=guess, cfg=cfg, **kw)

    return align


def _register_builtins():
    from locus_tpu.registration.gicp import gicp_register

    _METHODS.setdefault("gicp", gicp_register)


_register_builtins()
