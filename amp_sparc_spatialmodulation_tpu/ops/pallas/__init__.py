from . import fused_bamp  # noqa: F401
