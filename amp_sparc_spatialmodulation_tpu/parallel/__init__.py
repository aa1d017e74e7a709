from . import mesh, sweep, tensor  # noqa: F401
