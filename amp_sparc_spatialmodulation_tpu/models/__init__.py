from . import bamp, montecarlo, scamp, vamp, vamp2  # noqa: F401
