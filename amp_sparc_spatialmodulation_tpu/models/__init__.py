from . import (bamp, capacity, montecarlo, scamp, sparc_tools,  # noqa: F401
               vamp, vamp2)
