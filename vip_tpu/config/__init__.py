"""Config / runtime-utility layer (reference L0: vip_hci/config/__init__.py:1-8)."""

from .utils_conf import *
from .utils_param import *
from .paramenum import *
from .timing import *
from .mem import *
from .param import *
from .parallel import *

from . import paramenum
from . import parallel
from .paramenum import (
    ALGO_KEY,
    Adimsdi,
    AutoRankMode,
    Collapse,
    HandleNeg,
    Imlib,
    Initsvd,
    Interpolation,
    LowRankMode,
    Metric,
    OptMethod,
    ReturnList,
    Runmode,
    Scaling,
    Solver,
    SvdMode,
    ThreshMode,
    VarEstim,
)
