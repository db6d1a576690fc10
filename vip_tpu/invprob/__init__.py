"""Inverse-problem post-processing algorithms: ANDROMEDA [MUG09]/[CAN15],
Forward Model Matched Filter [RUF17]/[DAH21a], PACO [FLA18]
(reference L7: vip_hci/invprob/__init__.py)."""

from .andromeda import *
from .fmmf import *
from .paco import *
