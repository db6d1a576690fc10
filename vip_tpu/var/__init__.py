"""Image primitives: coordinates, shapes/masks, filters, 2-d fits
(reference L2: vip_hci/var/__init__.py)."""

from .coords import *
from .shapes import *
from .filters import *
from .fit_2d import *
