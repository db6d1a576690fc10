"""PSF-subtraction algorithms (reference L4a: vip_hci/psfsub/__init__.py)."""

from .svd import *
from .pca_fullfr import *
from .medsub import *
from .pca_local import *
