"""PSF-subtraction algorithms (reference L4a: vip_hci/psfsub/__init__.py)."""

from .svd import *
from .pca_fullfr import *
from .pca_local import *
from .utils_pca import *
from .medsub import *
from .llsg import *
from .nmf_fullfr import *
from .nmf_local import *
from .loci import *
from .framediff import *
from .rollsub import *
