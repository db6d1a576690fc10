"""Object-oriented interface: Dataset/Frame containers and PostProc
algorithm objects (reference L8: vip_hci/objects/__init__.py)."""

from .dataset import *
from .postproc import *
from .ppandromeda import *
from .ppfmmf import *
from .ppframediff import *
from .ppllsg import *
from .pploci import *
from .ppmediansub import *
from .ppnmf import *
from .pppca import *
