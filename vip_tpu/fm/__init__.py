"""Forward modeling (reference L7: vip_hci/fm/__init__.py)."""

from .fakecomp import *
from .fakedisk import *
from .negfc_fmerit import *
from .negfc_simplex import *
from .negfc_mcmc import *
from .negfc_nested import *
from .negfc_speckle_noise import *
from .negfd_fmerit import *
from .negfd_interp import *
from .negfd_simplex import *
from .utils_mcmc import *
from .utils_negfc import *
from .utils_negfd import *
from .scattered_light_disk import *
