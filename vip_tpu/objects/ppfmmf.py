"""PostProc wrapper for FMMF (reference vip_hci/objects/ppfmmf.py)."""

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..config.utils_conf import algo_calculates_decorator as calculates
from ..invprob.fmmf import FMMF_Params, fmmf
from ._builder import dataclass_builder
from .dataset import Dataset
from .postproc import PostProc

__all__ = ["FMMFBuilder", "PPFMMF"]


@dataclass
class PPFMMF(PostProc, FMMF_Params):
    """Object wrapper of vip_hci fmmf (reference ppfmmf.py:17-84)."""

    _algo_name: str = "fmmf"
    snr_map: np.ndarray = None

    @calculates("frame_final", "snr_map")
    def run(self, dataset: Optional[Dataset] = None,
            nproc: Optional[int] = None):
        """Run FMMF (reference ppfmmf.py:28-73)."""
        self.snr_map = None
        self._update_dataset(dataset)
        if self.dataset.fwhm is None:
            raise ValueError("`fwhm` has not been set")
        self._explicit_dataset()
        if nproc is not None:
            self.nproc = nproc
        params_dict = self._create_parameters_dict(FMMF_Params)
        all_params = {"algo_params": self}
        res = fmmf(**all_params)
        self.frame_final, self.snr_map = res
        if self.results is not None:
            self.results.register_session(params=params_dict,
                                          frame=self.frame_final,
                                          snr_map=self.snr_map,
                                          algo_name=self._algo_name)

    def make_snrmap(self):
        """No-op: fmmf already produces the snr_map
        (reference ppfmmf.py:75-81)."""
        self.detection_map = self.snr_map


FMMFBuilder = dataclass_builder(PPFMMF)
