from .profile import (
    ProfileTable,
    downstream_from_direction,
    load_profile_dat,
    profile_boundary_fields,
)
from .flux import apply_flux_correction

__all__ = [
    "ProfileTable", "downstream_from_direction", "load_profile_dat",
    "profile_boundary_fields", "apply_flux_correction",
]
