"""IO: HDF5/NPZ native persistence, UVFITS/UVH5 export."""

from .hdf5 import save_hdf5, load_hdf5, save_npz, load_npz  # noqa: F401
from .fitsnative import save_fits, load_fits  # noqa: F401
