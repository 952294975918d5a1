"""Reconstruction I/O — layer 13 of the reference
(`/root/reference/src/theia/io/`, SURVEY §2.11).

Readers/writers for the native checkpoint (npz, versioned), JSON, PLY,
COLMAP, Bundler, NVM, Strecha, 1DSfM, NeRFStudio/SDFStudio and calibration
priors. All host-side (I/O is not numerics); the npz checkpoint is the
SoA-native format — arrays round-trip straight into device memory.
"""

from .recon import (  # noqa: F401
    read_reconstruction,
    write_reconstruction,
    write_reconstruction_json,
)
from .ply import write_ply_file  # noqa: F401
from .colmap import write_colmap_files  # noqa: F401
from .bundler import read_bundler_files, write_bundler_files  # noqa: F401
from .nvm import export_nvm_file, import_nvm_file  # noqa: F401
from .strecha import read_strecha_dataset  # noqa: F401
from .onedsfm import read_1dsfm  # noqa: F401
from .nerfstudio import write_nerfstudio_files, write_sdfstudio_files  # noqa: F401
from .calibration import read_calibration, write_calibration  # noqa: F401
