"""tifffile shim backed by ptv_interpolation_tpu's built-in TIFF codec.

Lets the *reference* implementation (which imports tifffile) run unmodified
in this image for end-to-end parity testing: put this directory on
PYTHONPATH when executing `/root/reference/*.py`.
"""

import sys
import os

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

from ptv_interpolation_tpu.io.tiff import read_tiff as imread  # noqa: E402,F401
from ptv_interpolation_tpu.io.tiff import write_tiff as _write_tiff  # noqa: E402


def imwrite(path, data, imagej=False, metadata=None, **kwargs):
    axes = (metadata or {}).get("axes")
    _write_tiff(path, data, imagej=imagej, axes=axes)
