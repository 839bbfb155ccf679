"""Shim: the demo run builder lives in the package now."""
from artis_tpu.synthdata import make_run  # noqa: F401
