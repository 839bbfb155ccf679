"""Shim: the synthetic dataset generator lives in the package now."""
from artis_tpu.synthdata import write_synthetic_atomicdata  # noqa: F401
