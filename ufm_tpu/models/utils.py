"""Model utils (API parity with reference uniflowmatch/models/utils.py)."""

from ufm_tpu.utils.geometry import get_meshgrid_jnp as get_meshgrid

__all__ = ["get_meshgrid"]
