"""kinetica_tpu: TPU-native CRN exploration and stiff kinetic simulation.

Brand-new framework with the capabilities of Kinetica.jl (reference at
/root/reference), built on jax/XLA/Pallas. See SURVEY.md for the layer map.

Double precision is enabled at import (stiff integration at reltol 1e-8
over 1e5 s timescales requires it); set KINETICA_TPU_NO_X64=1 to opt out.
"""
import os as _os

import jax as _jax

if not _os.environ.get("KINETICA_TPU_NO_X64"):
    _jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
