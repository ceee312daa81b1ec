"""sphax — TPU-native smoothed-particle hydrodynamics (JAX/Pallas).

Brand-new framework providing the capabilities of the reference
``dmuley/sph-code`` (rudimentary O(N^2) Python SPH; SURVEY.md) in a TPU-first
design. See SURVEY.md for the blueprint and BASELINE.md for targets.
"""
__version__ = "0.1.0"

from sphax.configs import SPHConfig, SOD, SEDOV, KH, EVRARD, TURB  # noqa: F401
from sphax.core.state import Domain, ParticleState, make_state, unit_box, box  # noqa: F401
