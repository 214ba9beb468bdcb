"""fibergen_tpu — TPU-native FFT homogenization framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
fospald/fibergen: Lippmann-Schwinger spectral solvers (basic, Eyre-Milton
polarization, CG, Nesterov, nonlinear-CG, Newton-Krylov) for linear
elasticity, finite-strain hyperelasticity, Stokes flow, heat conduction and
Darcy flow on periodic voxel microstructures.
"""

from .api import FG, isotropic_laminate_stiffness
from .core.grid import Grid
from .materials import convert, laws
from .materials.laws import (
    LinearGeneral,
    LinearIsotropic,
    MaterialLaw,
    NeoHooke,
    NeoHooke2,
    SaintVenantKirchhoff,
    ScalarLinearIsotropic,
    make_law,
)
from .materials.mixing import MixedMaterial, Phase, VoigtMixed, make_mixed
from .solvers.ls import LSSolver, SolverOptions

__version__ = "0.1.0"

__all__ = [
    "FG",
    "Grid",
    "LSSolver",
    "SolverOptions",
    "MaterialLaw",
    "LinearIsotropic",
    "ScalarLinearIsotropic",
    "LinearGeneral",
    "SaintVenantKirchhoff",
    "NeoHooke",
    "NeoHooke2",
    "make_law",
    "Phase",
    "MixedMaterial",
    "VoigtMixed",
    "make_mixed",
    "convert",
    "laws",
]
