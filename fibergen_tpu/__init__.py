"""fibergen_tpu — TPU-native FFT homogenization framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
fospald/fibergen: Lippmann-Schwinger spectral solvers (basic, Eyre-Milton
polarization, CG, Nesterov, nonlinear-CG, Newton-Krylov) for linear
elasticity, finite-strain hyperelasticity, Stokes flow, heat conduction and
Darcy flow on periodic voxel microstructures.
"""

def _enable_persistent_compilation_cache():
    """Persist compiled XLA executables across processes — the TPU-native
    equivalent of the reference persisting FFTW wisdom to
    ~/.fibergen_fft_wisdom_<host> (fibergen.cpp:25259-25292).  Through the
    axon tunnel a single program compile costs 20-60 s, which dominates
    end-to-end demo walls; with the cache a repeat run pays none of it
    (measured: cold Grosmont 218 s -> warm 44 s).

    FG.run() has configured this since round 3 (api.FG._init_compile_cache)
    but only for XML-project runs; enabling it at import covers direct
    library use (LSSolver, bench.py) too.  Same directory and env
    conventions: FIBERGEN_TPU_COMPILE_CACHE=<dir> overrides,
    =off disables; an explicit jax_compilation_cache_dir is left alone."""
    import os

    path = os.environ.get("FIBERGEN_TPU_COMPILE_CACHE", "")
    if path.lower() in ("off", "0", "none"):
        return
    try:
        import jax

        from .utils import cpu_only_platform

        if cpu_only_platform(jax) and not path:
            return  # CPU AOT cache reloads log SIGILL-risk errors
        if (jax.config.jax_compilation_cache_dir is None
                and "JAX_COMPILATION_CACHE_DIR" not in os.environ):
            if not path:
                path = os.path.join(os.path.expanduser("~"), ".cache",
                                    "fibergen_tpu", "xla-cache")
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 - cache is an optimization only
        pass


_enable_persistent_compilation_cache()

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
