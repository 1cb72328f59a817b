"""fea_large_tpu — TPU-native large-strain finite-element framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the
reference CPU solver ``zbw2577/fea-large`` (total-Lagrangian large-deformation
hyperelasticity; see SURVEY.md for the full behavior contract):

* Kinematics via the deformation gradient F, strain E = (F^T F - I)/2,
  stress as 2nd Piola-Kirchhoff S (SURVEY.md §5.1).
* Materials: St. Venant-Kirchhoff and compressible neo-Hookean (Ciarlet
  form), each with the consistent tangent C = 2 dS/dC (SURVEY.md §5.4).
* Elements: 4-node linear (TET4) and 10-node quadratic (TET10) tetrahedra,
  Gauss quadrature on the reference tetrahedron (SURVEY.md §5.2-5.3).
* Element tangent stiffness with material + geometric terms, batched over
  element blocks (SURVEY.md §5.5); global assembly into a BCSR operator or
  fully matrix-free.
* Newton-Raphson with incremental load stepping driving dense Cholesky or
  Jacobi-preconditioned CG (SURVEY.md §5.6).
* Domain decomposition across a `jax.sharding.Mesh` with halo exchange over
  ICI (`shard_map` + `ppermute`/`psum`).

Importing this package enables 64-bit JAX globally: the parity contract
(BASELINE.json:5, 1e-8 relative displacement parity) requires f64
accumulation. The f32 Pallas path is an explicit performance opt-in.
"""

from fea_large_tpu import config as config  # noqa: F401  (enables x64)

from fea_large_tpu.mesh.core import Mesh, make_node_sets  # noqa: F401
from fea_large_tpu.materials.base import (  # noqa: F401
    Material,
    lame_from_E_nu,
    make_material,
)
from fea_large_tpu.materials.svk import StVenantKirchhoff  # noqa: F401
from fea_large_tpu.materials.neo_hookean import (  # noqa: F401
    NeoHookean,
    NeoHookeanVolumetric,
)
from fea_large_tpu.materials.autodiff import (  # noqa: F401
    AutodiffMaterial,
    MooneyRivlin,
)

__version__ = "0.1.0"
