from fea_large_tpu.materials.base import (  # noqa: F401
    Material,
    lame_from_E_nu,
    make_material,
    MATERIAL_REGISTRY,
)
from fea_large_tpu.materials.svk import StVenantKirchhoff  # noqa: F401
from fea_large_tpu.materials.neo_hookean import (  # noqa: F401
    NeoHookean,
    NeoHookeanVolumetric,
)
