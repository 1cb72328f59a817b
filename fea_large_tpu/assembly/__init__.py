from fea_large_tpu.assembly.scatter import NodeScatter  # noqa: F401
from fea_large_tpu.assembly.dense import assemble_dense  # noqa: F401
from fea_large_tpu.assembly.bcsr import BCSRStructure, BCSRMatrix  # noqa: F401
from fea_large_tpu.assembly.matfree import TangentState, make_operator  # noqa: F401
