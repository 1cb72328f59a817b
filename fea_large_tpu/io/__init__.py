from fea_large_tpu.io.task import Task, load_task  # noqa: F401
from fea_large_tpu.io.export import export_vtk, export_npz  # noqa: F401
from fea_large_tpu.io.meshio import load_mesh_file, save_mesh_file  # noqa: F401
