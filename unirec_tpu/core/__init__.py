from unirec_tpu.core.mesh import MeshContext, create_mesh  # noqa: F401
from unirec_tpu.core.optim import build_optimizer  # noqa: F401
