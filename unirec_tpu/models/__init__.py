from unirec_tpu.models import cf, sequential  # noqa: F401
from unirec_tpu.models.base import BaseRecommender, SeqRecBase  # noqa: F401

try:  # optional families registered as they land
    from unirec_tpu.models import solvers  # noqa: F401
except ImportError:
    pass
try:
    from unirec_tpu.models import rank  # noqa: F401
except ImportError:
    pass
