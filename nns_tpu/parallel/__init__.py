from nns_tpu.parallel.mesh import make_mesh, best_mesh  # noqa: F401
from nns_tpu.parallel.sharded import nns_sharded, sharded_argmin  # noqa: F401
