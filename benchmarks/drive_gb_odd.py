"""Real-chip drive of odd gb kernel configs (gb=7 via D=7, gb=9 via D=9).

The gb divisor scan can select odd group-batch values (sharded flagship
g_local=343 -> gb=7; odd D -> gb=9) that the CPU interpreter accepts but
real Mosaic might not. Drive them on the chip with recall checks.
"""
import time

import numpy as np


def main() -> None:
    import jax

    import nns_tpu  # noqa: F401
    from nns_tpu.data import make_dataset
    from nns_tpu.kernels.cell_list import CellListEngine
    from nns_tpu.kernels.oracle import recall_at_1

    print("backend:", jax.default_backend(), flush=True)
    for D in (7, 9):
        q, r = make_dataset(k=3, m=2048, n=65536, seed=1000 + D)
        t0 = time.time()
        eng = CellListEngine(r, d_per_dim=D)
        print(f"D={D}: built in {time.time()-t0:.1f}s (g_total={eng.D**3})",
              flush=True)
        t0 = time.time()
        idx, ok = eng.query_with_flags(q)
        rec = recall_at_1(np.asarray(idx), q, r)
        print(f"D={D}: query {time.time()-t0:.1f}s recall={rec} "
              f"cert_frac={np.asarray(ok).mean():.4f}", flush=True)
        assert rec == 1.0
    print("gb=7/9 drive OK", flush=True)


if __name__ == "__main__":
    main()
