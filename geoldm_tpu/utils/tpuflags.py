"""TPU runtime flags the fused Pallas kernels depend on.

The fused EquivariantBlock kernels keep ``[G*N*N, H]`` pair buffers live in
VMEM. At flagship QM9 denoiser shapes (N=32, H=256) the *backward* kernel's
live set (~17.3 MB even at group=1) exceeds libtpu's default 16 MB
scoped-VMEM allocation, so any pallas-backed training run must raise the
limit BEFORE libtpu initializes. A v5e core carries 128 MB of VMEM; 64 MB
scoped leaves XLA plenty for its own buffers and measures 1.26x faster
value+grad than the XLA path (scripts/bench_pallas_bwd.py).

The kernel group-size heuristics (ops/pallas_egnn.py:_auto_group*) read the
limit back via :func:`scoped_vmem_limit_kib` so their VMEM budgets always
match what the runtime actually granted.
"""

from __future__ import annotations

import os
import re

DEFAULT_SCOPED_VMEM_KIB = 65536
_FLAG = "--xla_tpu_scoped_vmem_limit_kib"


def ensure_scoped_vmem_limit(kib: int = DEFAULT_SCOPED_VMEM_KIB) -> None:
    """Append the scoped-VMEM flag to LIBTPU_INIT_ARGS if absent.

    Must run before jax initializes the TPU backend (i.e. before the first
    ``jax.devices()`` / ``jax.default_backend()`` call). A no-op if the
    user already pinned the flag themselves.
    """
    cur = os.environ.get("LIBTPU_INIT_ARGS", "")
    if _FLAG in cur:
        return
    os.environ["LIBTPU_INIT_ARGS"] = (cur + " " if cur else "") + f"{_FLAG}={kib}"


def scoped_vmem_limit_kib() -> int:
    """The scoped-VMEM limit the TPU runtime will enforce (KiB)."""
    m = re.search(rf"{_FLAG}=(\d+)", os.environ.get("LIBTPU_INIT_ARGS", ""))
    return int(m.group(1)) if m else 16384
