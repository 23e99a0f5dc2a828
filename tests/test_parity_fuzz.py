"""Randomized-config forward-parity campaign against the reference EGNN.

The coords_range parity bug was invisible at normalization_factor=100 and
only appeared under specific config combinations — this campaign sweeps a
diverse grid of (layers, sublayers, attention, tanh, norm_constant,
aggregation, normalization, sin_embedding) with different random weights and
checks dense-vs-reference forward outputs with strict tolerances.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
if not os.path.isdir("/root/reference"):
    pytest.skip("reference repo not available", allow_module_level=True)
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

from egnn.egnn_new import EGNN as TorchEGNN  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from geoldm_tpu.config import EGNNConfig  # noqa: E402
from geoldm_tpu.nn.egnn import egnn_apply  # noqa: E402
from geoldm_tpu.ops.distance import build_edge_mask  # noqa: E402
from tests.parity_utils import egnn_params_from_torch  # noqa: E402

CONFIGS = [
    # (n_layers, inv_sub, attention, tanh, norm_const, agg, norm_factor, sin)
    (1, 1, True, True, 1.0, "sum", 1.0, False),
    (3, 1, True, True, 0.0, "sum", 1.0, False),
    (2, 2, False, True, 1.0, "mean", 1.0, False),
    (2, 1, True, False, 2.0, "sum", 4.0, True),
    (4, 1, False, False, 1.0, "mean", 1.0, True),
    (1, 3, True, True, 0.5, "sum", 100.0, False),
    (2, 2, True, True, 1.0, "sum", 1.0, True),
    (3, 2, False, True, 0.0, "mean", 1.0, False),
]


@pytest.mark.parametrize("spec", CONFIGS, ids=[str(i) for i in range(len(CONFIGS))])
def test_fuzz_forward_parity(spec):
    n_layers, inv_sub, attention, tanh, norm_const, agg, norm_factor, sin = spec
    seed = hash(spec) % (2**31)
    torch.manual_seed(seed)
    b, n, in_nf, out_nf, hidden = 2, 9, 4, 6, 24
    cfg = EGNNConfig(
        in_node_nf=in_nf, out_node_nf=out_nf, hidden_nf=hidden,
        n_layers=n_layers, inv_sublayers=inv_sub, attention=attention,
        tanh=tanh, coords_range=15.0, norm_constant=norm_const,
        sin_embedding=sin, normalization_factor=norm_factor,
        aggregation_method=agg,
    )
    model = TorchEGNN(
        in_node_nf=in_nf, in_edge_nf=1, hidden_nf=hidden, out_node_nf=out_nf,
        n_layers=n_layers, inv_sublayers=inv_sub, attention=attention,
        tanh=tanh, coords_range=15.0, norm_constant=norm_const,
        sin_embedding=sin, normalization_factor=norm_factor,
        aggregation_method=agg,
    )
    model.eval()

    rng = np.random.default_rng(seed)
    node_mask_np = np.zeros((b, n, 1), dtype=np.float32)
    node_mask_np[0, : int(rng.integers(3, n))] = 1.0
    node_mask_np[1, :n] = 1.0
    h_np = (rng.standard_normal((b, n, in_nf)) * node_mask_np).astype(np.float32)
    x_np = (rng.standard_normal((b, n, 3)) * node_mask_np).astype(np.float32)

    rows, cols = [], []
    for bi in range(b):
        for i in range(n):
            for j in range(n):
                rows.append(i + bi * n)
                cols.append(j + bi * n)
    em = node_mask_np[:, :, None, 0] * node_mask_np[:, None, :, 0]
    em = em * (1 - np.eye(n, dtype=np.float32)[None])
    with torch.no_grad():
        h_t, x_t = model(
            torch.from_numpy(h_np.reshape(b * n, in_nf)),
            torch.from_numpy(x_np.reshape(b * n, 3)),
            [torch.LongTensor(rows), torch.LongTensor(cols)],
            node_mask=torch.from_numpy(node_mask_np.reshape(b * n, 1)),
            edge_mask=torch.from_numpy(em.reshape(b * n * n, 1)),
        )

    params = egnn_params_from_torch(model, n_layers, inv_sub, attention)
    node_mask = jnp.asarray(node_mask_np)
    h_j, x_j = egnn_apply(
        params, cfg, jnp.asarray(h_np), jnp.asarray(x_np), node_mask,
        build_edge_mask(node_mask),
    )
    np.testing.assert_allclose(
        np.asarray(h_j), h_t.numpy().reshape(b, n, out_nf), atol=1e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(x_j * node_mask),
        x_t.numpy().reshape(b, n, 3) * node_mask_np,
        atol=1e-4, rtol=1e-3,
    )
