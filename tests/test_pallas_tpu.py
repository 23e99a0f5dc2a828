"""Real-chip Mosaic lowering of the SP Pallas stage kernels.

tests/test_sp_pallas.py validates ops/pallas_egnn_sp.py's SEMANTICS in
interpret mode on the virtual CPU mesh; this file validates the MOSAIC
LOWERING on an actual TPU — the failure class interpret mode cannot see
(the round-3 pad-64 scope-OOM came from the Mosaic stack allocator, not
the kernel math). The kernels' novel ingredients both get direct
hardware coverage:

- the GLOBAL row offset riding in as a scalar SMEM operand (injected
  nonzero here, exactly what a device > 0 in an SP mesh would pass);
- the split full-view / row-view gradients from the fused in-kernel vjp
  (the backward pallas_call with both constant-index accumulating and
  tile-local output blocks).

Single chip suffices: ``sp_stage_apply`` is an ordinary pallas_call —
shard_map only supplies its operands — so invoking it directly with a
slab sliced at offset r0 reproduces device r0/S's work bit-for-bit.
Mosaic output is compared against interpret mode on the same inputs
(interpret is the semantics oracle, itself pinned against
nn.egnn.egnn_apply by test_sp_pallas.py).

Excluded from the CPU tiers (the default suite pins JAX_PLATFORMS=cpu);
run on hardware with:

    GEOLDM_TEST_PLATFORM=tpu python -m pytest tests/test_pallas_tpu.py -q
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geoldm_tpu.config import EGNNConfig
from geoldm_tpu.nn.egnn import egnn_init
from geoldm_tpu.ops.pallas_egnn_sp import sp_stage_apply, sp_stage_tiles
from geoldm_tpu.ops.pallas_egnn_tiled import (
    _coord_weight_dict,
    _gcl_weight_dict,
)
from geoldm_tpu.utils.tpuflags import grad_compiler_options

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="Mosaic lowering test needs a real TPU backend "
               "(GEOLDM_TEST_PLATFORM=tpu)",
    ),
]


def _cfg(hidden):
    return EGNNConfig(
        in_node_nf=6, out_node_nf=6, hidden_nf=hidden, n_layers=1,
        inv_sublayers=1, attention=True, tanh=True, coords_range=15.0,
        norm_constant=1.0, sin_embedding=False, normalization_factor=100.0,
        aggregation_method="sum",
    )


def _stage_inputs(kind, n, s, r0, hidden, seed=0, n_real=None):
    """Full [B,N,*] views + the [B,S,*] slab at global offset r0, plus the
    stage weight dict — the exact operands _block_rows_pallas would pass
    on the SP device owning rows [r0, r0+s).

    ``n_real`` < n mirrors egnn_apply_sp's pad-to-8*sp: rows beyond it are
    masked padding (the GEOM pad-184 recipe at sp=2 pads to N=192 and the
    slab is S=96 — production slabs are always 8-aligned; sp_stage_tiles
    rejects anything else since the silent-row-skip fix)."""
    cfg = _cfg(hidden)
    params = egnn_init(jax.random.key(seed), cfg)
    block = jax.tree.map(lambda a: a[0], params["blocks"])
    if kind == "gcl":
        weights, _ = _gcl_weight_dict(cfg, block["gcls"][0])
    else:
        weights = _coord_weight_dict(block)

    b = 2
    n_real = n if n_real is None else n_real
    ks = jax.random.split(jax.random.key(seed + 1), 3)
    node_mask = np.zeros((b, n, 1), np.float32)
    node_mask[0, : n_real - 3] = 1.0
    node_mask[1, :n_real] = 1.0
    mask = jnp.asarray(node_mask)
    h = jax.random.normal(ks[0], (b, n, hidden)) * mask
    x = jax.random.normal(ks[1], (b, n, 3)) * mask
    x0 = jax.random.normal(ks[2], (b, n, 3)) * mask

    full = (h, x, x0, mask)
    rows = tuple(a[:, r0 : r0 + s] for a in full)
    r0_base = jnp.asarray([r0], jnp.int32)
    return cfg, weights, full, rows, r0_base


def _run(kind, n, s, r0, hidden, interpret, n_real=None):
    cfg, weights, full, rows, r0_base = _stage_inputs(
        kind, n, s, r0, hidden, n_real=n_real
    )
    tiles = sp_stage_tiles(s, n, hidden)
    fn = functools.partial(
        sp_stage_apply, cfg, kind, n, tiles, None, interpret, 0
    )
    out = jax.jit(fn)(weights, full, rows, r0_base)
    return np.asarray(out), (cfg, tiles, weights, full, rows, r0_base)


# QM9-ish (pad 32, hidden 64) and the GEOM recipe shape under sp=2
# (egnn_apply_sp pads 184 -> 192, slab S=96, real rows masked at 184) —
# both with the slab at a NONZERO global offset, including the final slab
# (whose diagonal window sits at the far end of the columns, and whose
# tail rows are exactly the ones the pre-fix non-divisor tiling skipped).
CASES = [
    ("gcl", 32, 8, 8, 64, None),
    ("gcl", 32, 8, 24, 64, None),
    ("coord", 32, 8, 24, 64, None),
    ("gcl", 192, 96, 96, 128, 184),
    ("coord", 192, 96, 96, 128, 184),
]


def _assert_lowering_match(got, want, rel_l2=3e-3, atol=2e-2, rtol=2e-2,
                           l2_atol=2e-5):
    """Mosaic-vs-interpret comparison at the honest numeric bar.

    Mosaic lowers f32 ``dot_general`` at DEFAULT precision as one-pass
    bf16 operand passes on the MXU, while the interpret path's XLA dots
    run at full f32 — measured on TPU v5 lite this puts elementwise
    relative differences at bf16-rounding scale (~4e-3 worst case on the
    N=184/hidden=128 GEOM shape; the N=32 shapes mostly sit under 2e-5).
    The failure class this test exists for — wrong row indexing, a bad
    SMEM global-offset, scope-OOM, gradient slab misplacement — produces
    O(1) errors or hard compile failures, so a bf16-scale relative-L2
    bound plus a coarse elementwise check keeps full detection power.

    The L2 bound is mixed (``rel_l2 * ||want|| + l2_atol``): a gradient
    leaf whose true value nearly cancels (e.g. the xavier-0.001-scaled
    coord-MLP last layer; measured ||g|| = 1.7e-4 with ||diff|| = 1e-6 on
    a real v5e) would otherwise fail on bf16 rounding of O(1) summands —
    a pure-relative bar is meaningless when the denominator is itself a
    cancellation residue. l2_atol = 2e-5 sits 4+ orders below any O(1)
    indexing-bug signature.
    """
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    denom = np.linalg.norm(want)
    assert np.linalg.norm(got - want) < rel_l2 * denom + l2_atol
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol)


@pytest.mark.parametrize("kind,n,s,r0,hidden,n_real", CASES)
def test_sp_stage_mosaic_forward_matches_interpret(kind, n, s, r0, hidden,
                                                   n_real):
    got, _ = _run(kind, n, s, r0, hidden, interpret=False, n_real=n_real)
    want, _ = _run(kind, n, s, r0, hidden, interpret=True, n_real=n_real)
    _assert_lowering_match(got, want)


@pytest.mark.parametrize("kind,n,s,r0,hidden,n_real", CASES[:3] + CASES[3:4])
def test_sp_stage_mosaic_backward_matches_interpret(kind, n, s, r0, hidden,
                                                    n_real):
    cfg, weights, full, rows, r0_base = _stage_inputs(
        kind, n, s, r0, hidden, n_real=n_real
    )
    tiles = sp_stage_tiles(s, n, hidden)

    def loss(interpret, weights, full, rows):
        out = sp_stage_apply(cfg, kind, n, tiles, None, interpret, 0,
                             weights, full, rows, r0_base)
        return jnp.sum(out * out)

    grad = jax.grad(functools.partial(loss, False), argnums=(0, 1, 2))
    # The fused in-kernel vjp runs under the raised scoped-VMEM limit —
    # the standard contract for every jit containing these backwards.
    g_mosaic = jax.jit(grad, compiler_options=grad_compiler_options())(
        weights, full, rows
    )
    g_interp = jax.jit(
        jax.grad(functools.partial(loss, True), argnums=(0, 1, 2))
    )(weights, full, rows)

    flat_m, _ = jax.tree.flatten(g_mosaic)
    flat_i, _ = jax.tree.flatten(g_interp)
    assert len(flat_m) == len(flat_i)
    # Gradients chain the bf16-scale dot differences through the vjp, so
    # the elementwise bar is coarser than the forward's; the relative-L2
    # bound still pins indexing/accumulation bugs (O(1) errors).
    for a, b in zip(flat_m, flat_i):
        _assert_lowering_match(
            np.asarray(a), np.asarray(b), rel_l2=5e-3, atol=5e-2, rtol=5e-2
        )
    # Full-view and row-view gradients are genuinely split: the full-view
    # h-grad must carry mass OUTSIDE the slab's own rows (messages into
    # other devices' rows), which shard_map's all_gather transpose would
    # psum_scatter back.
    dh_full = np.asarray(g_mosaic[1][0])
    outside = np.delete(dh_full, np.s_[r0 : r0 + s], axis=1)
    assert np.abs(outside).max() > 0
