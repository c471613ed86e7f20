"""Fused Pallas leaf (ops/multicut_leaf.py) vs the XLA matrix path.

The kernel mirrors _hier_gaec_matrix's levels 0-1 statement by statement, so
the full handed-over state — pixel ranks, live counts, freeze bookkeeping,
pair matrices, min-pixel vectors — must be BIT-IDENTICAL to the XLA loop's
on integer-valued costs (where f32 regrouping cannot change sums), and the
final labels must match through the public multicut_grid entry. On CPU the
kernel runs in Pallas interpret mode (tests force JAX_PLATFORMS=cpu,
conftest.py); the same assertions were run compiled on the TPU backend
before the kernel became the default leaf.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from image_compression_tpu.ops.multicut import (  # noqa: E402
    multicut_grid, multicut_objective)
from image_compression_tpu.ops.multicut_hier import (  # noqa: E402
    default_caps, hier_gaec, lean_caps, plan_levels, smallest_pixel_labels)

STATE_FIELDS = ("rank_img", "n_regions", "frozen", "final_gid", "overflow",
                "minpix", "pair")


def _both(costs, caps, rpl):
    out = {}
    for leaf in ("xla", "fused"):
        out[leaf] = hier_gaec(jnp.asarray(costs), caps=caps, agg="matrix",
                              rounds_per_level=rpl, leaf=leaf)
    return out["xla"], out["fused"]


@pytest.mark.parametrize("caps_kind", ["flat64", "default"])
@pytest.mark.parametrize("shape", [(64, 64), (32, 64)])
def test_fused_leaf_state_bitwise(caps_kind, shape):
    """Integer costs: every handed-over state field matches the XLA loop."""
    rng = np.random.default_rng(3)
    costs = rng.integers(-8, 9, size=shape + (2,)).astype(np.float32)
    sides = plan_levels(*shape, 8)
    caps = (lean_caps(sides, "flat64") if caps_kind == "flat64"
            else default_caps(sides))
    a, b = _both(costs, caps, [2, 1])
    for field in STATE_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, field)), np.asarray(getattr(b, field)),
            err_msg=field)
    np.testing.assert_array_equal(np.asarray(smallest_pixel_labels(a)),
                                  np.asarray(smallest_pixel_labels(b)))


def test_fused_leaf_heavy_freezing():
    """All-repulsive costs keep every pixel a singleton, so the level-1
    transition freezes ~3/4 of each supertile's regions — the freeze path
    (final_gid minlabels, -1 ranks, overflow accounting) must match too."""
    rng = np.random.default_rng(5)
    costs = (-np.abs(rng.normal(size=(64, 64, 2))) - 0.1).astype(np.float32)
    sides = plan_levels(64, 64, 8)
    a, b = _both(costs, lean_caps(sides, "flat64"), [2, 1])
    assert int(b.overflow) > 1000  # the stress actually hit the freeze path
    for field in STATE_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, field)), np.asarray(getattr(b, field)),
            err_msg=field)


def test_fused_leaf_through_multicut_grid():
    """Public entry with the production profile: labels bit-equal on integer
    costs, objective within f32-regrouping noise on real costs."""
    rng = np.random.default_rng(7)
    kw = dict(hier_rounds=(2, 1), hier_caps="flat64", icm_sweeps=0,
              hier_agg="matrix")
    ci = rng.integers(-8, 9, size=(64, 64, 2)).astype(np.float32)
    li = {leaf: np.asarray(multicut_grid(jnp.asarray(ci), hier_leaf=leaf,
                                         **kw)) for leaf in ("xla", "fused")}
    np.testing.assert_array_equal(li["xla"], li["fused"])

    cr = rng.normal(size=(64, 64, 2)).astype(np.float32)
    lr = {leaf: np.asarray(multicut_grid(jnp.asarray(cr), hier_leaf=leaf,
                                         **kw)) for leaf in ("xla", "fused")}
    oa = multicut_objective(cr, lr["xla"])
    ob = multicut_objective(cr, lr["fused"])
    assert abs(oa - ob) <= 0.01 * abs(oa) + 1e-3


def test_fused_leaf_trivial_invariants():
    """All-attractive -> one cluster; all-repulsive -> all singletons."""
    ones = jnp.ones((32, 32, 2), jnp.float32)
    kw = dict(hier_rounds=(2, 1), hier_caps="flat64", icm_sweeps=0,
              hier_agg="matrix", hier_leaf="fused")
    lab = np.asarray(multicut_grid(ones, **kw))
    assert len(np.unique(lab)) == 1
    lab = np.asarray(multicut_grid(-ones, **kw))
    assert len(np.unique(lab)) == 32 * 32


def test_fused_requires_applicable_config():
    """leaf='fused' must fail loudly off the supported envelope."""
    costs = jnp.ones((32, 32, 2), jnp.float32)
    with pytest.raises(ValueError, match="fused"):
        hier_gaec(costs, mode="random_mate", agg="matrix", leaf="fused")
