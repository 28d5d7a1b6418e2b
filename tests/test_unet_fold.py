"""Folded upsample+conv ("fold"/"packedfold" forms) == staged, exactly.

The fold (unet.py:_upconv_fold_block) collapses bilinear x2 upsampling and
the following 3x3 'same' conv into ONE half-res conv with the 4 full-res
phases stacked on output channels (the up-tail lane-occupancy fix — see
benchmarks/README.md per-stage attribution).  The math is identical up to
float summation order; these tests pin that down in float32, including the
1-pixel output ring where the bilinear's edge clamp and the conv's zero
padding interact (corrected by inclusion-exclusion border terms).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from v2e_tpu.models.unet import (
    UNetSpec,
    _conv_block,
    _upconv_fold_block,
    _upsample2_nhwc,
    init_unet_host,
    unet_apply_io_nhwc,
)


@pytest.mark.parametrize(
    "n,h,w,ci,co",
    [
        (2, 8, 12, 7, 5),    # generic odd channel counts
        (1, 9, 11, 16, 32),  # odd spatial (down5 output at 288x352)
        (2, 1, 1, 4, 3),     # degenerate 1x1 (base=8 dryrun bottleneck)
        (1, 2, 16, 32, 16),  # thin strip
        (1, 16, 2, 8, 8),
    ],
)
def test_upconv_fold_matches_staged(n, h, w, ci, co):
    rng = np.random.default_rng(n * 100 + h * 10 + ci)
    x = jnp.asarray(rng.normal(size=(n, h, w, ci)).astype(np.float32))
    p = {
        "w": jnp.asarray(rng.normal(size=(co, ci, 3, 3)).astype(np.float32) * 0.2),
        "b": jnp.asarray(rng.normal(size=(co,)).astype(np.float32)),
    }
    staged = np.asarray(_conv_block(_upsample2_nhwc(x), p))
    folded = np.asarray(_upconv_fold_block(x, p))
    assert folded.shape == (n, 2 * h, 2 * w, co)
    np.testing.assert_allclose(folded, staged, atol=3e-5, rtol=1e-5)


@pytest.mark.parametrize("impl", ["fold", "packedfold", "fold45", "packedfold45"])
@pytest.mark.parametrize("base,cin,cout", [(8, 12, 5), (16, 2, 4)])
def test_unet_forward_fold_matches_dense(base, cin, cout, impl):
    """Whole-forward equality of the folded up-path against dense, for both
    the plain fold and the packed-resident+fold combination (the TPU
    default)."""
    spec = UNetSpec(cin, cout, base)
    rng = np.random.default_rng(3 + base)
    params = init_unet_host(rng, spec)
    x = jnp.asarray(rng.normal(size=(2, 32, 64, cin)).astype(np.float32))
    dense = np.asarray(unet_apply_io_nhwc(params, x, None, "dense"))
    folded = np.asarray(unet_apply_io_nhwc(params, x, None, impl))
    np.testing.assert_allclose(folded, dense, atol=5e-5, rtol=1e-4)


def test_upconv_fold_grad_matches_staged():
    """The fold is used inside differentiated programs (training/dryrun
    paths select conv forms too) — its VJP must match the staged pair."""
    import jax

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 6, 8, 4)).astype(np.float32))
    p = {
        "w": jnp.asarray(rng.normal(size=(3, 4, 3, 3)).astype(np.float32) * 0.2),
        "b": jnp.asarray(rng.normal(size=(3,)).astype(np.float32)),
    }

    def loss_staged(p, x):
        return jnp.sum(_conv_block(_upsample2_nhwc(x), p) ** 2)

    def loss_fold(p, x):
        return jnp.sum(_upconv_fold_block(x, p) ** 2)

    gs = jax.grad(loss_staged)(p, x)
    gf = jax.grad(loss_fold)(p, x)
    np.testing.assert_allclose(gf["w"], gs["w"], atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(gf["b"], gs["b"], atol=1e-3, rtol=1e-4)
